"""PartA2's intra-object part head.

Rebuild of ``dense_heads/point_intra_part_offset_head.py``: per-voxel fg
segmentation (focal) + regression of the normalized intra-object location
(the point's position inside its gt box, in [0, 1]^3) with BCE.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils import box_utils, loss_utils
from ..blocks import MLPHead
from . import target_assign


def intra_part_targets(points, gt_boxes):
    """(B, V, 3) x (B, T, 8) -> (fg_mask (B, V), part_loc (B, V, 3) in [0,1])."""
    t = target_assign.assign_targets_iassd(
        points, gt_boxes, None, set_ignore_flag=False, num_class=1,
        binary_label=True)
    boxes = t.gt_box_of_points
    # canonical transform per point against its containing box
    from ...utils import common
    B, V, _ = points.shape
    offset = points - boxes[..., 0:3]
    canical = common.rotate_points_along_z(
        offset.reshape(B * V, 1, 3), -boxes[..., 6].reshape(B * V))
    canical = canical.reshape(B, V, 3)
    dims = jnp.clip(boxes[..., 3:6], 1e-4, None)
    part = jnp.clip(canical / dims + 0.5, 0.0, 1.0)
    part = jnp.where(t.fg_mask[..., None], part, 0.0)
    return t.fg_mask, part


class PointIntraPartOffsetHead(nn.Module):
    model_cfg: Any
    num_class: int

    @nn.compact
    def __call__(self, batch, train: bool = True):
        feats = batch['point_features']             # (B, V, C) decoder out
        seg_preds = MLPHead(list(self.model_cfg.CLS_FC), self.num_class,
                            name='cls_layers')(feats, train=train)
        part_preds = MLPHead(list(self.model_cfg.PART_FC), 3,
                             name='part_reg_layers')(feats, train=train)
        ret = {'point_cls_preds': seg_preds, 'point_part_preds': part_preds}

        coords = batch['voxel_centers']             # (B, V, 3)
        if train and 'gt_boxes' in batch:
            fg, part = intra_part_targets(
                jax.lax.stop_gradient(coords), batch['gt_boxes'])
            valid = batch.get('voxel_valid', jnp.ones(fg.shape, bool))
            ret.update({'fg_mask': fg & valid, 'part_targets': part,
                        'valid': valid})

        batch = dict(batch)
        batch['point_part_ret'] = ret
        batch['point_part_features'] = jnp.concatenate(
            [jax.nn.sigmoid(part_preds), jax.nn.sigmoid(seg_preds)], axis=-1)
        return batch


def point_intra_part_loss(ret, loss_cfg):
    fg = ret['fg_mask']
    valid = ret['valid'].astype(jnp.float32)
    positives = fg
    weights = valid / jnp.clip(
        jnp.sum(positives.astype(jnp.float32)), 1.0, None)
    num_class = ret['point_cls_preds'].shape[-1]
    one_hot = jax.nn.one_hot(fg.astype(jnp.int32), num_class + 1)[..., 1:]
    seg_loss = loss_utils.sigmoid_focal_loss(
        ret['point_cls_preds'], one_hot, weights).sum()
    seg_loss = seg_loss * loss_cfg.LOSS_WEIGHTS.get('point_cls_weight', 1.0)

    part_bce = loss_utils.sigmoid_cross_entropy_with_logits(
        ret['point_part_preds'], ret['part_targets'])
    fg_f = fg.astype(jnp.float32)
    part_loss = jnp.sum(part_bce * fg_f[..., None]) / \
        jnp.clip(jnp.sum(fg_f) * 3.0, 1.0, None)
    part_loss = part_loss * loss_cfg.LOSS_WEIGHTS.get('point_part_weight', 1.0)
    total = seg_loss + part_loss
    return total, {'point_seg_loss': seg_loss, 'point_part_loss': part_loss}
