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

from ...utils import box_coder as box_coder_lib
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
    """Seg + intra-part regression; when ``TARGET_CONFIG.BOX_CODER`` is set
    (the anchor-free PartA2_free variant, reference
    ``point_intra_part_head.py:27-36``) it additionally predicts per-point
    boxes through REG_FC and emits stage-2 proposals
    (``batch_cls_preds``/``batch_box_preds``, ``:119-126``)."""
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

        target_cfg = self.model_cfg.TARGET_CONFIG
        box_coder = None
        if target_cfg.get('BOX_CODER', None) is not None:
            box_coder = box_coder_lib.build_box_coder(
                target_cfg.BOX_CODER, **dict(target_cfg.BOX_CODER_CONFIG))
            box_preds = MLPHead(list(self.model_cfg.REG_FC),
                                box_coder.code_size,
                                name='box_layers')(feats, train=train)
            ret['point_box_preds_raw'] = box_preds

        coords = batch['voxel_centers']             # (B, V, 3)
        if train and 'gt_boxes' in batch:
            fg, part = intra_part_targets(
                jax.lax.stop_gradient(coords), batch['gt_boxes'])
            valid = batch.get('voxel_valid', jnp.ones(fg.shape, bool))
            ret.update({'fg_mask': fg & valid, 'part_targets': part,
                        'valid': valid})
            if box_coder is not None:
                # per-point class + encoded-box targets with the ignore
                # band from the enlarged boxes (``assign_stack_targets``
                # with set_ignore_flag=True, ret_box_labels=True)
                gt = batch['gt_boxes']
                ext = box_utils.enlarge_box3d(
                    gt, target_cfg.GT_EXTRA_WIDTH)
                ret['box_targets'] = target_assign.assign_targets_iassd(
                    jax.lax.stop_gradient(coords), gt, ext,
                    set_ignore_flag=True, ret_box_labels=True,
                    box_coder=box_coder, num_class=self.num_class)

        batch = dict(batch)
        batch['point_part_ret'] = ret
        batch['point_part_features'] = jnp.concatenate(
            [jax.nn.sigmoid(part_preds), jax.nn.sigmoid(seg_preds)], axis=-1)
        if box_coder is not None:
            # stage-2 proposals: decoded boxes per point (the reference does
            # this at eval or predict_boxes_when_training; with a RoI head
            # on top the proposals are always needed)
            pred_classes = jnp.argmax(seg_preds, axis=-1) + 1
            decoded = box_coder.decode(box_preds, coords,
                                       pred_classes=pred_classes)
            batch['batch_cls_preds'] = seg_preds
            batch['batch_box_preds'] = decoded
            batch['cls_preds_normalized'] = False
        return batch


def point_intra_part_loss(ret, loss_cfg):
    fg = ret['fg_mask']
    valid = ret['valid'].astype(jnp.float32)
    num_class = ret['point_cls_preds'].shape[-1]
    if 'box_targets' in ret:
        # box-predicting variant (PartA2_free): cls labels come from the
        # ignore-banded multi-class assignment, like the reference's
        # get_cls_layer_loss over the same targets_dict
        labels = ret['box_targets'].cls_labels
        positives = labels > 0
        weights = ((labels >= 0).astype(jnp.float32) * valid) / jnp.clip(
            jnp.sum(positives.astype(jnp.float32)), 1.0, None)
        one_hot = jax.nn.one_hot(jnp.clip(labels, 0, None),
                                 num_class + 1)[..., 1:]
    else:
        positives = fg
        weights = valid / jnp.clip(
            jnp.sum(positives.astype(jnp.float32)), 1.0, None)
        one_hot = jax.nn.one_hot(fg.astype(jnp.int32),
                                 num_class + 1)[..., 1:]
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
    tb = {'point_seg_loss': seg_loss, 'point_part_loss': part_loss}
    if 'box_targets' in ret:
        # get_box_layer_loss: smooth-L1 on encoded residuals over fg points
        t = ret['box_targets']
        pos = (t.cls_labels > 0).astype(jnp.float32)
        reg_weights = pos / jnp.clip(jnp.sum(pos), 1.0, None)
        box_loss = loss_utils.weighted_smooth_l1(
            ret['point_box_preds_raw'], t.box_labels, weights=reg_weights,
            code_weights=loss_cfg.LOSS_WEIGHTS.get('code_weights',
                                                   None)).sum()
        box_loss = box_loss * loss_cfg.LOSS_WEIGHTS.get('point_box_weight',
                                                        1.0)
        total = total + box_loss
        tb['point_box_loss'] = box_loss
    return total, tb
