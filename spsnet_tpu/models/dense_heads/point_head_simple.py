"""Keypoint segmentation head (PV-RCNN's Predicted Keypoint Weighting loss).

Rebuild of ``dense_heads/point_head_simple.py``: a small FC stack predicting
per-keypoint foreground probability, supervised with focal loss against
points-in-gt-boxes labels. PV-RCNN uses it purely as an auxiliary loss.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils import box_utils, loss_utils
from ..blocks import MLPHead
from . import target_assign


class PointHeadSimple(nn.Module):
    model_cfg: Any
    num_class: int

    @nn.compact
    def __call__(self, batch, train: bool = True):
        feats = batch['point_features_before_fusion'] \
            if self.model_cfg.get('USE_POINT_FEATURES_BEFORE_FUSION', False) \
            else batch['point_features']
        cls_preds = MLPHead(list(self.model_cfg.CLS_FC), self.num_class,
                            name='cls_layers')(feats, train=train)
        ret = {'point_cls_preds': cls_preds}
        if train and 'gt_boxes' in batch:
            gt = batch['gt_boxes']
            ext = box_utils.enlarge_box3d(
                gt, self.model_cfg.TARGET_CONFIG.GT_EXTRA_WIDTH)
            t = target_assign.assign_targets_iassd(
                jax.lax.stop_gradient(batch['point_coords']), gt, ext,
                set_ignore_flag=True, num_class=self.num_class,
                binary_label=True)
            ret['targets'] = t
        batch = dict(batch)
        batch['point_head_simple_ret'] = ret
        batch['point_cls_scores'] = jnp.max(
            jax.nn.sigmoid(cls_preds), axis=-1)
        return batch


def point_head_simple_loss(ret, loss_cfg):
    """Focal seg loss normalized by positives (``point_head_template.py``)."""
    t = ret['targets']
    labels = t.cls_labels
    positives = labels > 0
    weights = ((labels == 0) | positives).astype(jnp.float32)
    pos_norm = jnp.clip(jnp.sum(positives.astype(jnp.float32)), 1.0, None)
    weights = weights / pos_norm
    num_class = ret['point_cls_preds'].shape[-1]
    one_hot = jax.nn.one_hot(jnp.clip(labels, 0, None), num_class + 1)[..., 1:]
    loss = loss_utils.sigmoid_focal_loss(
        ret['point_cls_preds'], one_hot, weights).sum()
    loss = loss * loss_cfg.LOSS_WEIGHTS.get('point_cls_weight', 1.0)
    return loss, {'point_loss_cls': loss}
