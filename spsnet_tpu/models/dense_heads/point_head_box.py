"""PointRCNN stage-1 head: per-point foreground cls + box regression.

Rebuild of ``PointHeadBox`` (``dense_heads/point_head_box.py``) +
``PointHeadTemplate`` losses (``point_head_template.py:131-191``): focal cls
loss normalized by positives, weighted smooth-L1 box loss on fg points.
Dense (B, N, ...) with masks instead of stacked layouts.
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


class PointHeadBox(nn.Module):
    model_cfg: Any
    num_class: int
    predict_boxes_when_training: bool = True

    def setup(self):
        target_cfg = self.model_cfg.TARGET_CONFIG
        self.box_coder = box_coder_lib.build_box_coder(
            target_cfg.BOX_CODER, **dict(target_cfg.BOX_CODER_CONFIG))
        self.cls_layers = MLPHead(list(self.model_cfg.CLS_FC), self.num_class,
                                  name='cls_layers')
        self.box_layers = MLPHead(list(self.model_cfg.REG_FC),
                                  self.box_coder.code_size, name='box_layers')

    def __call__(self, batch, train: bool = True):
        """Consumes point_features (B, N, C) + point_coords (B, N, 3)."""
        feats = batch['point_features']
        coords = batch['point_coords']
        point_cls_preds = self.cls_layers(feats, train=train)
        point_box_preds = self.box_layers(feats, train=train)

        ret = {'point_cls_preds': point_cls_preds,
               'point_box_preds_raw': point_box_preds,
               'point_coords': coords}
        if train and 'gt_boxes' in batch:
            gt = batch['gt_boxes']
            ext = box_utils.enlarge_box3d(
                gt, self.model_cfg.TARGET_CONFIG.GT_EXTRA_WIDTH)
            t = target_assign.assign_targets_iassd(
                jax.lax.stop_gradient(coords), gt, ext,
                set_ignore_flag=True, ret_box_labels=True,
                box_coder=self.box_coder, num_class=self.num_class)
            ret['targets'] = t

        cls_scores = jax.nn.sigmoid(point_cls_preds)
        batch = dict(batch)
        batch['point_cls_scores'] = jnp.max(cls_scores, axis=-1)

        # stage-2 proposals: decoded boxes per point
        pred_classes = jnp.argmax(point_cls_preds, axis=-1) + 1
        decoded = self.box_coder.decode(point_box_preds, coords,
                                        pred_classes=pred_classes)
        batch['batch_cls_preds'] = point_cls_preds
        batch['batch_box_preds'] = decoded
        batch['cls_preds_normalized'] = False
        ret['point_box_preds'] = decoded
        batch['point_head_ret'] = ret
        return batch


def point_head_box_loss(ret, loss_cfg, num_class):
    """Stage-1 loss (``point_head_template.py:131-191``): focal cls +
    smooth-L1 box on fg. Returns (loss, tb)."""
    lw = loss_cfg.LOSS_WEIGHTS
    t = ret['targets']
    labels = t.cls_labels
    positives = labels > 0
    cls_weights = ((labels == 0) | positives).astype(jnp.float32)
    pos_norm = jnp.clip(jnp.sum(positives.astype(jnp.float32)), 1.0, None)
    cls_weights = cls_weights / pos_norm
    one_hot = jax.nn.one_hot(jnp.clip(labels, 0, None), num_class + 1)[..., 1:]
    cls_loss = loss_utils.sigmoid_focal_loss(
        ret['point_cls_preds'], one_hot, cls_weights).sum()
    cls_loss = cls_loss * lw['point_cls_weight']

    reg_weights = positives.astype(jnp.float32) / pos_norm
    box_loss = loss_utils.weighted_smooth_l1(
        ret['point_box_preds_raw'], t.box_labels, weights=reg_weights,
        code_weights=lw.get('code_weights', None)).sum()
    box_loss = box_loss * lw['point_box_weight']
    total = cls_loss + box_loss
    return total, {'point_loss_cls': cls_loss, 'point_loss_box': box_loss}
