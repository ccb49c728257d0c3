"""SECOND IoU head: BEV RoI-grid pooling + IoU rescoring.

Rebuild of ``roi_heads/second_head.py`` (used by ``SECONDNetIoU``): each roi
is covered by a GRID_SIZE^2 BEV lattice; features come from bilinear
interpolation of ``spatial_features_2d``; shared FCs predict a single IoU
score used to rescore the RPN boxes at inference
(``second_net_iou.py``: score = rpn^(1-w) * iou^w style blending, here the
reference's ``SCORE_THRESH``-free rescoring with iou^2 weighting is kept
configurable).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import common
from ..blocks import MLPHead, SharedMLP
from ..detectors.detector3d import class_agnostic_nms_batch
from .roi_utils import proposal_target_layer


def bev_roi_grid_pool(rois, bev, grid_size, voxel_size, point_cloud_range,
                      bev_stride):
    """(B, R, 7) x (B, H, W, C) -> (B, R, G*G*C) bilinear grid features
    (parity: ``second_head.py roi_grid_pool``)."""
    B, R, _ = rois.shape
    G = grid_size
    idx = np.stack(np.meshgrid(np.arange(G), np.arange(G), indexing='ij'),
                   axis=-1).reshape(-1, 2).astype(np.float32)
    local = (jnp.asarray(idx)[None, None] + 0.5) / G - 0.5     # (1,1,G2,2)
    local = local * rois[:, :, None, 3:5]
    zeros = jnp.zeros_like(local[..., :1])
    local3 = jnp.concatenate([local, zeros], axis=-1)
    rot = common.rotate_points_along_z(
        local3.reshape(B * R, G * G, 3), rois[..., 6].reshape(B * R))
    world = rot.reshape(B, R, G * G, 3)[..., :2] + rois[:, :, None, 0:2]

    vs = np.asarray(voxel_size, np.float32)
    pcr = np.asarray(point_cloud_range, np.float32)
    x_idx = (world[..., 0] - pcr[0]) / vs[0] / bev_stride
    y_idx = (world[..., 1] - pcr[1]) / vs[1] / bev_stride
    Bq, H, W, C = bev.shape
    x0 = jnp.clip(jnp.floor(x_idx), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y_idx), 0, H - 2).astype(jnp.int32)
    wx = jnp.clip(x_idx - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(y_idx - y0, 0.0, 1.0)[..., None]
    flat_bev = bev.reshape(B, H * W, C)

    def at(yy, xx):
        flat = (yy * W + xx).reshape(B, R * G * G)
        v = jnp.take_along_axis(flat_bev, flat[..., None], axis=1)
        return v.reshape(B, R, G * G, C)

    v = (at(y0, x0) * (1 - wy) * (1 - wx) + at(y0, x0 + 1) * (1 - wy) * wx +
         at(y0 + 1, x0) * wy * (1 - wx) + at(y0 + 1, x0 + 1) * wy * wx)
    return v.reshape(B, R, G * G * C)


class SECONDHead(nn.Module):
    model_cfg: Any
    num_class: int = 1
    voxel_size: Any = (0.05, 0.05, 0.1)
    point_cloud_range: Any = (0, -40, -3, 70.4, 40, 1)
    bev_stride: int = 8

    def setup(self):
        self.grid_size_2d = int(self.model_cfg.ROI_GRID_POOL.GRID_SIZE)
        self.shared_fc = SharedMLP(list(self.model_cfg.SHARED_FC),
                                   name='shared_fc')
        self.iou_layers = MLPHead(list(self.model_cfg.IOU_FC), 1,
                                  name='iou_layers')

    def proposal_layer(self, batch, nms_cfg):
        dets = class_agnostic_nms_batch(
            batch['batch_box_preds'], batch['batch_cls_preds'],
            score_thresh=-1e9,
            nms_thresh=float(nms_cfg.NMS_THRESH),
            nms_pre=int(nms_cfg.NMS_PRE_MAXSIZE),
            nms_post=int(nms_cfg.NMS_POST_MAXSIZE),
            cls_preds_normalized=bool(batch.get('cls_preds_normalized', False)))
        R = dets['boxes'].shape[1]
        valid = jnp.arange(R)[None, :] < dets['count'][:, None]
        return dets['boxes'], dets['scores'], dets['labels'], valid

    def __call__(self, batch, train: bool = True):
        nms_cfg = self.model_cfg.NMS_CONFIG.TRAIN if train \
            else self.model_cfg.NMS_CONFIG.TEST
        rois, roi_scores, roi_labels, roi_valid = self.proposal_layer(
            batch, nms_cfg)

        targets = None
        if train and 'gt_boxes' in batch:
            rng = self.make_rng('roi_sampling')
            targets = proposal_target_layer(
                rng, rois, roi_scores, roi_labels, roi_valid,
                batch['gt_boxes'], self.model_cfg.TARGET_CONFIG)
            rois = targets.rois
            roi_labels = targets.roi_labels
            roi_scores = targets.roi_scores

        pooled = bev_roi_grid_pool(
            jax.lax.stop_gradient(rois[..., :7]),
            jax.lax.stop_gradient(batch['spatial_features_2d']),
            self.grid_size_2d, self.voxel_size, self.point_cloud_range,
            self.bev_stride)
        shared = self.shared_fc(pooled, train=train)
        rcnn_iou = self.iou_layers(shared, train=train)[..., 0]   # (B, R)

        ret = {'rcnn_iou': rcnn_iou, 'rois': rois, 'targets': targets}
        batch = dict(batch)
        batch['second_head_ret'] = ret
        if not train:
            # rescore: blend RPN score with predicted IoU
            w = float(self.model_cfg.get('IOU_WEIGHT', 0.5))
            iou_score = jnp.clip(jax.nn.sigmoid(rcnn_iou), 1e-4, 1.0)
            rpn = jnp.clip(roi_scores, 1e-4, 1.0)
            score = jnp.power(rpn, 1 - w) * jnp.power(iou_score, w)
            batch['batch_box_preds'] = rois[..., :7]
            batch['batch_cls_preds'] = score[..., None]
            batch['batch_roi_labels'] = roi_labels
            batch['cls_preds_normalized'] = True
        return batch


def second_head_loss(ret, loss_cfg):
    """IoU regression vs matched gt IoU (``second_head.py get_loss``)."""
    t = ret['targets']
    iou_target = t.gt_iou_of_rois * 2 - 0.5          # map [0,1] -> [-0.5,1.5]
    care = t.rcnn_cls_labels >= 0
    bce = jnp.abs(jax.nn.sigmoid(ret['rcnn_iou']) -
                  jnp.clip(iou_target, 0.0, 1.0))
    loss = jnp.sum(bce * care) / jnp.clip(jnp.sum(care), 1.0, None)
    loss = loss * loss_cfg.LOSS_WEIGHTS.get('rcnn_iou_weight', 1.0)
    return loss, {'rcnn_iou_loss': loss}
