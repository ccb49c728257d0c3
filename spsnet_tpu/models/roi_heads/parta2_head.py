"""PartA2 RoI head: RoI-aware voxel pooling + dense 3D conv refinement.

Rebuild of ``roi_heads/partA2_head.py`` + ``roiaware_pool3d``'s RoI-aware
pooling (``roiaware_pool3d_kernel.cu:39-261``): in-roi voxel centers are
binned into a POOL_SIZE^3 grid per roi (max-pool rpn features, avg-pool part
features), then refined with dense 3D convs (the pooled grid is small and
dense — no sparsity needed on TPU) and FC heads.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import box_coder as box_coder_lib
from ...utils import box_utils, common
from ..blocks import MLPHead, SharedMLP
from ..detectors.detector3d import class_agnostic_nms_batch
from .roi_utils import proposal_target_layer


def roiaware_pool(points, features, rois, pool_size, pool_method='max'):
    """RoI-aware voxel pooling.

    Args:
        points: (B, V, 3) candidate points (voxel centers);
        features: (B, V, C);
        rois: (B, R, 7).
    Returns:
        (B, R, pool_size^3, C) pooled grid (zeros where empty).
    """
    B, V, C = features.shape
    R = rois.shape[1]
    G = pool_size
    local = box_utils.points_to_box_local(points, rois[..., :7])  # (B,V,R,3)
    dims = jnp.clip(rois[..., 3:6], 1e-4, None)
    rel = local / dims[:, None, :, :] + 0.5                        # [0,1]
    inside = ((rel >= 0) & (rel < 1)).all(-1)                      # (B,V,R)
    cell = jnp.clip((rel * G).astype(jnp.int32), 0, G - 1)
    flat_cell = (cell[..., 0] * G + cell[..., 1]) * G + cell[..., 2]
    # scatter slot: (R, G^3) per point; invalid points -> dropped slot
    slot = jnp.where(inside, flat_cell, G ** 3)                    # (B,V,R)
    roi_off = jnp.arange(R)[None, None, :] * (G ** 3 + 1)
    flat_slot = slot + roi_off                                     # (B,V,R)

    n_slots = R * (G ** 3 + 1)
    if pool_method == 'max':
        init = jnp.full((B, n_slots, C), -1e9, features.dtype)
        f_exp = jnp.broadcast_to(features[:, :, None, :], (B, V, R, C))
        out = init.at[jnp.arange(B)[:, None, None],
                      flat_slot].max(f_exp, mode='drop')
        out = jnp.where(out <= -1e9, 0.0, out)
    else:  # avg
        init = jnp.zeros((B, n_slots, C), features.dtype)
        cnt = jnp.zeros((B, n_slots, 1), features.dtype)
        f_exp = jnp.broadcast_to(features[:, :, None, :], (B, V, R, C))
        out = init.at[jnp.arange(B)[:, None, None],
                      flat_slot].add(f_exp, mode='drop')
        ones = jnp.broadcast_to(
            inside[..., None].astype(features.dtype), (B, V, R, 1))
        cnt = cnt.at[jnp.arange(B)[:, None, None],
                     flat_slot].add(ones, mode='drop')
        out = out / jnp.clip(cnt, 1.0, None)
    out = out.reshape(B, R, G ** 3 + 1, C)[:, :, :G ** 3]
    return out


class _PartConv3D(nn.Module):
    """Dense 3D conv stack over the pooled (B*R, G, G, G, C) grid."""

    @nn.compact
    def __call__(self, grid, train: bool = True):
        x = nn.Conv(64, (3, 3, 3), padding='SAME', use_bias=False,
                    name='part_conv1')(grid)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, name='part_bn1')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = nn.Conv(64, (3, 3, 3), padding='SAME', use_bias=False,
                    name='part_conv2')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, name='part_bn2')(x)
        x = nn.relu(x)
        return x


class PartA2FCHead(nn.Module):
    model_cfg: Any
    num_class: int = 1
    voxel_size: Any = (0.05, 0.05, 0.1)
    point_cloud_range: Any = (0, -40, -3, 70.4, 40, 1)

    def setup(self):
        self.box_coder = box_coder_lib.build_box_coder(
            self.model_cfg.TARGET_CONFIG.BOX_CODER)
        self.pool_size = int(self.model_cfg.ROI_AWARE_POOL.POOL_SIZE)
        self.shared_fc = SharedMLP(list(self.model_cfg.SHARED_FC),
                                   name='shared_fc')
        self.cls_layers = MLPHead(list(self.model_cfg.CLS_FC), self.num_class,
                                  name='cls_layers')
        self.reg_layers = MLPHead(list(self.model_cfg.REG_FC),
                                  self.box_coder.code_size * self.num_class,
                                  name='reg_layers')
        self.part_conv = _PartConv3D(name='part_conv3d')

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
        # reference rule (roi_head_template.py:102): labels meaningful iff
        # the RPN emitted >1 class channel
        has_class_labels = batch['batch_cls_preds'].shape[-1] > 1
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

        centers = batch['voxel_centers']
        valid = batch.get('voxel_valid', None)
        if valid is not None:
            centers = jnp.where(valid[..., None], centers, 1e6)
        part_feats = batch['point_part_features']   # seg+part sigmoids
        rpn_feats = batch['point_features']         # UNet decoder features
        pooled_part = roiaware_pool(centers, part_feats, rois[..., :7],
                                    self.pool_size, 'avg')
        pooled_rpn = roiaware_pool(centers, rpn_feats, rois[..., :7],
                                   self.pool_size, 'max')
        grid = jnp.concatenate([pooled_part, pooled_rpn], axis=-1)
        B, R, G3, C = grid.shape
        G = self.pool_size
        grid = grid.reshape(B * R, G, G, G, C)
        x = self.part_conv(grid, train=train)
        x = x.reshape(B, R, -1)

        shared = self.shared_fc(x, train=train)
        rcnn_cls = self.cls_layers(shared, train=train)
        rcnn_reg = self.reg_layers(shared, train=train)

        ret = {'rcnn_cls': rcnn_cls, 'rcnn_reg': rcnn_reg, 'rois': rois,
               'targets': targets}
        code_size = self.box_coder.code_size
        local_rois = rois[..., :7].at[..., 0:3].set(0.0).at[..., 6].set(0.0)
        decoded_local = self.box_coder.decode(
            rcnn_reg.reshape(B, R, code_size), local_rois)
        xyz_g = common.rotate_points_along_z(
            decoded_local[..., 0:3].reshape(B * R, 1, 3),
            rois[..., 6].reshape(B * R)).reshape(B, R, 3)
        decoded = decoded_local.at[..., 0:3].set(xyz_g + rois[..., 0:3])
        decoded = decoded.at[..., 6].add(rois[..., 6])
        ret['batch_box_preds'] = decoded

        batch = dict(batch)
        batch['roi_head_ret'] = ret
        if not train:
            batch['batch_box_preds'] = decoded
            batch['batch_cls_preds'] = rcnn_cls
            batch['batch_roi_labels'] = roi_labels
            batch['has_class_labels'] = has_class_labels
            batch['cls_preds_normalized'] = False
        return batch
