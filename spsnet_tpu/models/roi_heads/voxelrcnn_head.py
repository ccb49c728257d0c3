"""Voxel R-CNN head: RoI-grid pooling straight from multi-scale voxel
features (no keypoint stage).

Rebuild of ``roi_heads/voxelrcnn_head.py``: grid points per RoI query
neighboring voxels of the selected sparse-conv levels; the reference's
voxel-query (Manhattan neighbor hash lookup, ``pointnet2_stack/voxel_query``)
is realized TPU-natively as a radius query over voxel-center clouds with
far-sentinel padding — same neighborhoods, dense math. The shipped
QUERY_RANGES window (±4 voxels) strictly contains the radius ball at every
level (r = 4 voxel-pitches in the shipped configs), so the in-radius
candidate SET is identical; slot truncation order can differ only when a
ball overflows NSAMPLE (same class of arbitrariness as the CUDA scan
order).

The pooling parametrization follows the reference's
``NeighborVoxelSAModuleMSG`` (``voxel_pool_modules.py:8-130``) exactly so
trained checkpoints import weight-for-weight: per scale, mlp_in
(Dense+BN on voxel features BEFORE grouping) and mlp_pos (Dense+BN on
center-relative xyz) are ADD-fused, relu'd, max-pooled over the slots,
then mlp_out (Dense+BN+ReLU); empty balls zero both inputs before the add
(the position branch still contributes BN(conv(0)) — replicated as-is).
Composed forward parity vs the reference's own torch modules:
``tests/test_voxelrcnn_forward_parity.py``.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import ops
from ...utils import box_coder as box_coder_lib
from ...utils import common
from ..blocks import MLPHead, SharedMLP
from ..detectors.detector3d import class_agnostic_nms_batch
from .pvrcnn_head import roi_grid_points
from .roi_utils import proposal_target_layer

_FAR = 1e6


class _DenseBN(nn.Module):
    """Dense (no bias) + BatchNorm, NO activation — the reference's
    ``Conv1d/Conv2d(1x1, bias=False) + BatchNorm`` blocks inside
    ``NeighborVoxelSAModuleMSG`` (mlp_in / mlp_pos / mlp_out bodies)."""
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Dense(self.out_channels, use_bias=False)(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5)(x)


class VoxelRCNNHead(nn.Module):
    model_cfg: Any
    num_class: int = 1
    voxel_size: Any = (0.05, 0.05, 0.1)
    point_cloud_range: Any = (0, -40, -3, 70.4, 40, 1)

    def setup(self):
        self.box_coder = box_coder_lib.build_box_coder(
            self.model_cfg.TARGET_CONFIG.BOX_CODER)
        pool = self.model_cfg.ROI_GRID_POOL
        self.grid_size = int(pool.GRID_SIZE)
        self.pool_cfgs = {k: pool.POOL_LAYERS[k]
                          for k in pool.FEATURES_SOURCE}
        layers = {}
        for name, pc in self.pool_cfgs.items():
            # reference mlp spec (after C_in prepend) is [C_in, mid, out]:
            # mlp_in C_in->mid, mlp_pos 3->mid, mlp_out mid->out. Shipped
            # configs use 2-element MLPS ([mid, out]); longer specs chain
            # the extra channels into mlp_out like the reference would not
            # express — restricted to the reference's 3-stage form.
            scales = []
            for i, m in enumerate(pc.MLPS):
                mid, out = int(m[0]), int(m[-1])
                scales.append((
                    _DenseBN(mid, name=f'{name}_in_{i}'),
                    _DenseBN(mid, name=f'{name}_pos_{i}'),
                    _DenseBN(out, name=f'{name}_out_{i}'),
                ))
            layers[name] = scales
        self.pool_layers_by_src = layers
        # DP_RATIO dropout: between blocks in shared_fc AND the cls/reg
        # hidden stacks (voxel_rcnn_head.py:49-77 — k != last in each)
        dp = float(self.model_cfg.get('DP_RATIO', 0.0))
        self.shared_fc = SharedMLP(
            list(self.model_cfg.SHARED_FC), name='shared_fc', dropout=dp,
            dropout_idx=tuple(range(max(len(self.model_cfg.SHARED_FC) - 1,
                                        0))))
        self.cls_layers = MLPHead(
            list(self.model_cfg.CLS_FC), self.num_class, dropout=dp,
            dropout_idx=tuple(range(max(len(self.model_cfg.CLS_FC) - 1, 0))),
            name='cls_layers')
        self.reg_layers = MLPHead(
            list(self.model_cfg.REG_FC),
            self.box_coder.code_size * self.num_class, dropout=dp,
            dropout_idx=tuple(range(max(len(self.model_cfg.REG_FC) - 1, 0))),
            name='reg_layers')

    def _voxel_centers(self, coords_zyx, downsample):
        vs = np.asarray(self.voxel_size, np.float32) * downsample
        pcr = np.asarray(self.point_cloud_range, np.float32)
        xyz_idx = coords_zyx[..., ::-1].astype(jnp.float32)
        return xyz_idx * vs + pcr[:3] + vs / 2

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

    def roi_grid_pool(self, batch, rois, train):
        B, R, _ = rois.shape
        G3 = self.grid_size ** 3
        grid = roi_grid_points(rois[..., :7], self.grid_size)
        grid_flat = grid.reshape(B, R * G3, 3)

        level_meta = {'x_conv1': ('voxel', 1), 'x_conv2': ('down2', 2),
                      'x_conv3': ('down3', 4), 'x_conv4': ('down4', 8)}
        pooled = []
        for name, pc in self.pool_cfgs.items():
            key, ds = level_meta[name]
            feats = batch['multi_scale_3d_features'][name]
            coords = batch[f'{key}_coords']
            valid = batch[f'{key}_valid']
            centers = self._voxel_centers(coords, ds)
            centers = jnp.where(valid[..., None], centers, _FAR)
            scale = []
            for i, (r, ns) in enumerate(zip(pc.POOL_RADIUS, pc.NSAMPLE)):
                mlp_in, mlp_pos, mlp_out = self.pool_layers_by_src[name][i]
                # mlp_in runs on the voxel features BEFORE grouping
                # (voxel_pool_modules.py:93-99)
                f_in = mlp_in(feats, train=train)
                grouped, _ = ops.query_and_group(
                    float(r), int(ns), centers, grid_flat, f_in)
                # empty balls zero BOTH branches' inputs; the position
                # branch still adds BN(conv(0)) (reference :101-113)
                grouped = ops.zero_empty_balls(grouped, float(r))
                pos = mlp_pos(grouped[..., :3], train=train)
                h = nn.relu(grouped[..., 3:] + pos)
                h = jnp.max(h, axis=2)                       # over slots
                scale.append(nn.relu(mlp_out(h, train=train)))
            pooled.append(jnp.concatenate(scale, axis=-1))
        pooled = jnp.concatenate(pooled, axis=-1)            # (B, R*G3, C)
        return pooled.reshape(B, R, G3 * pooled.shape[-1])

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

        pooled = self.roi_grid_pool(batch, rois, train)
        shared = self.shared_fc(pooled, train=train)
        rcnn_cls = self.cls_layers(shared, train=train)
        rcnn_reg = self.reg_layers(shared, train=train)

        B, R = rois.shape[:2]
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
