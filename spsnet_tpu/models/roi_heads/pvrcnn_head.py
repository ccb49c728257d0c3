"""PV-RCNN RoI head: RoI-grid pooling over keypoint features.

Rebuild of ``roi_heads/pvrcnn_head.py``: each RoI is covered by a
GRID_SIZE^3 lattice of points (canonical frame scaled by the roi dims,
rotated+translated to world); each grid point MSG-ball-queries the VSA
keypoints; PointNet + shared FCs -> cls/reg. Proposal/target sampling shares
``roi_utils`` with PointRCNN (CLS_SCORE_TYPE 'roi_iou' soft labels).
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
from .roi_utils import proposal_target_layer


def roi_grid_points(rois, grid_size):
    """(B, R, 7) -> (B, R, G^3, 3) world-frame grid points
    (parity: ``pvrcnn_head.py get_global_grid_points_of_roi``)."""
    B, R, _ = rois.shape
    G = grid_size
    idx = np.stack(np.meshgrid(*[np.arange(G)] * 3, indexing='ij'),
                   axis=-1).reshape(-1, 3).astype(np.float32)   # (G^3, 3)
    local = (jnp.asarray(idx)[None, None] + 0.5) / G - 0.5      # in [-.5, .5]
    local = local * rois[:, :, None, 3:6]
    rot = common.rotate_points_along_z(
        local.reshape(B * R, G ** 3, 3), rois[..., 6].reshape(B * R))
    return rot.reshape(B, R, G ** 3, 3) + rois[:, :, None, 0:3]


class PVRCNNHead(nn.Module):
    model_cfg: Any
    num_class: int = 1

    def setup(self):
        self.box_coder = box_coder_lib.build_box_coder(
            self.model_cfg.TARGET_CONFIG.BOX_CODER)
        pool = self.model_cfg.ROI_GRID_POOL
        self.grid_size = int(pool.GRID_SIZE)
        # PV-RCNN++ swaps the MSG ball-query PointNet for VectorPool
        # aggregation (``pv_rcnn_plusplus.yaml ROI_GRID_POOL``)
        self.use_vector_pool = \
            str(pool.get('NAME', '')) == 'VectorPoolAggregationModuleMSG'
        if self.use_vector_pool:
            from ..model_utils.vector_pool import VectorPoolAggregationMSG
            self.vp_pool = VectorPoolAggregationMSG(
                model_cfg=pool, input_channels=int(
                    pool.get('IN_CHANNEL', 90)), name='vp_pool')
        else:
            self.pool_radii = [float(r) for r in pool.POOL_RADIUS]
            self.pool_nsamples = [int(n) for n in pool.NSAMPLE]
            self.pool_mlps = [list(m) for m in pool.MLPS]
            self.pool_layers = [SharedMLP(m, name=f'pool_mlp_{i}')
                                for i, m in enumerate(self.pool_mlps)]
        # DP_RATIO dropout: between shared_fc blocks (pvrcnn_head.py:29-30),
        # after the FIRST cls/reg tower block (make_fc_layers k==0)
        dp = float(self.model_cfg.get('DP_RATIO', 0.0))
        self.shared_fc = SharedMLP(
            list(self.model_cfg.SHARED_FC), name='shared_fc', dropout=dp,
            dropout_idx=tuple(range(max(len(self.model_cfg.SHARED_FC) - 1,
                                        0))))
        self.cls_layers = MLPHead(list(self.model_cfg.CLS_FC), self.num_class,
                                  dropout=dp, dropout_idx=(0,),
                                  name='cls_layers')
        self.reg_layers = MLPHead(list(self.model_cfg.REG_FC),
                                  self.box_coder.code_size * self.num_class,
                                  dropout=dp, dropout_idx=(0,),
                                  name='reg_layers')

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
        """(B, R, 7) -> (B, R, G^3 * C_pool) pooled keypoint features."""
        kp = batch['point_coords']                   # (B, K, 3)
        kp_feats = batch['point_features']
        # weight features by predicted fg score (PKW, ``pvrcnn_head.py``)
        if 'point_cls_scores' in batch:
            kp_feats = kp_feats * jax.lax.stop_gradient(
                batch['point_cls_scores'])[..., None]
        B, R, _ = rois.shape
        G3 = self.grid_size ** 3
        grid = roi_grid_points(rois[..., :7], self.grid_size)
        grid_flat = grid.reshape(B, R * G3, 3)

        if self.use_vector_pool:
            kp_masked = kp
            if 'point_valid' in batch:
                kp_masked = jnp.where(batch['point_valid'][..., None], kp,
                                      1e6)
            pooled = self.vp_pool(kp_masked, kp_feats, grid_flat, train=train)
            return self._flatten_pooled(pooled, B, R, G3)

        scale_feats = []
        for i, (r, ns) in enumerate(zip(self.pool_radii, self.pool_nsamples)):
            grouped, _ = ops.query_and_group(r, ns, kp, grid_flat, kp_feats)
            # stack QueryAndGroup zeroes empty balls pre-MLP
            grouped = ops.grouping.zero_empty_balls(grouped, r)
            h = self.pool_layers[i](grouped, train=train)
            scale_feats.append(jnp.max(h, axis=2))
        pooled = jnp.concatenate(scale_feats, axis=-1)   # (B, R*G3, C)
        return self._flatten_pooled(pooled, B, R, G3)

    @staticmethod
    def _flatten_pooled(pooled, B, R, G3):
        """(B, R*G3, C) -> (B, R, C*G3) CHANNEL-major, the reference's
        ``pooled_features.permute(0, 2, 1).view(B, -1, 1)`` flatten
        (``pvrcnn_head.py:155-158``) — the shared_fc kernel's input layout
        is defined by this order, so checkpoint import depends on it
        (forward parity pins it: tests/test_pvrcnn_forward_parity.py)."""
        C = pooled.shape[-1]
        return jnp.transpose(pooled.reshape(B, R, G3, C),
                             (0, 1, 3, 2)).reshape(B, R, C * G3)

    def propose_and_assign(self, batch, train: bool = True):
        """Proposal NMS + (train) roi target sampling, callable BEFORE the
        PFE (PV-RCNN++ runs it first so SPC keypoint sampling sees the rois,
        ``pv_rcnn_plusplus.py:16-27``)."""
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
        return {'rois': rois, 'roi_labels': roi_labels, 'targets': targets}

    def __call__(self, batch, train: bool = True, precomputed=None):
        # reference rule (roi_head_template.py:102): labels meaningful iff
        # the RPN emitted >1 class channel (batch_cls_preds is still the
        # RPN's here — this head overwrites it only on the way out)
        has_class_labels = batch['batch_cls_preds'].shape[-1] > 1
        if precomputed is not None:
            rois = precomputed['rois']
            roi_labels = precomputed['roi_labels']
            targets = precomputed['targets']
        else:
            pre = self.propose_and_assign(batch, train=train)
            rois, roi_labels, targets = (pre['rois'], pre['roi_labels'],
                                         pre['targets'])

        pooled = self.roi_grid_pool(batch, rois, train)  # (B, R, G3*C)
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
