"""PartA2 RoI head: RoI-aware voxel pooling + dense 3D conv refinement.

Rebuild of ``roi_heads/partA2_head.py`` + ``roiaware_pool3d``'s RoI-aware
pooling (``roiaware_pool3d_kernel.cu:39-261``): in-roi voxel centers are
binned into a POOL_SIZE^3 grid per roi (max-pool rpn features, avg-pool part
features incl. the SEG_MASK_SCORE_THRESH part zeroing), then refined by the
reference's conv_part/conv_rpn submanifold stacks — realized as masked DENSE
3x3x3 convs over the per-roi grid (exact twin: inactive inputs are zero and
outputs are re-masked to the active set; see ``SubMConvBlock``) — and FC
heads over the channel-major flattened grid. Composed forward parity:
``tests/test_parta2_forward_parity.py``.
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


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the ACTIVE sites of a dense grid — the dense twin of
    spconv's ``BatchNorm1d`` on a SparseConvTensor's features, which only
    ever sees active rows. eps/momentum match the reference's
    ``post_act_block`` (eps 1e-3, torch momentum 0.01 -> flax decay 0.99);
    the running variance uses the unbiased estimator like torch."""
    use_running_average: bool
    epsilon: float = 1e-3
    momentum: float = 0.99

    @nn.compact
    def __call__(self, x, mask):
        C = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros(C, jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones(C, jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (C,))
        bias = self.param('bias', nn.initializers.zeros, (C,))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask.astype(x.dtype)
            axes = tuple(range(x.ndim - 1))
            n = jnp.clip(jnp.sum(m), 2.0, None)
            mean = jnp.sum(x * m, axis=axes) / n
            var = jnp.sum(jnp.square(x - mean) * m, axis=axes) / n
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + \
                    (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + \
                    (1 - self.momentum) * var * n / jnp.clip(n - 1, 1.0, None)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class SubMConvBlock(nn.Module):
    """Dense twin of the reference's submanifold ``post_act_block``
    (``partA2_head.py:82-89``): a 3x3x3 cross-correlation over the
    zero-padded dense RoI grid equals SubMConv3d's active-neighbor gather
    (inactive inputs are zero), and re-masking the output to the active set
    reproduces "outputs only at input-active sites". The kernel layout
    (3, 3, 3, Cin, Cout) is spconv 1.x's on-disk layout — weights import
    verbatim."""
    out_ch: int

    @nn.compact
    def __call__(self, x, mask, train: bool = True):
        x = nn.Conv(self.out_ch, (3, 3, 3), padding='SAME', use_bias=False,
                    name='conv')(x)
        x = MaskedBatchNorm(use_running_average=not train, name='bn')(x, mask)
        return nn.relu(x) * mask


class PartA2FCHead(nn.Module):
    model_cfg: Any
    num_class: int = 1
    voxel_size: Any = (0.05, 0.05, 0.1)
    point_cloud_range: Any = (0, -40, -3, 70.4, 40, 1)

    def setup(self):
        self.box_coder = box_coder_lib.build_box_coder(
            self.model_cfg.TARGET_CONFIG.BOX_CODER)
        self.pool_size = int(self.model_cfg.ROI_AWARE_POOL.POOL_SIZE)
        # DP_RATIO dropout: between shared_fc blocks (partA2_head.py:39-40),
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
        # conv_part / conv_rpn: two submanifold blocks each, 4->64->c0 and
        # C_in->64->c0 with c0 = NUM_FEATURES // 2 (``partA2_head.py:18-26``)
        c0 = int(self.model_cfg.ROI_AWARE_POOL.NUM_FEATURES) // 2
        self.conv_part_0 = SubMConvBlock(64, name='conv_part_0')
        self.conv_part_1 = SubMConvBlock(c0, name='conv_part_1')
        self.conv_rpn_0 = SubMConvBlock(64, name='conv_rpn_0')
        self.conv_rpn_1 = SubMConvBlock(c0, name='conv_rpn_1')

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
        part_feats = batch['point_part_features']   # (part sigmoid, score)
        # SEG_MASK_SCORE_THRESH zeroing + DISABLE_PART coord substitution
        # (``partA2_head.py:121-126``): rows whose seg score is below the
        # threshold contribute zero part offsets (score channel kept)
        score = jax.lax.stop_gradient(part_feats[..., -1:])  # ref .detach()
        part3 = centers if self.model_cfg.get('DISABLE_PART', False) \
            else part_feats[..., 0:3]
        thresh = float(self.model_cfg.get('SEG_MASK_SCORE_THRESH', 0.3))
        part3 = jnp.where(score < thresh, 0.0, part3)
        part_feats = jnp.concatenate([part3, score], axis=-1)
        rpn_feats = batch['point_features']         # UNet decoder features
        pooled_part = roiaware_pool(centers, part_feats, rois[..., :7],
                                    self.pool_size, 'avg')
        pooled_rpn = roiaware_pool(centers, rpn_feats, rois[..., :7],
                                   self.pool_size, 'max')
        B, R, G3, _ = pooled_part.shape
        G = self.pool_size
        # active set from the part-feature sum, like the reference's
        # ``pooled_part_features.sum(dim=-1).nonzero()`` (``partA2_head.py:185``)
        mask = (jnp.sum(pooled_part, axis=-1, keepdims=True) != 0.0) \
            .astype(pooled_part.dtype).reshape(B * R, G, G, G, 1)
        gp = pooled_part.reshape(B * R, G, G, G, -1)
        gr = pooled_rpn.reshape(B * R, G, G, G, -1)
        xp = self.conv_part_1(self.conv_part_0(gp, mask, train=train),
                              mask, train=train)
        xr = self.conv_rpn_1(self.conv_rpn_0(gr, mask, train=train),
                             mask, train=train)
        x = jnp.concatenate([xr, xp], axis=-1)      # rpn first (ref :203)
        # dense().view flatten is channel-major: c*G^3 + x*G^2 + y*G + z
        x = jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(B, R, -1)

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
