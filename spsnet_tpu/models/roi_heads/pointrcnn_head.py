"""PointRCNN RoI refinement head.

Rebuild of ``roi_heads/pointrcnn_head.py`` + the shared ``RoIHeadTemplate``
machinery: proposal NMS -> (train) roi target sampling -> RoI point pooling
with canonical transform -> xyz-up/merge MLPs -> 3 SA layers -> cls/reg.

All stages are fixed-shape; the flat ``(total_rois, ...)`` layout of the
reference becomes ``(B, R, ...)`` folded into the batch dim for the SA stack.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import box_coder as box_coder_lib
from ...utils import common, loss_utils
from ..blocks import MLPHead, SharedMLP
from ..detectors.detector3d import class_agnostic_nms_batch
from ..sa_module import SAModule
from .roi_utils import proposal_target_layer, roipoint_pool3d


class PointRCNNHead(nn.Module):
    model_cfg: Any
    num_class: int = 1          # CLASS_AGNOSTIC: True

    def setup(self):
        self.box_coder = box_coder_lib.build_box_coder(
            self.model_cfg.TARGET_CONFIG.BOX_CODER)
        use_bn = bool(self.model_cfg.USE_BN)
        self.xyz_up_layer = SharedMLP(list(self.model_cfg.XYZ_UP_LAYER),
                                      use_bn=use_bn, name='xyz_up')
        c_out = self.model_cfg.XYZ_UP_LAYER[-1]
        self.merge_down_layer = SharedMLP([c_out], use_bn=use_bn, name='merge')

        sa_cfg = self.model_cfg.SA_CONFIG
        sa_modules = []
        for k in range(len(sa_cfg.NPOINTS)):
            npoint = sa_cfg.NPOINTS[k] if sa_cfg.NPOINTS[k] != -1 else None
            sa_modules.append(SAModule(
                npoint=npoint,
                radii=[sa_cfg.RADIUS[k]],
                nsamples=[sa_cfg.NSAMPLE[k]],
                mlps=[list(sa_cfg.MLPS[k])],
                name=f'sa_{k}'))
        self.sa_modules = sa_modules
        # the cls/reg towers come from RoIHeadTemplate.make_fc_layers,
        # which ALWAYS interleaves BN (``roi_head_template.py:36-44``) —
        # the head's USE_BN flag governs only xyz_up/merge/SA stacks
        dp = float(self.model_cfg.get('DP_RATIO', 0.0))
        self.cls_layers = MLPHead(list(self.model_cfg.CLS_FC), self.num_class,
                                  use_bn=True, dropout=dp, dropout_idx=(0,),
                                  name='cls_layers')
        self.reg_layers = MLPHead(list(self.model_cfg.REG_FC),
                                  self.box_coder.code_size * self.num_class,
                                  use_bn=True, dropout=dp, dropout_idx=(0,),
                                  name='reg_layers')

    def proposal_layer(self, batch, nms_cfg):
        """Stage-1 preds -> rois via class-agnostic NMS
        (``roi_head_template.py:35-100``)."""
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

    def roipool(self, batch, rois):
        """RoI-aware pooling + canonical transform
        (``pointrcnn_head.py:85-130``)."""
        coords = batch['point_coords']                      # (B, N, 3)
        feats = batch['point_features']
        scores = jax.lax.stop_gradient(batch['point_cls_scores'])
        depth_norm = float(self.model_cfg.ROI_POINT_POOL.DEPTH_NORMALIZER)
        depths = jnp.linalg.norm(coords, axis=-1) / depth_norm - 0.5
        full_feats = jnp.concatenate(
            [scores[..., None], depths[..., None], feats], axis=-1)

        pooled, empty = roipoint_pool3d(
            coords, full_feats, rois[..., :7],
            num_sampled_points=int(self.model_cfg.ROI_POINT_POOL.NUM_SAMPLED_POINTS),
            pool_extra_width=tuple(self.model_cfg.ROI_POINT_POOL.POOL_EXTRA_WIDTH))
        pooled = jax.lax.stop_gradient(pooled)

        # canonical transform of pooled xyz into each roi frame
        B, R, S, D = pooled.shape
        xyz = pooled[..., 0:3] - rois[..., None, 0:3]
        xyz = common.rotate_points_along_z(
            xyz.reshape(B * R, S, 3), -rois[..., 6].reshape(B * R))
        pooled = pooled.at[..., 0:3].set(xyz.reshape(B, R, S, 3))
        pooled = jnp.where(empty[..., None, None], 0.0, pooled)
        return pooled

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

        pooled = self.roipool(batch, rois)                  # (B, R, S, 5+C)
        B, R, S, _ = pooled.shape
        pooled = pooled.reshape(B * R, S, -1)

        n_prefix = 5  # xyz + point score + depth
        xyz_feat = self.xyz_up_layer(pooled[..., :n_prefix], train=train)
        merged = jnp.concatenate([xyz_feat, pooled[..., n_prefix:]], axis=-1)
        merged = self.merge_down_layer(merged, train=train)

        l_xyz, l_feat = pooled[..., 0:3], merged
        for sa in self.sa_modules:
            l_xyz, l_feat = sa(l_xyz, l_feat, train=train)

        shared = l_feat[:, 0, :]                            # (B*R, C)
        rcnn_cls = self.cls_layers(shared, train=train).reshape(B, R, -1)
        rcnn_reg = self.reg_layers(shared, train=train).reshape(B, R, -1)

        ret = {'rcnn_cls': rcnn_cls, 'rcnn_reg': rcnn_reg, 'rois': rois,
               'targets': targets}
        batch = dict(batch)
        batch['roi_head_ret'] = ret

        # decode refined boxes (eval + corner loss)
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

        if not train:
            batch['batch_box_preds'] = decoded
            batch['batch_cls_preds'] = rcnn_cls
            batch['batch_roi_labels'] = roi_labels
            batch['has_class_labels'] = has_class_labels
            batch['cls_preds_normalized'] = False
        return batch


def pointrcnn_head_loss(ret, loss_cfg, box_coder):
    """RoI head loss (``roi_head_template.py:136-232``): BCE cls on sampled
    rois (-1 ignored) + smooth-L1 reg on fg in canonical frame + corner loss.
    """
    lw = loss_cfg.LOSS_WEIGHTS
    t = ret['targets']
    B, R = t.rcnn_cls_labels.shape
    tb = {}

    # cls: binary cross entropy vs (possibly soft) labels
    cls_preds = ret['rcnn_cls'].reshape(B, R)
    labels = t.rcnn_cls_labels
    care = labels >= 0
    bce = loss_utils.sigmoid_cross_entropy_with_logits(
        cls_preds, jnp.clip(labels, 0.0, 1.0))
    cls_loss = jnp.sum(bce * care) / jnp.clip(jnp.sum(care), 1.0, None)
    cls_loss = cls_loss * lw['rcnn_cls_weight']
    tb['rcnn_loss_cls'] = cls_loss

    # reg: targets = encode(gt_canonical vs roi-at-origin anchor)
    code_size = box_coder.code_size
    rois_anchor = t.rois[..., :code_size].at[..., 0:3].set(0.0) \
        .at[..., 6].set(0.0)
    reg_targets = box_coder.encode(t.gt_of_rois[..., :code_size], rois_anchor)
    fg = t.reg_valid_mask.astype(jnp.float32)
    fg_sum = jnp.clip(jnp.sum(fg), 1.0, None)
    reg_loss = loss_utils.weighted_smooth_l1(
        ret['rcnn_reg'].reshape(B, R, code_size), reg_targets,
        code_weights=lw.get('code_weights', None))
    reg_loss = jnp.sum(reg_loss * fg[..., None]) / fg_sum
    reg_loss = reg_loss * lw['rcnn_reg_weight']
    tb['rcnn_loss_reg'] = reg_loss

    corner_loss = 0.0
    if loss_cfg.get('CORNER_LOSS_REGULARIZATION', False):
        pred_boxes = ret['batch_box_preds'].reshape(B * R, 7)
        gt_src = t.gt_of_rois_src[..., :7].reshape(B * R, 7)
        pc = loss_utils.get_corner_loss_lidar(pred_boxes, gt_src)
        corner_loss = jnp.sum(pc * fg.reshape(-1)) / fg_sum
        corner_loss = corner_loss * lw['rcnn_corner_weight']
        tb['rcnn_loss_corner'] = corner_loss

    total = cls_loss + reg_loss + corner_loss
    tb['rcnn_loss'] = total
    return total, tb
