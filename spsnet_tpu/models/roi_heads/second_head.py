"""SECOND IoU head: BEV RoI-grid pooling + IoU prediction.

Rebuild of ``roi_heads/second_head.py`` (used by ``SECONDNetIoU``): each roi
is covered by a GRID_SIZE^2 lattice sampled from ``spatial_features_2d`` via
the reference's ``affine_grid`` + ``grid_sample`` composition
(``second_head.py:54-111``), shared FCs predict a single IoU logit. The head
emits the RAW IoU logits as ``batch_cls_preds`` and the proposal boxes as
``batch_box_preds``; the score blending (SCORE_TYPE routing: iou / cls /
weighted_iou_cls / num_pts_iou_cls / score_by_class) happens in
post-processing, exactly as in the reference's ``second_net_iou.py:76-180``
(see ``detectors/detector3d.iou_rescore_post_processing``).

Composed forward parity vs the reference's own torch modules:
``tests/test_secondiou_forward_parity.py``.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..blocks import MLPHead, SharedMLP
from ..detectors.detector3d import class_agnostic_nms_batch
from .roi_utils import proposal_target_layer


def bev_roi_grid_pool(rois, bev, grid_size, voxel_size, point_cloud_range,
                      downsample_ratio):
    """(B, R, 7) x (B, H, W, C) -> (B, R, C*G*G) bilinear grid features.

    Bit-matches the reference's ``affine_grid`` + ``grid_sample`` composition
    (``second_head.py:75-105``) as EXECUTED under torch>=1.3 defaults:
    ``align_corners=False`` in BOTH ops and zero padding, with theta built in
    the legacy size-1 normalization — the (width-1) factors in theta are part
    of the executed geometry and are replicated as-is. Flatten order is
    channel-major (c*G*G + i*G + j), matching the reference's
    ``(B*R, C, G, G).view(B*R, -1, 1)`` so shared_fc weights import
    weight-for-weight.
    """
    B, R, _ = rois.shape
    G = int(grid_size)
    _, H, W, C = bev.shape
    vx, vy = float(voxel_size[0]), float(voxel_size[1])
    mx, my = float(point_cloud_range[0]), float(point_cloud_range[1])
    ds = float(downsample_ratio)

    cx = (rois[..., 0] - mx) / (vx * ds)
    cy = (rois[..., 1] - my) / (vy * ds)
    hx = rois[..., 3] / (vx * ds) / 2.0          # half extents, fmap pixels
    hy = rois[..., 4] / (vy * ds) / 2.0
    x1, x2 = cx - hx, cx + hx
    y1, y2 = cy - hy, cy + hy
    cosa, sina = jnp.cos(rois[..., 6]), jnp.sin(rois[..., 6])

    # affine_grid(align_corners=False): base coords at output pixel centers
    base = (2.0 * jnp.arange(G, dtype=jnp.float32) + 1.0) / G - 1.0
    xb = jnp.broadcast_to(base[None, :], (G, G))      # x varies along columns
    yb = jnp.broadcast_to(base[:, None], (G, G))

    sx = (x2 - x1) / (W - 1)
    tx = (x1 + x2 - (W - 1)) / (W - 1)
    sy = (y2 - y1) / (H - 1)
    ty = (y1 + y2 - (H - 1)) / (H - 1)
    rot_x = (xb[None, None] * cosa[..., None, None]
             - yb[None, None] * sina[..., None, None])
    rot_y = (xb[None, None] * sina[..., None, None]
             + yb[None, None] * cosa[..., None, None])
    gx = sx[..., None, None] * rot_x + tx[..., None, None]       # (B,R,G,G)
    gy = sy[..., None, None] * rot_y + ty[..., None, None]

    # grid_sample(align_corners=False, padding_mode='zeros', bilinear)
    ix = ((gx + 1.0) * W - 1.0) / 2.0
    iy = ((gy + 1.0) * H - 1.0) / 2.0
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat_bev = bev.reshape(B, H * W, C)

    def corner(yy, xx):
        inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        lin = jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)
        v = jnp.take_along_axis(
            flat_bev, lin.reshape(B, R * G * G)[..., None], axis=1)
        v = v.reshape(B, R, G, G, C)
        return jnp.where(inb[..., None], v, 0.0)

    out = (corner(y0i, x0i) * ((1 - wy) * (1 - wx))[..., None]
           + corner(y0i, x0i + 1) * ((1 - wy) * wx)[..., None]
           + corner(y0i + 1, x0i) * (wy * (1 - wx))[..., None]
           + corner(y0i + 1, x0i + 1) * (wy * wx)[..., None])    # (B,R,G,G,C)
    out = jnp.transpose(out, (0, 1, 4, 2, 3))
    return out.reshape(B, R, C * G * G)


class SECONDHead(nn.Module):
    model_cfg: Any
    num_class: int = 1
    voxel_size: Any = (0.05, 0.05, 0.1)
    point_cloud_range: Any = (0, -40, -3, 70.4, 40, 1)
    bev_stride: int = 8

    def setup(self):
        self.grid_size_2d = int(self.model_cfg.ROI_GRID_POOL.GRID_SIZE)
        self.downsample_ratio = float(self.model_cfg.ROI_GRID_POOL.get(
            'DOWNSAMPLE_RATIO', self.bev_stride))
        # DP_RATIO dropout: between shared_fc blocks (second_head.py:24-25),
        # after the FIRST iou tower block (make_fc_layers k==0)
        dp = float(self.model_cfg.get('DP_RATIO', 0.0))
        self.shared_fc = SharedMLP(
            list(self.model_cfg.SHARED_FC), name='shared_fc', dropout=dp,
            dropout_idx=tuple(range(max(len(self.model_cfg.SHARED_FC) - 1,
                                        0))))
        self.iou_layers = MLPHead(list(self.model_cfg.IOU_FC), 1,
                                  dropout=dp, dropout_idx=(0,),
                                  name='iou_layers')

    def proposal_layer(self, batch, nms_cfg):
        # the reference orders NMS by the RAW max class logit and keeps the
        # raw value as roi_scores (roi_head_template.py:84); pass
        # cls_preds_normalized=True so no sigmoid is applied (ordering is
        # identical either way — sigmoid is monotonic)
        dets = class_agnostic_nms_batch(
            batch['batch_box_preds'], batch['batch_cls_preds'],
            score_thresh=-1e9,
            nms_thresh=float(nms_cfg.NMS_THRESH),
            nms_pre=int(nms_cfg.NMS_PRE_MAXSIZE),
            nms_post=int(nms_cfg.NMS_POST_MAXSIZE),
            cls_preds_normalized=True)
        R = dets['boxes'].shape[1]
        valid = jnp.arange(R)[None, :] < dets['count'][:, None]
        return dets['boxes'], dets['scores'], dets['labels'], valid

    def __call__(self, batch, train: bool = True):
        nms_cfg = self.model_cfg.NMS_CONFIG.TRAIN if train \
            else self.model_cfg.NMS_CONFIG.TEST
        # reference rule (roi_head_template.py:102): class labels are
        # meaningful iff the RPN emitted >1 class channel
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
            roi_scores = targets.roi_scores

        pooled = bev_roi_grid_pool(
            jax.lax.stop_gradient(rois[..., :7]),
            jax.lax.stop_gradient(batch['spatial_features_2d']),
            self.grid_size_2d, self.voxel_size, self.point_cloud_range,
            self.downsample_ratio)
        shared = self.shared_fc(pooled, train=train)
        rcnn_iou = self.iou_layers(shared, train=train)[..., 0]   # (B, R)

        ret = {'rcnn_iou': rcnn_iou, 'rois': rois, 'targets': targets}
        batch = dict(batch)
        batch['second_head_ret'] = ret
        if not train:
            # raw logits out; score blending happens in post-processing
            # (second_head.py:133-136 + second_net_iou.py:76-180)
            batch['batch_box_preds'] = rois[..., :7]
            batch['batch_cls_preds'] = rcnn_iou[..., None]
            batch['batch_roi_scores'] = roi_scores
            batch['batch_roi_labels'] = roi_labels
            batch['cls_preds_normalized'] = False
            batch['has_class_labels'] = has_class_labels
            batch['iou_rescoring'] = True
        return batch


def second_head_loss(ret, loss_cfg):
    """IoU regression vs iou-mapped labels
    (``second_head.py get_box_iou_layer_loss:158-178``): the targets are
    ``rcnn_cls_labels`` — with CLS_SCORE_TYPE roi_iou the (iou-bg)/(fg-bg)
    clamp from the proposal target layer; labels < 0 are ignored."""
    t = ret['targets']
    labels = t.rcnn_cls_labels                      # (B, M) float
    logits = ret['rcnn_iou']
    kind = loss_cfg.get('IOU_LOSS', 'BinaryCrossEntropy')
    if kind == 'BinaryCrossEntropy':
        per = (jnp.clip(logits, 0, None) - logits * labels
               + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    elif kind == 'L2':
        per = (logits - labels) ** 2
    elif kind == 'smoothL1':
        diff = jnp.abs(logits - labels)
        beta = 1.0 / 9.0
        per = jnp.where(diff < beta, 0.5 * diff ** 2 / beta,
                        diff - 0.5 * beta)
    else:
        raise NotImplementedError(f'IOU_LOSS {kind}')
    care = (labels >= 0).astype(jnp.float32)
    loss = jnp.sum(per * care) / jnp.clip(jnp.sum(care), 1.0, None)
    loss = loss * loss_cfg.LOSS_WEIGHTS.get('rcnn_iou_weight', 1.0)
    return loss, {'rcnn_iou_loss': loss}
