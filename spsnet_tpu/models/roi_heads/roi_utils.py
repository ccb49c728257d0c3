"""Two-stage RoI machinery as fixed-shape jnp: proposal target sampling,
canonical transforms, RoI point pooling.

Rebuild of ``roi_heads/target_assigner/proposal_target_layer.py`` and
``roi_heads/roi_head_template.py:104-137`` plus ``roipoint_pool3d_cuda``
(``roipoint_pool3d_kernel.cu:38-103``). All per-frame python loops become
vmapped dense ops; random subsampling uses explicit PRNG keys.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ... import ops
from ...ops.grouping import _first_k_hits
from ...utils import box_utils, common


class RoiTargets(NamedTuple):
    rois: jnp.ndarray           # (B, M, 7)
    roi_labels: jnp.ndarray     # (B, M) int32
    roi_scores: jnp.ndarray     # (B, M)
    gt_of_rois: jnp.ndarray     # (B, M, 8) canonical-frame gt
    gt_of_rois_src: jnp.ndarray # (B, M, 8) lidar-frame gt
    gt_iou_of_rois: jnp.ndarray # (B, M)
    reg_valid_mask: jnp.ndarray # (B, M) bool
    rcnn_cls_labels: jnp.ndarray  # (B, M) float (-1 = ignore)


def max_iou_with_same_class(rois, roi_labels, gt_boxes):
    """(R, 7) x (R,) x (T, 8) -> (max_iou (R,), gt_idx (R,)).

    Parity: ``ProposalTargetLayer.get_max_iou_with_same_class`` — a roi only
    matches gt of its own class; padding gt (class 0) never matches.
    """
    iou = ops.boxes_iou3d(rois, gt_boxes[:, :7])            # (R, T)
    same = roi_labels[:, None] == gt_boxes[None, :, 7].astype(jnp.int32)
    valid = gt_boxes[None, :, 3] > 0
    iou = jnp.where(same & valid, iou, -1.0)
    max_iou = jnp.max(iou, axis=1)
    gt_idx = jnp.argmax(iou, axis=1).astype(jnp.int32)
    return jnp.clip(max_iou, 0.0, None), gt_idx


def _rank_among(mask, rand):
    """Random rank of each element among mask members (0-based; ~inf outside)."""
    key = jnp.where(mask, rand, jnp.inf)
    order = jnp.argsort(key)
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return jnp.where(mask, rank, jnp.int32(2 ** 30))


def subsample_rois(rng, max_overlaps, roi_valid, cfg):
    """Fixed-shape analog of ``ProposalTargetLayer.subsample_rois``.

    Returns (M,) int32 indices into the roi axis (with replacement where the
    reference uses replacement). cfg needs ROI_PER_IMAGE, FG_RATIO,
    REG_FG_THRESH, CLS_FG_THRESH, CLS_BG_THRESH_LO, HARD_BG_RATIO.
    """
    M = int(cfg.ROI_PER_IMAGE)
    fg_quota = int(np.round(cfg.FG_RATIO * M))
    fg_thresh = min(float(cfg.REG_FG_THRESH), float(cfg.CLS_FG_THRESH))
    lo = float(cfg.CLS_BG_THRESH_LO)
    hard_ratio = float(cfg.HARD_BG_RATIO)

    R = max_overlaps.shape[0]
    k1, k2, k3 = jax.random.split(rng, 3)
    rand = jax.random.uniform(k1, (R,))

    fg = (max_overlaps >= fg_thresh) & roi_valid
    easy = (max_overlaps < lo) & roi_valid
    hard = (max_overlaps < cfg.REG_FG_THRESH) & (max_overlaps >= lo) & roi_valid

    n_fg = jnp.sum(fg)
    n_easy = jnp.sum(easy)
    n_hard = jnp.sum(hard)
    n_bg = n_easy + n_hard

    # pools: roi indices sorted so each group's members come first (random order)
    def pool(mask):
        key = jnp.where(mask, rand, 2.0 + rand)
        return jnp.argsort(key).astype(jnp.int32)       # members first

    fg_pool, hard_pool, easy_pool = pool(fg), pool(hard), pool(easy)

    n_fg_sel = jnp.minimum(n_fg, fg_quota)
    n_fg_sel = jnp.where(n_bg == 0, jnp.where(n_fg > 0, M, 0), n_fg_sel)
    bg_needed = M - n_fg_sel
    # hard/easy split (reference samples both with replacement)
    n_hard_sel = jnp.where(
        (n_hard > 0) & (n_easy > 0),
        jnp.minimum((bg_needed * hard_ratio).astype(jnp.int32), bg_needed),
        jnp.where(n_hard > 0, bg_needed, 0))

    slots = jnp.arange(M)
    ri = jax.random.randint(k2, (M,), 0, 2 ** 30)

    # with-replacement draws inside each pool
    fg_draw = jnp.where(slots < jnp.minimum(n_fg, fg_quota), slots,
                        ri % jnp.maximum(n_fg, 1))
    hard_draw = ri % jnp.maximum(n_hard, 1)
    easy_draw = jax.random.randint(k3, (M,), 0, 2 ** 30) % jnp.maximum(n_easy, 1)

    idx_fg = fg_pool[jnp.clip(fg_draw, 0, R - 1)]
    idx_hard = hard_pool[jnp.clip(hard_draw, 0, R - 1)]
    idx_easy = easy_pool[jnp.clip(easy_draw, 0, R - 1)]

    in_fg = slots < n_fg_sel
    in_hard = (slots >= n_fg_sel) & (slots < n_fg_sel + n_hard_sel)
    sampled = jnp.where(in_fg, idx_fg, jnp.where(in_hard, idx_hard, idx_easy))
    return sampled.astype(jnp.int32)


def proposal_target_layer(rng, rois, roi_scores, roi_labels, roi_valid,
                          gt_boxes, cfg):
    """Batched RoI target sampling + canonical gt transform
    (``roi_head_template.py:104-137`` + ``proposal_target_layer.py``)."""
    B = rois.shape[0]
    keys = jax.random.split(rng, B)

    def one(key, roi, score, label, valid, gt):
        max_iou, gt_idx = max_iou_with_same_class(roi[:, :7], label, gt)
        sel = subsample_rois(key, max_iou, valid, cfg)
        return (roi[sel], label[sel], score[sel], gt[gt_idx[sel]],
                max_iou[sel])

    srois, slabels, sscores, sgt, sious = jax.vmap(one)(
        keys, rois, roi_scores, roi_labels, roi_valid, gt_boxes)

    reg_valid = sious > float(cfg.REG_FG_THRESH)
    if cfg.CLS_SCORE_TYPE == 'cls':
        cls_labels = (sious > float(cfg.CLS_FG_THRESH)).astype(jnp.float32)
        ignore = (sious > float(cfg.CLS_BG_THRESH)) & \
                 (sious < float(cfg.CLS_FG_THRESH))
        cls_labels = jnp.where(ignore, -1.0, cls_labels)
    elif cfg.CLS_SCORE_TYPE == 'roi_iou':
        bg_t, fg_t = float(cfg.CLS_BG_THRESH), float(cfg.CLS_FG_THRESH)
        cls_labels = jnp.clip((sious - bg_t) / (fg_t - bg_t), 0.0, 1.0)
    else:
        raise NotImplementedError(cfg.CLS_SCORE_TYPE)

    # canonical transform of gt into each roi frame + heading flip to [-pi/2, pi/2]
    roi_center = srois[..., 0:3]
    roi_ry = srois[..., 6] % (2 * np.pi)
    gt_ct = sgt.at[..., 0:3].add(-roi_center)
    gt_ct = gt_ct.at[..., 6].add(-roi_ry)
    B_, M_, D = gt_ct.shape
    xyz_local = common.rotate_points_along_z(
        gt_ct[..., 0:3].reshape(B_ * M_, 1, 3),
        -roi_ry.reshape(B_ * M_)).reshape(B_, M_, 3)
    gt_ct = gt_ct.at[..., 0:3].set(xyz_local)

    heading = gt_ct[..., 6] % (2 * np.pi)
    opposite = (heading > np.pi * 0.5) & (heading < np.pi * 1.5)
    heading = jnp.where(opposite, (heading + np.pi) % (2 * np.pi), heading)
    heading = jnp.where(heading > np.pi, heading - 2 * np.pi, heading)
    heading = jnp.clip(heading, -np.pi / 2, np.pi / 2)
    gt_ct = gt_ct.at[..., 6].set(heading)

    return RoiTargets(rois=srois, roi_labels=slabels, roi_scores=sscores,
                      gt_of_rois=gt_ct, gt_of_rois_src=sgt,
                      gt_iou_of_rois=sious, reg_valid_mask=reg_valid,
                      rcnn_cls_labels=cls_labels)


@functools.partial(jax.jit, static_argnames=('num_sampled_points',))
def roipoint_pool3d(points, point_features, rois, num_sampled_points=512,
                    pool_extra_width=(0.0, 0.0, 0.0)):
    """Pool a fixed number of in-box points per RoI.

    Args:
        points: (B, N, 3); point_features: (B, N, C); rois: (B, R, 7).
    Returns:
        pooled: (B, R, S, 3 + C) — raw xyz + features, slot-padded with the
            first hit (CUDA wraps cyclically; max-pooled consumers see the
            same set);
        empty: (B, R) bool — rois with zero inside points (zeroed by caller).

    Parity: ``roipoint_pool3d_kernel.cu:38-103``.
    """
    ext = box_utils.enlarge_box3d(rois, pool_extra_width)
    local = box_utils.points_to_box_local(points, ext)           # (B, N, R, 3)
    inside = box_utils.in_canonical_box(local, ext[..., None, :, 3:6])
    inside = inside & (ext[..., None, :, 3] > 0)
    inside = jnp.swapaxes(inside, 1, 2)                          # (B, R, N)
    idx = _first_k_hits(inside, num_sampled_points)              # (B, R, S)
    empty = jnp.logical_not(jnp.any(inside, axis=-1))

    full = jnp.concatenate([points, point_features], axis=-1)    # (B, N, 3+C)
    B, R, S = idx.shape
    flat = idx.reshape(B, R * S)
    pooled = jnp.take_along_axis(full, flat[..., None], axis=1)
    pooled = pooled.reshape(B, R, S, full.shape[-1])
    return pooled, empty
