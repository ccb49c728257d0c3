"""Batched, masked point-to-box target assignment (pure jnp).

Replaces ``IASSD_Head.assign_stack_targets_IASSD``
(``dense_heads/IASSD_head.py:124-236``), which loops per frame and gathers
ragged fg subsets. Here everything is dense ``(B, M)`` with validity masks —
jit-friendly and batch-parallel.

Box layout: gt_boxes (B, T, 8) = [x, y, z, dx, dy, dz, heading, class],
zero rows are padding (class 0).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ... import ops
from ...utils import box_utils, common


class PointTargets(NamedTuple):
    """Dense analog of the reference's targets_dict."""
    cls_labels: jnp.ndarray          # (B, M) int32: 0 bg, -1 ignored, c>0 fg
    box_idxs: jnp.ndarray            # (B, M) int32 box index or -1
    gt_box_of_points: jnp.ndarray    # (B, M, 8) containing box (zeros if none)
    fg_mask: jnp.ndarray             # (B, M) bool
    box_labels: Optional[jnp.ndarray] = None  # (B, M, 8) encoded or None


def _gather_boxes(gt_boxes, idx):
    """(B, T, 8) gathered by (B, M) clip(idx, 0) -> (B, M, 8)."""
    safe = jnp.clip(idx, 0, None)
    return jnp.take_along_axis(gt_boxes, safe[..., None], axis=1)


def assign_targets_iassd(points, gt_boxes, extend_gt_boxes=None,
                         set_ignore_flag=True, use_ex_gt_assign=False,
                         fg_pc_ignore=False, ret_box_labels=False,
                         box_coder=None, num_class=3, binary_label=False):
    """
    Args:
        points: (B, M, 3) assignment coordinates.
        gt_boxes: (B, T, 8) zero-padded.
        extend_gt_boxes: (B, T, 8) enlarged boxes or None.
    Returns: PointTargets.

    Variants mirror ``assign_stack_targets_IASSD``:
    - ``set_ignore_flag``: fg from exact boxes; points only inside the
      enlarged box get label -1 (``IASSD_head.py:193-200``).
    - ``use_ex_gt_assign``: fg from enlarged boxes, but points inside the
      exact box keep their instance index (``:172-186``); with
      ``fg_pc_ignore`` the exact-box interior is ignored instead (xor mask).
    """
    box_idxs = ops.points_in_boxes(points, gt_boxes[..., :7])
    box_fg = box_idxs >= 0

    if use_ex_gt_assign:
        ext_idxs = ops.points_in_boxes(points, extend_gt_boxes[..., :7])
        ext_fg = ext_idxs >= 0
        merged = jnp.where(box_fg, box_idxs, ext_idxs)
        if fg_pc_ignore:
            fg = ext_fg ^ box_fg
            merged = jnp.where(box_fg, -1, merged)
            box_idxs = merged
            ignore = jnp.zeros_like(fg)
        else:
            fg = ext_fg
            box_idxs = merged
            ignore = jnp.zeros_like(fg)
    elif set_ignore_flag:
        ext_idxs = ops.points_in_boxes(points, extend_gt_boxes[..., :7])
        fg = box_fg
        ignore = (ext_idxs >= 0) & jnp.logical_not(fg)
    else:
        fg = box_fg
        ignore = jnp.zeros_like(fg)

    gt_of_points = _gather_boxes(gt_boxes, box_idxs)
    gt_cls = gt_of_points[..., 7].astype(jnp.int32)
    if num_class == 1 or binary_label:
        fg_label = jnp.ones_like(gt_cls)
    else:
        fg_label = gt_cls
    cls_labels = jnp.where(fg, fg_label, 0)
    cls_labels = jnp.where(ignore, -1, cls_labels)
    # A fg point whose gathered class is 0 (degenerate box) becomes bg;
    # mirror the reference's `fg_flag = fg_flag ^ (fg_flag & bg_flag)`.
    fg = fg & (cls_labels > 0)

    box_labels = None
    if ret_box_labels:
        enc = box_coder.encode(gt_of_points[..., :7], points,
                               gt_classes=gt_cls)
        box_labels = jnp.where(fg[..., None], enc, 0.0)

    gt_of_points = jnp.where(fg[..., None], gt_of_points, 0.0)
    return PointTargets(cls_labels=cls_labels, box_idxs=box_idxs,
                        gt_box_of_points=gt_of_points, fg_mask=fg,
                        box_labels=box_labels)


def centerness_mask(points, cls_labels, gt_box_of_points, fg_mask):
    """Per-point centerness in the containing box (``IASSD_head.py:626-649``).

    centerness = ((min/max distance product over xyz) clipped)^{1/3}; zero for
    non-fg points.
    """
    boxes = gt_box_of_points
    offset = points - boxes[..., 0:3]
    B, M, _ = offset.shape
    canical = common.rotate_points_along_z(
        offset.reshape(B * M, 1, 3), -boxes[..., 6].reshape(B * M))
    canical = canical.reshape(B, M, 3)
    half = boxes[..., 3:6] / 2.0
    dist_plus = half - canical      # distance to +face
    dist_minus = half + canical     # distance to -face
    dmin = jnp.minimum(dist_plus, dist_minus)
    dmax = jnp.maximum(dist_plus, dist_minus)
    ratio = dmin / jnp.where(jnp.abs(dmax) > 1e-12, dmax, 1e-12)
    centerness = ratio[..., 0] * ratio[..., 1] * ratio[..., 2]
    centerness = jnp.clip(centerness, 1e-6, None) ** (1.0 / 3.0)
    return jnp.where(fg_mask, centerness, 0.0)
