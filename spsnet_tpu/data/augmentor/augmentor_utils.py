"""Geometric augmentation primitives (host numpy).

Parity: ``pcdet/datasets/augmentor/augmentor_utils.py`` — world flips with
50% probability, global rotation about z, global scaling; boxes and points
transform together. Heading convention: boxes ``[x,y,z,dx,dy,dz,heading,...]``.
"""
from __future__ import annotations

import numpy as np


def rotate_points_along_z_np(points, angle):
    """(N, 3+C) rotated by scalar angle (x toward y).

    Native fast path (bit-identical: same f32 op order, trig rounded to
    f32 by numpy on both paths) for large f32 arrays; numpy matmul
    otherwise."""
    cosa, sina = np.cos(angle), np.sin(angle)
    if points.dtype == np.float32 and points.shape[0] >= 1024:
        from ...native.hostpipe import rot_z_inplace_native
        out = points.copy()
        if rot_z_inplace_native(out, np.float32(cosa), np.float32(sina)):
            return out
    rot = np.array([[cosa, sina, 0], [-sina, cosa, 0], [0, 0, 1]],
                   dtype=points.dtype)
    out = points.copy()
    out[:, 0:3] = points[:, 0:3] @ rot
    return out


def _negate_col(points, col):
    """In-place column negation (exact in any precision); native single
    pass for big f32 arrays, numpy otherwise."""
    if points.dtype == np.float32 and points.shape[0] >= 1024:
        from ...native.hostpipe import negate_col_inplace_native
        if negate_col_inplace_native(points, col):
            return
    points[:, col] = -points[:, col]


def random_flip_along_x(gt_boxes, points, enable=None, enable_prob=0.5):
    """Flip y -> -y (``augmentor_utils.py:45-116`` ALONG_AXIS x). The
    reference fork parameterizes the enable draw (ENABLE_PROB); draw order
    matches it exactly so seeded RNG streams are bit-reproducible."""
    if enable is None:
        enable = np.random.choice([False, True], replace=False,
                                  p=[1.0 - enable_prob, enable_prob])
    if enable:
        gt_boxes = gt_boxes.copy()
        points = points.copy()
        gt_boxes[:, 1] = -gt_boxes[:, 1]
        gt_boxes[:, 6] = -gt_boxes[:, 6]
        _negate_col(points, 1)
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 8] = -gt_boxes[:, 8]   # velocity y
    return gt_boxes, points


def random_flip_along_y(gt_boxes, points, enable=None, enable_prob=0.5):
    if enable is None:
        enable = np.random.choice([False, True], replace=False,
                                  p=[1.0 - enable_prob, enable_prob])
    if enable:
        gt_boxes = gt_boxes.copy()
        points = points.copy()
        gt_boxes[:, 0] = -gt_boxes[:, 0]
        gt_boxes[:, 6] = -(gt_boxes[:, 6] + np.pi)
        _negate_col(points, 0)
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 7] = -gt_boxes[:, 7]
    return gt_boxes, points


def global_rotation(gt_boxes, points, rot_range, angle=None,
                    enable_prob=1.0):
    if angle is None:
        # the reference draws the enable choice even at prob 1.0
        # (``augmentor_utils.py:127``) — mirror it so seeded streams align
        enable = np.random.choice([False, True], replace=False,
                                  p=[1.0 - enable_prob, enable_prob])
        if not enable:
            return gt_boxes, points
        angle = np.random.uniform(rot_range[0], rot_range[1])
    points = rotate_points_along_z_np(points, angle)
    gt_boxes = gt_boxes.copy()
    gt_boxes[:, 0:3] = rotate_points_along_z_np(gt_boxes[:, 0:3], angle)
    gt_boxes[:, 6] += angle
    if gt_boxes.shape[1] > 7:
        vel = np.concatenate(
            [gt_boxes[:, 7:9],
             np.zeros((gt_boxes.shape[0], 1), dtype=gt_boxes.dtype)], axis=1)
        gt_boxes[:, 7:9] = rotate_points_along_z_np(vel, angle)[:, 0:2]
    return gt_boxes, points


def _points_in_box_mask(points, box):
    """(N, 3+) x (7,) -> bool mask of points inside the rotated box."""
    shift = points[:, :3] - box[:3]
    cosa, sina = np.cos(-box[6]), np.sin(-box[6])
    lx = shift[:, 0] * cosa - shift[:, 1] * sina
    ly = shift[:, 0] * sina + shift[:, 1] * cosa
    return ((np.abs(shift[:, 2]) <= box[5] / 2) &
            (np.abs(lx) < box[3] / 2 + 1e-5) & (np.abs(ly) < box[4] / 2 + 1e-5))


def random_world_translation(gt_boxes, points, noise_std,
                             along=('x', 'y', 'z')):
    """Global gaussian translation per axis (parity:
    ``augmentor_utils.random_translation_along_{x,y,z}:199-250``): one
    N(0, std) offset per axis applied to all points and box centers."""
    axis_idx = {'x': 0, 'y': 1, 'z': 2}
    gt_boxes = gt_boxes.copy()
    points = points.copy()
    for ax in along:
        j = axis_idx[ax]
        off = np.random.normal(0, noise_std)
        points[:, j] += off
        gt_boxes[:, j] += off
    return gt_boxes, points


def get_points_in_box(points, gt_box):
    """Reference-exact in-box mask for the LOCAL aug family
    (``augmentor_utils.py:549-566``): 1e-1 xy margin, inclusive bounds.
    Returns (points_in_box, mask) like the reference."""
    shift = points[:, :3] - gt_box[:3]
    cosa, sina = np.cos(-gt_box[6]), np.sin(-gt_box[6])
    local_x = shift[:, 0] * cosa - shift[:, 1] * sina
    local_y = shift[:, 0] * sina + shift[:, 1] * cosa
    MARGIN = 1e-1
    mask = ((np.abs(shift[:, 2]) <= gt_box[5] / 2.0) &
            (np.abs(local_x) <= gt_box[3] / 2.0 + MARGIN) &
            (np.abs(local_y) <= gt_box[4] / 2.0 + MARGIN))
    return points[mask], mask


def random_local_translation(gt_boxes, points, offset_range, along=('x', 'y', 'z')):
    """Per-gt-box random translation of the box and its points. Loop order
    mirrors the reference exactly — OUTER loop over axes, inner over boxes,
    mask recomputed per (axis, box) (``data_augmentor.py:158-173`` +
    ``augmentor_utils.random_local_translation_along_*:253-318``) — so
    seeded RNG streams and mask drift after each axis are identical."""
    axis_idx = {'x': 0, 'y': 1, 'z': 2}
    gt_boxes = gt_boxes.copy()
    points = points.copy()
    for ax in along:
        j = axis_idx[ax]
        for i, box in enumerate(gt_boxes):
            off = np.random.uniform(offset_range[0], offset_range[1])
            _, mask = get_points_in_box(points, box)
            points[mask, j] += off
            gt_boxes[i, j] += off
    return gt_boxes, points


def random_local_rotation(gt_boxes, points, rot_range):
    """Per-gt-box rotation about the box center
    (parity: ``augmentor_utils.local_rotation:420-466``; the reference's
    velocity-column rotation there is unreachable — it hstacks a (2,) row
    with an (N, 1) column and would crash — so 9-dim boxes keep their
    velocity, documented deviation)."""
    gt_boxes = gt_boxes.copy()
    points = points.copy()
    for i, box in enumerate(gt_boxes):
        angle = np.random.uniform(rot_range[0], rot_range[1])
        _, mask = get_points_in_box(points, box)
        ctr = box[:3].copy()
        local = points[mask, :3] - ctr
        points[mask, :3] = rotate_points_along_z_np(
            np.concatenate([local, points[mask, 3:]], axis=1), angle)[:, :3] + ctr
        gt_boxes[i, 6] += angle
    return gt_boxes, points


def random_local_scaling(gt_boxes, points, scale_range):
    """Per-gt-box scaling about the box center
    (parity: ``augmentor_utils.local_scaling:386-417``)."""
    if scale_range[1] - scale_range[0] < 1e-3:
        return gt_boxes, points
    gt_boxes = gt_boxes.copy()
    points = points.copy()
    for i, box in enumerate(gt_boxes):
        scale = np.random.uniform(scale_range[0], scale_range[1])
        _, mask = get_points_in_box(points, box)
        ctr = box[:3]
        points[mask, :3] = (points[mask, :3] - ctr) * scale + ctr
        gt_boxes[i, 3:6] *= scale
    return gt_boxes, points


def local_frustum_dropout(gt_boxes, points, intensity_range, direction='top'):
    """Per-gt-box frustum dropout (parity:
    ``augmentor_utils.local_frustum_dropout_{top,bottom,left,right}:469-546``):
    for each box, drop its points beyond a random fraction of the box
    extent along the chosen face."""
    axis, lo_sign = {'top': (2, 1), 'bottom': (2, -1),
                     'left': (1, 1), 'right': (1, -1)}[direction]
    for box in gt_boxes:
        c, d = box[axis], box[3 + axis]
        intensity = np.random.uniform(intensity_range[0], intensity_range[1])
        _, mask = get_points_in_box(points, box)
        if lo_sign > 0:
            threshold = (c + d / 2) - intensity * d
            drop = mask & (points[:, axis] >= threshold)
        else:
            threshold = (c - d / 2) + intensity * d
            drop = mask & (points[:, axis] <= threshold)
        points = points[~drop]
    return gt_boxes, points


def global_frustum_dropout(gt_boxes, points, intensity_range, direction='top'):
    """Drop a random frustum of points (parity:
    ``augmentor_utils.global_frustum_dropout_*``): remove points beyond a
    random fraction of the cloud extent along the chosen direction."""
    if len(points) == 0:
        return gt_boxes, points
    intensity = np.random.uniform(intensity_range[0], intensity_range[1])
    axis, sign = {'top': (2, 1), 'bottom': (2, -1),
                  'left': (1, 1), 'right': (1, -1)}[direction]
    vals = points[:, axis] * sign
    thresh = vals.max() - intensity * (vals.max() - vals.min())
    keep = vals < thresh
    return gt_boxes, points[keep]


def global_scaling(gt_boxes, points, scale_range, scale=None,
                   enable_prob=1.0):
    if scale_range[1] - scale_range[0] < 1e-3:
        return gt_boxes, points
    if scale is None:
        enable = np.random.choice([False, True], replace=False,
                                  p=[1.0 - enable_prob, enable_prob])
        if not enable:
            return gt_boxes, points
        scale = np.random.uniform(scale_range[0], scale_range[1])
    # np.float64 scalar (what np.random.uniform returns): numpy computes the
    # in-place f32 multiply in f64 then rounds (NEP 50 strong scalar); the
    # native kernel does the same. Coerce so an explicitly-passed python
    # float (weak scalar -> f32 compute) behaves identically on both paths.
    scale = np.float64(scale)
    points = points.copy()
    gt_boxes = gt_boxes.copy()
    if points.dtype == np.float32 and points.shape[0] >= 1024:
        from ...native.hostpipe import scale_xyz_inplace_native
        if not scale_xyz_inplace_native(points, float(scale)):
            points[:, :3] *= scale
    else:
        points[:, :3] *= scale
    gt_boxes[:, :6] *= scale
    return gt_boxes, points


def random_image_flip_horizontal(image, depth_map, gt_boxes, calib,
                                 enable=None):
    """CaDDN horizontal image flip (``augmentor_utils.py:159-197``): flip the
    image/depth map, mirror box centroids through image space, negate ry."""
    if enable is None:
        enable = np.random.choice([False, True], replace=False, p=[0.5, 0.5])
    if not enable:
        return image, depth_map, gt_boxes
    aug_image = np.fliplr(image)
    aug_depth = np.fliplr(depth_map)
    aug_boxes = gt_boxes.copy()
    if len(aug_boxes):
        img_pts, img_depth = calib.lidar_to_img(aug_boxes[:, :3])
        W = image.shape[1]
        img_pts[:, 0] = W - img_pts[:, 0]
        pts_rect = calib.img_to_rect(u=img_pts[:, 0], v=img_pts[:, 1],
                                     depth_rect=img_depth)
        aug_boxes[:, :3] = calib.rect_to_lidar(pts_rect)
        aug_boxes[:, 6] = -aug_boxes[:, 6]
    return aug_image, aug_depth, aug_boxes
