"""Geometric augmentation primitives (host numpy).

Parity: ``pcdet/datasets/augmentor/augmentor_utils.py`` — world flips with
50% probability, global rotation about z, global scaling; boxes and points
transform together. Heading convention: boxes ``[x,y,z,dx,dy,dz,heading,...]``.
"""
from __future__ import annotations

import numpy as np


def rotate_points_along_z_np(points, angle):
    """(N, 3+C) rotated by scalar angle (x toward y)."""
    cosa, sina = np.cos(angle), np.sin(angle)
    rot = np.array([[cosa, sina, 0], [-sina, cosa, 0], [0, 0, 1]],
                   dtype=points.dtype)
    out = points.copy()
    out[:, 0:3] = points[:, 0:3] @ rot
    return out


def random_flip_along_x(gt_boxes, points, enable=None):
    """Flip y -> -y (``augmentor_utils.py:45-116`` ALONG_AXIS x)."""
    if enable is None:
        enable = np.random.choice([False, True], p=[0.5, 0.5])
    if enable:
        gt_boxes = gt_boxes.copy()
        points = points.copy()
        gt_boxes[:, 1] = -gt_boxes[:, 1]
        gt_boxes[:, 6] = -gt_boxes[:, 6]
        points[:, 1] = -points[:, 1]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 8] = -gt_boxes[:, 8]   # velocity y
    return gt_boxes, points


def random_flip_along_y(gt_boxes, points, enable=None):
    if enable is None:
        enable = np.random.choice([False, True], p=[0.5, 0.5])
    if enable:
        gt_boxes = gt_boxes.copy()
        points = points.copy()
        gt_boxes[:, 0] = -gt_boxes[:, 0]
        gt_boxes[:, 6] = -(gt_boxes[:, 6] + np.pi)
        points[:, 0] = -points[:, 0]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 7] = -gt_boxes[:, 7]
    return gt_boxes, points


def global_rotation(gt_boxes, points, rot_range, angle=None):
    if angle is None:
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


def global_scaling(gt_boxes, points, scale_range, scale=None):
    if scale_range[1] - scale_range[0] < 1e-3:
        return gt_boxes, points
    if scale is None:
        scale = np.random.uniform(scale_range[0], scale_range[1])
    points = points.copy()
    gt_boxes = gt_boxes.copy()
    points[:, :3] *= scale
    gt_boxes[:, :6] *= scale
    return gt_boxes, points
