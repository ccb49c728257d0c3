"""Rotated 2D IoU for the KITTI evaluator (camera x-z plane), numpy.

Replaces the reference's numba-CUDA ``rotate_iou.py:262-330`` with a
vectorized Sutherland-Hodgman clip (AABB-prefiltered). Criterion semantics
match the devkit: -1 = union IoU, 0 = overlap/area_a, 1 = overlap/area_b.
"""
from __future__ import annotations

import numpy as np


def _corners2d(boxes):
    """boxes (N, 5) [cx, cy, w, h, angle] -> (N, 4, 2) corners (CCW)."""
    w, h = boxes[:, 2], boxes[:, 3]
    template = np.array([[0.5, 0.5], [-0.5, 0.5], [-0.5, -0.5], [0.5, -0.5]])
    local = template[None] * np.stack([w, h], axis=-1)[:, None, :]
    c, s = np.cos(boxes[:, 4]), np.sin(boxes[:, 4])
    x = local[..., 0] * c[:, None] - local[..., 1] * s[:, None]
    y = local[..., 0] * s[:, None] + local[..., 1] * c[:, None]
    return np.stack([x, y], axis=-1) + boxes[:, None, 0:2]


def _clip(poly, e1, e2):
    out = []
    n = len(poly)
    d = e2 - e1
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        fc = d[0] * (cur[1] - e1[1]) - d[1] * (cur[0] - e1[0])
        fn = d[0] * (nxt[1] - e1[1]) - d[1] * (nxt[0] - e1[0])
        if fc >= 0:
            out.append(cur)
        if (fc >= 0) != (fn >= 0):
            out.append(cur + fc / (fc - fn) * (nxt - cur))
    return out


def _overlap_pair(ca, cb):
    poly = list(ca)
    for k in range(4):
        if not poly:
            return 0.0
        poly = _clip(poly, cb[k], cb[(k + 1) % 4])
    if len(poly) < 3:
        return 0.0
    p = np.asarray(poly)
    return 0.5 * abs(np.dot(p[:, 0], np.roll(p[:, 1], -1)) -
                     np.dot(p[:, 1], np.roll(p[:, 0], -1)))


def rotate_iou_eval(boxes, qboxes, criterion=-1):
    """(N, 5) x (K, 5) -> (N, K) rotated IoU (devkit convention).

    Criterion matches ``rotate_iou.py`` `devRotateIoUEval`: -1 = union IoU,
    0 = overlap/area_a, 1 = overlap/area_b, anything else = the raw
    intersection AREA (the devkit's ua=1.0 branch; ``d3_box_overlap`` calls
    with criterion=2 to get the BEV intersection before the height product).
    """
    n, k = boxes.shape[0], qboxes.shape[0]
    out = np.zeros((n, k), dtype=np.float32)
    if n == 0 or k == 0:
        return out
    ca, cb = _corners2d(boxes), _corners2d(qboxes)
    area_a = boxes[:, 2] * boxes[:, 3]
    area_b = qboxes[:, 2] * qboxes[:, 3]
    amin, amax = ca.min(axis=1), ca.max(axis=1)
    bmin, bmax = cb.min(axis=1), cb.max(axis=1)
    maybe = ~((amax[:, None, 0] < bmin[None, :, 0]) |
              (bmax[None, :, 0] < amin[:, None, 0]) |
              (amax[:, None, 1] < bmin[None, :, 1]) |
              (bmax[None, :, 1] < amin[:, None, 1]))
    for i, j in zip(*np.nonzero(maybe)):
        ov = _overlap_pair(ca[i], cb[j])
        if criterion == -1:
            denom = area_a[i] + area_b[j] - ov
        elif criterion == 0:
            denom = area_a[i]
        elif criterion == 1:
            denom = area_b[j]
        else:
            denom = 1.0
        out[i, j] = ov / max(denom, 1e-8)
    return out


def d3_box_overlap(boxes, qboxes, criterion=-1):
    """Camera-frame 3D IoU: boxes (N, 7) [x, y, z, l, h, w, ry], y = bottom.

    BEV rotated overlap in the x-z plane x y-extent intersection
    (devkit ``d3_box_overlap_kernel``).
    """
    bev_a = boxes[:, [0, 2, 3, 5, 6]]
    bev_b = qboxes[:, [0, 2, 3, 5, 6]]
    n, k = boxes.shape[0], qboxes.shape[0]
    out = np.zeros((n, k), dtype=np.float32)
    if n == 0 or k == 0:
        return out
    ca, cb = _corners2d(bev_a), _corners2d(bev_b)
    amin, amax = ca.min(axis=1), ca.max(axis=1)
    bmin, bmax = cb.min(axis=1), cb.max(axis=1)
    maybe = ~((amax[:, None, 0] < bmin[None, :, 0]) |
              (bmax[None, :, 0] < amin[:, None, 0]) |
              (amax[:, None, 1] < bmin[None, :, 1]) |
              (bmax[None, :, 1] < amin[:, None, 1]))
    for i, j in zip(*np.nonzero(maybe)):
        ov = _overlap_pair(ca[i], cb[j])
        if ov <= 0:
            continue
        # y down; location y is the box bottom (max y)
        iw = (min(boxes[i, 1], qboxes[j, 1]) -
              max(boxes[i, 1] - boxes[i, 4], qboxes[j, 1] - qboxes[j, 4]))
        if iw <= 0:
            continue
        inter = ov * iw
        vol_a = boxes[i, 3] * boxes[i, 4] * boxes[i, 5]
        vol_b = qboxes[j, 3] * qboxes[j, 4] * qboxes[j, 5]
        if criterion == -1:
            denom = vol_a + vol_b - inter
        elif criterion == 0:
            denom = vol_a
        else:
            denom = vol_b
        out[i, j] = inter / max(denom, 1e-8)
    return out


def image_box_overlap(boxes, qboxes, criterion=-1):
    """2D image bbox IoU (x1, y1, x2, y2)."""
    n, k = boxes.shape[0], qboxes.shape[0]
    out = np.zeros((n, k), dtype=np.float32)
    if n == 0 or k == 0:
        return out
    lt = np.maximum(boxes[:, None, :2], qboxes[None, :, :2])
    rb = np.minimum(boxes[:, None, 2:4], qboxes[None, :, 2:4])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))[:, None]
    area_b = ((qboxes[:, 2] - qboxes[:, 0]) * (qboxes[:, 3] - qboxes[:, 1]))[None, :]
    if criterion == -1:
        denom = area_a + area_b - inter
    elif criterion == 0:
        denom = np.broadcast_to(area_a, inter.shape)
    else:
        denom = np.broadcast_to(area_b, inter.shape)
    return (inter / np.clip(denom, 1e-8, None)).astype(np.float32)
