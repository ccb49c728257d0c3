"""Host-side rotated BEV IoU (numpy Sutherland-Hodgman) for the gt sampler.

Equivalent of ``iou3d_nms_utils.boxes_bev_iou_cpu`` / ``iou3d_cpu.cpp``; the
scene has at most ~100 boxes so a scalar-free vectorized-ish numpy version is
plenty fast on the host.
"""
from __future__ import annotations

import numpy as np


def _bev_corners_np(boxes):
    dx, dy = boxes[:, 3], boxes[:, 4]
    template = np.array([[0.5, 0.5], [-0.5, 0.5], [-0.5, -0.5], [0.5, -0.5]])
    local = template[None, :, :] * np.stack([dx, dy], axis=-1)[:, None, :]
    c, s = np.cos(boxes[:, 6]), np.sin(boxes[:, 6])
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
            s = fc / (fc - fn)
            out.append(cur + s * (nxt - cur))
    return out


def _overlap(ca, cb):
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


def boxes_bev_iou_cpu(boxes_a, boxes_b):
    """(N, 7) x (M, 7) -> (N, M) rotated BEV IoU.

    Fast path: the native double-precision Sutherland-Hodgman kernel
    (``native/hostpipe_native.cpp``); differences vs this numpy fallback
    are <1e-5 (numpy evaluates the corner trig in float32)."""
    n, m = boxes_a.shape[0], boxes_b.shape[0]
    out = np.zeros((n, m), dtype=np.float32)
    if n == 0 or m == 0:
        return out
    from ...native.hostpipe import bev_iou_native
    niou = bev_iou_native(boxes_a, boxes_b)
    if niou is not None:
        return niou
    ca = _bev_corners_np(boxes_a)
    cb = _bev_corners_np(boxes_b)
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    # cheap AABB prefilter
    amin, amax = ca.min(axis=1), ca.max(axis=1)
    bmin, bmax = cb.min(axis=1), cb.max(axis=1)
    maybe = ~((amax[:, None, 0] < bmin[None, :, 0]) |
              (bmax[None, :, 0] < amin[:, None, 0]) |
              (amax[:, None, 1] < bmin[None, :, 1]) |
              (bmax[None, :, 1] < amin[:, None, 1]))
    for i, j in zip(*np.nonzero(maybe)):
        ov = _overlap(ca[i], cb[j])
        out[i, j] = ov / max(area_a[i] + area_b[j] - ov, 1e-6)
    return out
