"""Brute-force numpy reference implementations of the CUDA kernel semantics.

These are the *spec* for the TPU ops (SURVEY.md §2.1 documents each kernel's
behavior with file:line citations into the reference repo). Written
independently as straightforward scalar loops — slow but obviously correct.
"""
import numpy as np


def fps_ref(xyz, npoint):
    """sampling_gpu.cu:93-209 — seed idx 0, min-dist update, argmax."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int32)
    for b in range(B):
        dist = np.full(N, 1e10, dtype=np.float64)
        last = 0
        out[b, 0] = 0
        for j in range(1, npoint):
            d2 = np.sum((xyz[b] - xyz[b, last]) ** 2, axis=-1)
            dist = np.minimum(dist, d2)
            last = int(np.argmax(dist))
            out[b, j] = last
    return out


def fps_with_dist_ref(dmat, npoint):
    """sampling_gpu.cu:256-374 — same loop over a precomputed matrix."""
    B, N, _ = dmat.shape
    out = np.zeros((B, npoint), dtype=np.int32)
    for b in range(B):
        dist = np.full(N, 1e10, dtype=np.float64)
        last = 0
        for j in range(1, npoint):
            dist = np.minimum(dist, dmat[b, last])
            last = int(np.argmax(dist))
            out[b, j] = last
    return out


def ball_query_ref(radius, nsample, xyz, new_xyz):
    """ball_query_gpu.cu:9-45 — first-k hits in index order, first-hit pad,
    empty neighborhoods leave the zeroed buffer."""
    B, M, _ = new_xyz.shape
    N = xyz.shape[1]
    idx = np.zeros((B, M, nsample), dtype=np.int32)
    r2 = np.float32(radius) * np.float32(radius)
    for b in range(B):
        for m in range(M):
            cnt = 0
            for k in range(N):
                d = (new_xyz[b, m] - xyz[b, k]).astype(np.float32)
                d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
                if d2 < r2:
                    if cnt == 0:
                        idx[b, m, :] = k
                    idx[b, m, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return idx


def ball_query_dilated_ref(min_radius, max_radius, nsample, xyz, new_xyz):
    """ball_query_gpu.cu:70-137 — annulus + exact-center always-hit."""
    B, M, _ = new_xyz.shape
    N = xyz.shape[1]
    idx = np.zeros((B, M, nsample), dtype=np.int32)
    r2max = np.float32(max_radius) * np.float32(max_radius)
    r2min = np.float32(min_radius) * np.float32(min_radius)
    for b in range(B):
        for m in range(M):
            cnt = 0
            for k in range(N):
                d = (new_xyz[b, m] - xyz[b, k]).astype(np.float32)
                d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
                if d2 == 0 or (r2min <= d2 < r2max):
                    if cnt == 0:
                        idx[b, m, :] = k
                    idx[b, m, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return idx


def three_nn_ref(unknown, known):
    """interpolate_gpu.cu:16-63 — 3 smallest squared distances + indices."""
    B, N, _ = unknown.shape
    dist = np.zeros((B, N, 3))
    idx = np.zeros((B, N, 3), dtype=np.int32)
    for b in range(B):
        d2 = ((unknown[b][:, None, :] - known[b][None, :, :]) ** 2).sum(-1)
        order = np.argsort(d2, axis=-1, kind='stable')[:, :3]
        idx[b] = order
        dist[b] = np.take_along_axis(d2, order, axis=-1)
    return dist, idx


def points_in_boxes_ref(points, boxes):
    """roiaware_pool3d_kernel.cu:313-339 — first containing box or -1.

    Box: [x, y, z, dx, dy, dz, heading], (x,y,z) center. z strict <=, xy with
    1e-5 margin. Zero-size (padding) boxes are skipped.
    """
    B, N, _ = points.shape
    T = boxes.shape[1]
    out = np.full((B, N), -1, dtype=np.int32)
    for b in range(B):
        for n in range(N):
            for t in range(T):
                cx, cy, cz, dx, dy, dz, rz = boxes[b, t, :7]
                if dx <= 0:
                    continue
                x, y, z = points[b, n]
                if abs(z - cz) > dz / 2.0:
                    continue
                cosa, sina = np.cos(-rz), np.sin(-rz)
                lx = (x - cx) * cosa - (y - cy) * sina
                ly = (x - cx) * sina + (y - cy) * cosa
                if abs(lx) < dx / 2.0 + 1e-5 and abs(ly) < dy / 2.0 + 1e-5:
                    out[b, n] = t
                    break
    return out


def _bev_poly(box):
    cx, cy, _, dx, dy, _, rz = box[:7]
    template = np.array([[0.5, 0.5], [-0.5, 0.5], [-0.5, -0.5], [0.5, -0.5]])
    local = template * np.array([dx, dy])
    c, s = np.cos(rz), np.sin(rz)
    rot = np.stack([local[:, 0] * c - local[:, 1] * s,
                    local[:, 0] * s + local[:, 1] * c], axis=-1)
    return rot + np.array([cx, cy])


def _cross2d(a, b):
    return a[0] * b[1] - a[1] * b[0]


def _poly_clip(poly, e1, e2):
    """Clip polygon (list of 2d pts) by the half-plane left of e1->e2."""
    out = []
    n = len(poly)
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        fc = _cross2d(e2 - e1, cur - e1)
        fn = _cross2d(e2 - e1, nxt - e1)
        if fc >= 0:
            out.append(cur)
        if (fc >= 0) != (fn >= 0):
            s = fc / (fc - fn)
            out.append(cur + s * (nxt - cur))
    return out


def rotated_overlap_ref(box_a, box_b):
    """Exact rotated BEV overlap via scalar Sutherland-Hodgman."""
    pa = list(_bev_poly(box_a))
    pb = _bev_poly(box_b)
    poly = pa
    for k in range(4):
        if not poly:
            return 0.0
        poly = _poly_clip(poly, pb[k], pb[(k + 1) % 4])
    if len(poly) < 3:
        return 0.0
    poly = np.asarray(poly)
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def iou3d_ref(boxes_a, boxes_b):
    n, m = len(boxes_a), len(boxes_b)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            ov = rotated_overlap_ref(boxes_a[i], boxes_b[j])
            za1, za2 = boxes_a[i, 2] - boxes_a[i, 5] / 2, boxes_a[i, 2] + boxes_a[i, 5] / 2
            zb1, zb2 = boxes_b[j, 2] - boxes_b[j, 5] / 2, boxes_b[j, 2] + boxes_b[j, 5] / 2
            h = max(0.0, min(za2, zb2) - max(za1, zb1))
            inter = ov * h
            va = boxes_a[i, 3] * boxes_a[i, 4] * boxes_a[i, 5]
            vb = boxes_b[j, 3] * boxes_b[j, 4] * boxes_b[j, 5]
            out[i, j] = inter / max(va + vb - inter, 1e-6)
    return out


def nms_ref(boxes, scores, thresh):
    """Greedy rotated BEV NMS over score-sorted boxes."""
    order = np.argsort(-scores, kind='stable')
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for ii, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order[ii + 1:]:
            if suppressed[j]:
                continue
            ov = rotated_overlap_ref(boxes[i], boxes[j])
            area_i = boxes[i, 3] * boxes[i, 4]
            area_j = boxes[j, 3] * boxes[j, 4]
            iou = ov / max(area_i + area_j - ov, 1e-6)
            if iou > thresh:
                suppressed[j] = True
    return np.asarray(keep, dtype=np.int32)
