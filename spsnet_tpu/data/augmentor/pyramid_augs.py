"""SE-SSD pyramid-level local augmentations (host-side numpy).

Rebuild of the pyramid family in ``datasets/augmentor/augmentor_utils.py``:
``get_pyramids`` (:569), ``points_in_pyramids_mask`` (:602),
``local_pyramid_dropout`` (:610), ``local_pyramid_sparsify`` (:626),
``local_pyramid_swap`` (:663). Each gt box is split into 6 frustums
("pyramids", apex = box center, base = one face); a random frustum per box
is dropped, sparsified to a fixed point count, or swapped point-for-point
(in barycentric face coordinates, with intensity min/max remapping) with the
same-index frustum of another box.

Runs in the host data pipeline before fixed-shape padding, so ragged numpy
is fine here. Point containment uses scipy's Delaunay like the reference's
``box_utils.in_hull``.
"""
from __future__ import annotations

import numpy as np

_PYRAMID_ORDERS = np.array([
    [0, 1, 5, 4],
    [4, 5, 6, 7],
    [7, 6, 2, 3],
    [3, 2, 1, 0],
    [1, 2, 6, 5],
    [0, 4, 7, 3],
])

_CORNER_TEMPLATE = np.array([
    [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
    [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
], dtype=np.float32) / 2.0


def _corners_3d(boxes):
    """(N, 7) -> (N, 8, 3), reference corner order (``box_utils.py:28-53``)."""
    corners = boxes[:, None, 3:6] * _CORNER_TEMPLATE[None]
    c, s = np.cos(boxes[:, 6]), np.sin(boxes[:, 6])
    x = corners[..., 0] * c[:, None] - corners[..., 1] * s[:, None]
    y = corners[..., 0] * s[:, None] + corners[..., 1] * c[:, None]
    out = np.stack([x, y, corners[..., 2]], axis=-1)
    return out + boxes[:, None, 0:3]


def get_pyramids(boxes):
    """(N, 7+) -> (N, 6, 15): per face, [center, c0, c1, c2, c3] flattened."""
    corners = _corners_3d(boxes[:, :7]).reshape(-1, 24)
    pyr = []
    for order in _PYRAMID_ORDERS:
        p = np.concatenate(
            [boxes[:, 0:3]] +
            [corners[:, 3 * o: 3 * o + 3] for o in order], axis=1)
        pyr.append(p[:, None, :])
    return np.concatenate(pyr, axis=1)


def _in_hull(points, hull_pts):
    from scipy.spatial import Delaunay
    import scipy.spatial.qhull
    try:
        flag = Delaunay(hull_pts).find_simplex(points) >= 0
    except scipy.spatial.qhull.QhullError:
        flag = np.zeros(points.shape[0], dtype=bool)
    return flag


def points_in_pyramids_mask(points, pyramids):
    """(P, 3+) x (K, 5, 3) -> (P, K) bool."""
    pyramids = pyramids.reshape(-1, 5, 3)
    flags = np.zeros((points.shape[0], pyramids.shape[0]), dtype=bool)
    for i, pyr in enumerate(pyramids):
        flags[:, i] = _in_hull(points[:, 0:3], pyr)
    return flags


def _one_hot(x, num_class):
    oh = np.zeros((len(x), num_class))
    oh[range(len(x)), x] = 1
    return oh


def local_pyramid_dropout(gt_boxes, points, dropout_prob, pyramids=None):
    """Drop all points inside one random frustum of each selected box."""
    if pyramids is None:
        pyramids = get_pyramids(gt_boxes).reshape([-1, 6, 5, 3])
    drop_idx = np.random.randint(0, 6, (pyramids.shape[0],))
    drop_oh = _one_hot(drop_idx, 6)
    drop_box = np.random.uniform(0, 1, (pyramids.shape[0],)) <= dropout_prob
    if drop_box.sum() != 0:
        drop_mask = (np.tile(drop_box[:, None], [1, 6]) * drop_oh) > 0
        masks = points_in_pyramids_mask(points, pyramids[drop_mask])
        points = points[np.logical_not(masks.any(-1))]
    pyramids = pyramids[np.logical_not(drop_box)]
    return gt_boxes, points, pyramids


def local_pyramid_sparsify(gt_boxes, points, prob, max_num_pts,
                           pyramids=None):
    """Subsample selected frustums down to ``max_num_pts`` points."""
    if pyramids is None:
        pyramids = get_pyramids(gt_boxes).reshape([-1, 6, 5, 3])
    if pyramids.shape[0] > 0:
        sp_idx = np.random.randint(0, 6, (pyramids.shape[0],))
        sp_oh = _one_hot(sp_idx, 6)
        sp_box = np.random.uniform(0, 1, (pyramids.shape[0],)) <= prob
        sp_mask = (np.tile(sp_box[:, None], [1, 6]) * sp_oh) > 0
        sampled = pyramids[sp_mask]
        masks = points_in_pyramids_mask(points, sampled)
        nums = masks.sum(0)
        keep_pyr = nums > max_num_pts          # only dense frustums sparsify
        sparsify = sampled[keep_pyr]
        if sparsify.shape[0] > 0:
            pm = masks[:, keep_pyr]
            remain = points[np.logical_not(pm.any(-1))]
            chunks = []
            for i in range(pm.shape[1]):
                src = points[pm[:, i]]
                sel = np.random.choice(src.shape[0], size=max_num_pts,
                                       replace=False)
                chunks.append(src[sel])
            points = np.concatenate([remain] + chunks, axis=0)
        pyramids = pyramids[np.logical_not(sp_box)]
    return gt_boxes, points, pyramids


def _points_ratio(points, pyr):
    """Barycentric-ish coords of points inside a frustum (swap transform)."""
    surface_center = (pyr[3:6] + pyr[6:9] + pyr[9:12] + pyr[12:]) / 4.0
    v0 = pyr[6:9] - pyr[3:6]
    v1 = pyr[12:] - pyr[3:6]
    v2 = pyr[0:3] - surface_center
    alphas = ((points[:, 0:3] - pyr[3:6]) * v0).sum(-1) / np.power(v0, 2).sum()
    betas = ((points[:, 0:3] - pyr[3:6]) * v1).sum(-1) / np.power(v1, 2).sum()
    gammas = ((points[:, 0:3] - surface_center) * v2).sum(-1) \
        / np.power(v2, 2).sum()
    return alphas, betas, gammas


def _recover_points(ratio, pyr):
    alphas, betas, gammas = ratio
    surface_center = (pyr[3:6] + pyr[6:9] + pyr[9:12] + pyr[12:]) / 4.0
    v0 = pyr[6:9] - pyr[3:6]
    v1 = pyr[12:] - pyr[3:6]
    v2 = pyr[0:3] - surface_center
    return (alphas[:, None] * v0 + betas[:, None] * v1) + pyr[3:6] \
        + gammas[:, None] * v2


def local_pyramid_swap(gt_boxes, points, prob, max_num_pts, pyramids=None):
    """Exchange point distributions between same-face frustums of two boxes
    (position via face coordinates, intensity via min/max remap)."""
    if pyramids is None:
        pyramids = get_pyramids(gt_boxes).reshape([-1, 6, 5, 3])
    swap_box = np.random.uniform(0, 1, (pyramids.shape[0],)) <= prob
    if swap_box.sum() == 0:
        return gt_boxes, points
    masks = points_in_pyramids_mask(points, pyramids)
    nums = masks.sum(0).reshape(pyramids.shape[0], -1)       # (N, 6)
    dense = nums > max_num_pts
    selected = dense * swap_box[:, None]
    if selected.sum() == 0:
        return gt_boxes, points

    idx_i, idx_j = np.nonzero(selected)
    sel_j = [np.random.choice(idx_j[idx_i == i])
             if e and (idx_i == i).any() else 0
             for i, e in enumerate(swap_box)]
    sel_mask = selected * _one_hot(sel_j, 6) == 1
    to_swap = pyramids[sel_mask]

    ii, jj = np.nonzero(sel_mask)
    dense[sel_mask] = False
    partner_i = np.array([
        np.random.choice(np.where(dense[:, j])[0])
        if np.where(dense[:, j])[0].shape[0] > 0 else ii[i]
        for i, j in enumerate(jj.tolist())])
    partners = pyramids[partner_i.astype(np.int32), jj.astype(np.int32)]

    pair = np.concatenate([to_swap, partners], axis=0)
    pm = points_in_pyramids_mask(points, pair)
    remain = points[np.logical_not(pm.any(-1))]

    res = []
    K = partners.shape[0]
    for i in range(K):
        a_pyr = to_swap[i].reshape(15)
        b_pyr = partners[i].reshape(15)
        a_pts = points[pm[:, i]]
        b_pts = points[pm[:, i + K]]

        def _int_ratio(p):
            lo, hi = p[:, -1:].min(), p[:, -1:].max()
            return (p[:, -1:] - lo) / np.clip(hi - lo, 1e-6, 1), lo, hi

        a_ir, a_lo, a_hi = _int_ratio(a_pts)
        b_ir, b_lo, b_hi = _int_ratio(b_pts)
        new_a = _recover_points(_points_ratio(b_pts, b_pyr), a_pyr)
        new_b = _recover_points(_points_ratio(a_pts, a_pyr), b_pyr)
        new_a = np.concatenate([new_a, b_ir * (a_hi - a_lo) + a_lo], axis=1)
        new_b = np.concatenate([new_b, a_ir * (b_hi - b_lo) + b_lo], axis=1)
        res.append(new_a)
        res.append(new_b)
    points = np.concatenate([remain, np.concatenate(res, axis=0)], axis=0)
    return gt_boxes, points


def random_local_pyramid_aug(gt_boxes, points, drop_prob, sparsify_prob,
                             sparsify_max_num, swap_prob, swap_max_num):
    """Full SE-SSD chain (``data_augmentor.random_local_pyramid_aug``)."""
    gt_boxes, points, pyramids = local_pyramid_dropout(gt_boxes, points,
                                                       drop_prob)
    gt_boxes, points, pyramids = local_pyramid_sparsify(
        gt_boxes, points, sparsify_prob, sparsify_max_num, pyramids)
    gt_boxes, points = local_pyramid_swap(gt_boxes, points, swap_prob,
                                          swap_max_num, pyramids)
    return gt_boxes, points
