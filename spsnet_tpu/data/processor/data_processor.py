"""Processor queue producing FIXED-SHAPE point tensors.

Parity: ``pcdet/datasets/processor/data_processor.py``. The near/far
``sample_points`` rule (keep all far >=40 m points, random-choice near ones to
reach exactly N, ``:218-253``) is what makes point detectors batchable at a
static shape — the cornerstone of the TPU design.

Intentionally fixed here (SURVEY.md §2.8): the reference masks ``fake_labels``
with ``sem_labels[mask]`` in ``mask_points_and_boxes_outside_range``
(``data_processor.py:87-88``, copy-paste bug) — we mask with the point mask.
"""
from __future__ import annotations

from functools import partial

import numpy as np

from ...utils.box_utils import mask_boxes_outside_range_numpy


def _points_in_boxes_exact(xyz, boxes):
    """(n, 3) x (T, 7) -> (T, n) bool, exact rotated test."""
    shift = xyz[None, :, :3] - boxes[:, None, :3]
    cosa = np.cos(-boxes[:, 6])[:, None]
    sina = np.sin(-boxes[:, 6])[:, None]
    lx = shift[..., 0] * cosa - shift[..., 1] * sina
    ly = shift[..., 0] * sina + shift[..., 1] * cosa
    return ((np.abs(shift[..., 2]) <= boxes[:, None, 5] / 2.0) &
            (np.abs(lx) < boxes[:, None, 3] / 2.0 + 1e-5) &
            (np.abs(ly) < boxes[:, None, 4] / 2.0 + 1e-5))


def points_in_boxes_cpu_np(points, boxes):
    """(N, 3) x (T, 7) -> (T, N) 0/1 indicator (parity:
    ``points_in_boxes_cpu``, ``roiaware_pool3d_kernel.cu`` CPU path).

    Fast path: the native C++ kernel (``native/hostpipe_native.cpp``),
    bit-identical to the numpy path below by construction (same float32
    op order, trig precomputed by numpy, -ffp-contract=off) and verified
    by ``tests/test_native_hostpipe.py``.

    Numpy fallback is two-phase for host speed: a coarse union-of-AABBs
    candidate mask (cheap compares, no trig/broadcast float math over the
    full N), then the exact rotated test only on candidate points. Object
    boxes cover a small fraction of a 120k-point scan, so this is ~5-10x
    the naive (T, N) broadcast on real frames; results are bit-identical.
    """
    if boxes.shape[0] == 0:
        return np.zeros((0, points.shape[0]), dtype=np.int32)
    from ...native.hostpipe import points_in_boxes_native
    out = points_in_boxes_native(points, boxes)
    if out is not None:
        return out
    xyz = points[:, :3]
    half_diag = 0.5 * np.hypot(boxes[:, 3], boxes[:, 4]) + 1e-4
    lo_xy = boxes[:, 0:2] - half_diag[:, None]
    hi_xy = boxes[:, 0:2] + half_diag[:, None]
    lo_z = boxes[:, 2] - boxes[:, 5] / 2.0 - 1e-4
    hi_z = boxes[:, 2] + boxes[:, 5] / 2.0 + 1e-4
    cand = np.zeros(xyz.shape[0], dtype=bool)
    for t in range(boxes.shape[0]):
        cand |= ((xyz[:, 0] >= lo_xy[t, 0]) & (xyz[:, 0] <= hi_xy[t, 0]) &
                 (xyz[:, 1] >= lo_xy[t, 1]) & (xyz[:, 1] <= hi_xy[t, 1]) &
                 (xyz[:, 2] >= lo_z[t]) & (xyz[:, 2] <= hi_z[t]))
    idx = np.flatnonzero(cand)
    out = np.zeros((boxes.shape[0], points.shape[0]), dtype=np.int32)
    if idx.size:
        out[:, idx] = _points_in_boxes_exact(xyz[idx], boxes)
    return out


def points_first_box_np(points, boxes):
    """(N, 3) x (T, 7) -> (N,) int32: index of the lowest-index box
    containing each point, -1 if none. Equals
    ``argmax(points_in_boxes_cpu_np(...), axis=0)`` masked by any-hit, but
    the native path never materializes the (T, N) indicator."""
    if boxes.shape[0] == 0:
        return np.full(points.shape[0], -1, dtype=np.int32)
    from ...native.hostpipe import points_first_box_native
    out = points_first_box_native(points, boxes)
    if out is not None:
        return out
    indicator = points_in_boxes_cpu_np(points, boxes)
    hit = indicator.sum(axis=0) > 0
    first = indicator.argmax(axis=0).astype(np.int32)
    return np.where(hit, first, np.int32(-1)).astype(np.int32)


class DataProcessor:
    def __init__(self, processor_configs, point_cloud_range, training,
                 num_point_features=4):
        self.point_cloud_range = np.asarray(point_cloud_range, dtype=np.float32)
        self.training = training
        self.num_point_features = num_point_features
        self.mode = 'train' if training else 'test'
        self.grid_size = self.voxel_size = None
        self.data_processor_queue = []
        for cur_cfg in processor_configs:
            cur_processor = getattr(self, cur_cfg.NAME)(config=cur_cfg)
            self.data_processor_queue.append(cur_processor)

    def mask_points_and_boxes_outside_range(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.mask_points_and_boxes_outside_range, config=config)
        points = data_dict.get('points', None)
        if points is not None:
            pcr = self.point_cloud_range
            from ...native.hostpipe import range_xy_mask_native
            mask = range_xy_mask_native(points, pcr)
            if mask is None:
                mask = ((points[:, 0] >= pcr[0]) & (points[:, 0] <= pcr[3]) &
                        (points[:, 1] >= pcr[1]) & (points[:, 1] <= pcr[4]))
            data_dict['points'] = points[mask]
            for key in ('sem_labels', 'fake_labels'):
                if data_dict.get(key, None) is not None:
                    data_dict[key] = data_dict[key][mask]
        if data_dict.get('gt_boxes', None) is not None and \
                config.get('REMOVE_OUTSIDE_BOXES', False) and self.training:
            box_mask = mask_boxes_outside_range_numpy(
                data_dict['gt_boxes'], self.point_cloud_range,
                min_num_corners=config.get('min_num_corners', 1))
            data_dict['gt_boxes'] = data_dict['gt_boxes'][box_mask]
        return data_dict

    def shuffle_points(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.shuffle_points, config=config)
        if config.SHUFFLE_ENABLED[self.mode]:
            idx = np.random.permutation(data_dict['points'].shape[0])
            data_dict['points'] = data_dict['points'][idx]
            for key in ('sem_labels', 'fake_labels'):
                if data_dict.get(key, None) is not None:
                    data_dict[key] = data_dict[key][idx]
        return data_dict

    def add_fake_sem_label(self, data_dict=None, config=None):
        """Per-point class id from gt boxes (parity: ``data_processor.py:127-143``)."""
        if data_dict is None:
            return partial(self.add_fake_sem_label, config=config)
        points = data_dict['points']
        gt_boxes = data_dict.get('gt_boxes', np.zeros((0, 8), dtype=np.float32))
        fake_labels = np.zeros(points.shape[0], dtype=np.int32)
        if gt_boxes.shape[0] > 0:
            box_idx = points_first_box_np(points[:, :3], gt_boxes[:, :7])
            box_mask = box_idx >= 0
            fake_labels[box_mask] = gt_boxes[box_idx[box_mask], -1].astype(np.int32)
        data_dict['fake_labels'] = fake_labels
        return data_dict

    def sample_points(self, data_dict=None, config=None):
        """Near/far-aware fixed-N sampling (parity: ``data_processor.py:218-253``)."""
        if data_dict is None:
            return partial(self.sample_points, config=config)
        num_points = config.NUM_POINTS[self.mode]
        if num_points == -1:
            return data_dict
        points = data_dict['points']
        if num_points < len(points):
            from ...native.hostpipe import near_mask_native
            near_mask = near_mask_native(points, 40.0)
            if near_mask is None:
                near_mask = np.linalg.norm(points[:, 0:3], axis=1) < 40.0
            far_idxs = np.where(~near_mask)[0]
            near_idxs = np.where(near_mask)[0]
            if num_points > len(far_idxs):
                near_choice = np.random.choice(
                    near_idxs, num_points - len(far_idxs), replace=False)
                choice = np.concatenate((near_choice, far_idxs)) \
                    if len(far_idxs) > 0 else near_choice
            else:
                choice = np.random.choice(
                    np.arange(len(points), dtype=np.int64), num_points,
                    replace=False)
            np.random.shuffle(choice)
        else:
            choice = np.arange(0, len(points), dtype=np.int64)
            if num_points > len(points):
                # pad by resampling (keeps fixed shape even for sparse frames)
                extra = np.random.choice(choice, num_points - len(points),
                                         replace=True) if len(points) > 0 \
                    else np.zeros(num_points, dtype=np.int64)
                choice = np.concatenate((choice, extra))
            np.random.shuffle(choice)
        data_dict['points'] = points[choice] if len(points) > 0 \
            else np.zeros((num_points, points.shape[1]), dtype=points.dtype)
        for key in ('sem_labels', 'fake_labels'):
            if data_dict.get(key, None) is not None and len(points) > 0:
                data_dict[key] = data_dict[key][choice]
        return data_dict

    def transform_points_to_voxels_placeholder(self, data_dict=None,
                                               config=None):
        """Grid-size bookkeeping only (parity: ``data_processor.py:117-125``)."""
        if data_dict is None:
            grid_size = (self.point_cloud_range[3:6] -
                         self.point_cloud_range[0:3]) / np.asarray(
                             config.VOXEL_SIZE)
            self.grid_size = np.round(grid_size).astype(np.int64)
            self.voxel_size = config.VOXEL_SIZE
            return partial(self.transform_points_to_voxels_placeholder,
                           config=config)
        return data_dict

    def _voxel_coords(self, points, voxel_size):
        vs = np.asarray(voxel_size, dtype=np.float32)
        coords = ((points[:, :3] - self.point_cloud_range[:3]) / vs).astype(
            np.int64)
        grid = np.maximum(np.round(
            (self.point_cloud_range[3:6] - self.point_cloud_range[0:3]) / vs
        ).astype(np.int64), 1)
        coords = np.clip(coords, 0, grid - 1)
        return coords, grid

    def sample_points_by_voxels(self, data_dict=None, config=None):
        """Voxel-dedup then fixed-N sample — the Waymo-scale funnel
        (parity: ``data_processor.py:176-216``): voxelize, keep one point per
        voxel (the first), then the near/far fixed-N rule."""
        if data_dict is None:
            return partial(self.sample_points_by_voxels, config=config)
        points = data_dict['points']
        if len(points):
            coords, grid = self._voxel_coords(points, config.VOXEL_SIZE)
            keys = (coords[:, 0] * grid[1] + coords[:, 1]) * grid[2] \
                + coords[:, 2]
            _, first_idx = np.unique(keys, return_index=True)
            keep = np.sort(first_idx)
            data_dict['points'] = points[keep]
            for key in ('sem_labels', 'fake_labels'):
                if data_dict.get(key, None) is not None:
                    data_dict[key] = data_dict[key][keep]
        return self.sample_points(data_dict=data_dict, config=config)

    def transform_points_to_voxels(self, data_dict=None, config=None):
        """Fixed-shape voxelization (parity: ``data_processor.py:146-174``,
        which wraps spconv's VoxelGenerator): points -> zero-padded
        (MAX_NUMBER_OF_VOXELS, MAX_POINTS_PER_VOXEL, C) voxels + (V, 3) zyx
        coords + per-voxel counts. Pure numpy hash-bucket implementation."""
        if data_dict is None:
            vs = np.asarray(config.VOXEL_SIZE)
            grid_size = (self.point_cloud_range[3:6] -
                         self.point_cloud_range[0:3]) / vs
            self.grid_size = np.round(grid_size).astype(np.int64)
            self.voxel_size = config.VOXEL_SIZE
            return partial(self.transform_points_to_voxels, config=config)

        points = data_dict['points']
        max_voxels = int(config.MAX_NUMBER_OF_VOXELS[self.mode]) \
            if isinstance(config.MAX_NUMBER_OF_VOXELS, dict) \
            else int(config.MAX_NUMBER_OF_VOXELS)
        max_pts = int(config.MAX_POINTS_PER_VOXEL)
        vs = np.asarray(config.VOXEL_SIZE, dtype=np.float32)
        grid = np.round((self.point_cloud_range[3:6] -
                         self.point_cloud_range[0:3]) / vs).astype(np.int64)

        coords = np.floor(
            (points[:, :3] - self.point_cloud_range[:3]) / vs).astype(np.int64)
        in_range = ((coords >= 0) & (coords < grid)).all(axis=1)
        points_v = points[in_range]
        coords = coords[in_range]
        keys = (coords[:, 2] * grid[1] + coords[:, 1]) * grid[0] + coords[:, 0]
        order = np.argsort(keys, kind='stable')
        keys_s, points_s, coords_s = keys[order], points_v[order], coords[order]
        uniq, starts, counts = np.unique(keys_s, return_index=True,
                                         return_counts=True)
        n_voxels = min(len(uniq), max_voxels)

        voxels = np.zeros((max_voxels, max_pts, points.shape[1]),
                          dtype=np.float32)
        voxel_coords = np.zeros((max_voxels, 3), dtype=np.int64)
        voxel_num_points = np.zeros((max_voxels,), dtype=np.int32)
        # vectorized fill: per-point (voxel id, slot-in-voxel)
        vid = np.searchsorted(uniq, keys_s)
        slot = np.arange(len(keys_s)) - starts[vid]
        ok = (vid < n_voxels) & (slot < max_pts)
        voxels[vid[ok], slot[ok]] = points_s[ok]
        voxel_coords[:n_voxels] = coords_s[starts[:n_voxels]][:, [2, 1, 0]]
        voxel_num_points[:n_voxels] = np.minimum(counts[:n_voxels], max_pts)

        data_dict['voxels'] = voxels
        data_dict['voxel_coords'] = voxel_coords
        data_dict['voxel_num_points'] = voxel_num_points
        data_dict['voxel_valid'] = (np.arange(max_voxels) < n_voxels)
        return data_dict

    def calculate_grid_size(self, data_dict=None, config=None):
        """Camera-only configs: record grid/voxel size without voxelizing
        (parity: ``data_processor.py:255-261``)."""
        if data_dict is None:
            grid = (self.point_cloud_range[3:6] - self.point_cloud_range[0:3]) \
                / np.array(config.VOXEL_SIZE)
            self.grid_size = np.round(grid).astype(np.int64)
            self.voxel_size = config.VOXEL_SIZE
            from functools import partial
            return partial(self.calculate_grid_size, config=config)
        return data_dict

    def downsample_depth_map(self, data_dict=None, config=None):
        """Block-mean downsample of the depth map (parity:
        ``data_processor.py:263-272`` — skimage.downscale_local_mean without
        the skimage dependency)."""
        if data_dict is None:
            from functools import partial
            self.depth_downsample_factor = int(config.DOWNSAMPLE_FACTOR)
            return partial(self.downsample_depth_map, config=config)
        f = self.depth_downsample_factor
        d = data_dict['depth_maps']
        H, W = d.shape
        ph, pw = (-H) % f, (-W) % f
        if ph or pw:                                   # zero-pad like skimage
            d = np.pad(d, ((0, ph), (0, pw)))
        data_dict['depth_maps'] = d.reshape(
            d.shape[0] // f, f, d.shape[1] // f, f).mean(axis=(1, 3))
        return data_dict

    def build_sparse_conv_plan(self, data_dict=None, config=None):
        """Host-side sparse-conv planning for the voxel backbones (see
        ``sparse_plan.py``); run after ``transform_points_to_voxels``."""
        if data_dict is None:
            return partial(self.build_sparse_conv_plan, config=config)
        from .sparse_plan import build_sparse_plan
        vs = np.asarray(self.voxel_size)
        grid_xyz = np.round((self.point_cloud_range[3:6] -
                             self.point_cloud_range[0:3]) / vs).astype(np.int64)
        # reference sparse z-shape padding: grid[::-1] + [1, 0, 0]
        # (``spconv_backbone.py:76``) — must match the detector builder's
        # ``final_grid_zyx`` derivation
        grid_zyx = grid_xyz[::-1].copy()
        grid_zyx[0] += 1
        plan = build_sparse_plan(
            data_dict['voxel_coords'], data_dict['voxel_valid'], grid_zyx,
            max_voxels_per_level=int(config.get(
                'MAX_VOXELS_PER_LEVEL', data_dict['voxel_coords'].shape[0])))
        plan.pop('final_grid')
        data_dict.update(plan)
        return data_dict

    def forward(self, data_dict):
        for cur_processor in self.data_processor_queue:
            data_dict = cur_processor(data_dict=data_dict)
        return data_dict
