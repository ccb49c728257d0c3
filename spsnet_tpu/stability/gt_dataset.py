"""GT-crop datasets for training the stability CVAE
(rebuild of ``stability_generate/dataset.py``: ``KittiGtDataset`` :118,
``WaymoGtDataset`` :532, ``scan_to_rv`` :24, ``occlude_aug`` :208-303).

Each sample is ONE ground-truth object crop from the ``kitti_dbinfos`` /
``waymo_dbinfos`` pickles. Augmentations:

- range-view occlusion: a random dense object is pasted in front of the
  crop in the range image and the crop's points falling inside the dense
  object's convex hull are deleted (simulating occlusion). The reference
  rasterizes the hull with cv2; we test point-in-hull membership with
  scipy's Delaunay on the same integer pixel coords — identical up to hull
  boundary pixels (documented).
- flip / scale / rotation / position-shift noise, then canonical anchor
  normalization ((x, y) / anchor diagonal, z / anchor dz, log-size
  residuals, sin-cos heading for the 8-dim CVAE input);
- resample to exactly 512 points (with replacement).

K-fold splits replicate sklearn's ``KFold(10, shuffle=True,
random_state=42)`` exactly (same RandomState permutation, same fold sizing)
without the sklearn dependency. The ``force_ratio * linear_anneal``
schedule hook (``train_utils.py:9-32``) lives on the dataset as in the
reference: the trainer anneals ``linear_anneal`` 1 -> 0 across epochs.
"""
from __future__ import annotations

import copy
import pickle
from pathlib import Path

import numpy as np

from ..data.augmentor.augmentor_utils import rotate_points_along_z_np

_RV = {'kitti': dict(width=512, height=48, fov_up=3.0, fov_down=-25.0),
       'waymo': dict(width=2650, height=64, fov_up=30.0, fov_down=-90.0)}

_ANCHOR = np.array([3.9, 1.6, 1.56], np.float64)


def scan_to_rv(scan, variant='kitti'):
    """(N, 3+) -> (N, 3) [u, v, r] range-view pixel coords
    (``dataset.py:24-58``; keeps the reference's plain arctan — valid for
    front-facing KITTI crops)."""
    p = _RV[variant]
    fov_up = p['fov_up'] / 180.0 * np.pi
    fov_down = p['fov_down'] / 180.0 * np.pi
    r = np.sqrt(scan[:, 0] ** 2 + scan[:, 1] ** 2 + scan[:, 2] ** 2)
    u = 0.5 * (1 - np.arctan(scan[:, 1] / np.clip(scan[:, 0], 1e-6, None))
               / np.pi) * p['width']
    v = (1 - (np.arcsin(scan[:, 2] / np.clip(r, 1e-6, None)) + abs(fov_down))
         / (fov_up + abs(fov_down))) * p['height']
    u = np.clip(np.floor(u), 0, p['width'] - 1)
    v = np.clip(np.floor(v), 0, p['height'] - 1)
    return np.stack([u, v, r]).T


def _in_hull(points_2d, hull_pts):
    from scipy.spatial import Delaunay, QhullError
    try:
        return Delaunay(hull_pts).find_simplex(points_2d) >= 0
    except (QhullError, ValueError):
        return np.zeros(len(points_2d), bool)


def kfold_split(n, n_splits=10, seed=42):
    """sklearn ``KFold(n_splits, shuffle=True, random_state=seed)`` exactly:
    RandomState permutation + n % k leading folds one element larger."""
    idx = np.random.RandomState(seed).permutation(n)
    sizes = np.full(n_splits, n // n_splits, int)
    sizes[:n % n_splits] += 1
    folds, start = [], 0
    for s in sizes:
        val = idx[start:start + s]
        train = np.concatenate([idx[:start], idx[start + s:]])
        folds.append((np.sort(train), np.sort(val)))
        start += s
    return folds


class KittiGtDataset:
    """GT-crop dataset over ``kitti_dbinfos_*.pkl`` (``dataset.py:118-460``)."""

    variant = 'kitti'

    def __init__(self, dataset_cfg, class_names=None, training=True,
                 root_path=None, logger=None):
        self.dataset_cfg = dataset_cfg
        self.training = training
        self.root_path = Path(root_path if root_path is not None
                              else dataset_cfg.DATA_PATH)
        self.enable_similar_type = dataset_cfg.get('ENABLE_SIMILAR_TYPE',
                                                   False)
        self.enable_flip = dataset_cfg.get('ENABLE_FLIP', True)
        self.scale_range = dataset_cfg.get('SCALE_RANGE', [0.95, 1.05])
        self.angle_rot_max = float(dataset_cfg.get('ANGLE_ROT_MAX',
                                                   np.pi / 4))
        self.pos_shift_max = float(dataset_cfg.get('POS_SHIFT_MAX', 1.0))
        self.force_ratio = float(dataset_cfg.get('FORCE_RATIO', 0.5))
        self.force_num = int(dataset_cfg.get('FORCE_NUM', 100))
        self.linear_anneal = 1.0         # trainer-annealed (1 -> 0)
        self.keep_num = int(dataset_cfg.get('KEEP_NUM', 512))
        self.occlude = dataset_cfg.get('OCCLUDE_AUG', True)
        rv = _RV[self.variant]
        self.rv_width, self.rv_height = rv['width'], rv['height']

        infos = self._load_infos()
        if 'FOLD_IDX' in dataset_cfg:
            tr, va = kfold_split(len(infos))[int(dataset_cfg.FOLD_IDX)]
            keep = tr if training else va
            self.infos = [infos[i] for i in keep]
        else:
            self.infos = infos
        # dense crops (many points) serve as occluders
        self.dense_gt_infos = [i for i in infos
                               if i.get('num_points_in_gt', 0) > 256] or infos

    def _load_infos(self):
        split = 'train' if self.training or \
            'FOLD_IDX' in self.dataset_cfg else 'val'
        path = self.root_path / f'kitti_dbinfos_{split}.pkl'
        if not path.exists():
            path = self.root_path / 'kitti_dbinfos_train.pkl'
        with open(path, 'rb') as f:
            infos = pickle.load(f)
        used = list(infos.get('Car', []))
        if self.enable_similar_type:
            used.extend(infos.get('Van', []))
        return used

    def _load_points(self, info):
        return np.fromfile(str(self.root_path / info['path']),
                           dtype=np.float32).reshape(-1, 4)

    def occlude_aug(self, info, points, max_num=9999, min_num=1,
                    max_try_time=5):
        """Paste a dense crop in front in range view; delete the sample's
        points inside its convex hull (``dataset.py:208-303``)."""
        dense_info = self.dense_gt_infos[
            np.random.choice(len(self.dense_gt_infos))]
        try:
            dense_points = self._load_points(dense_info)
        except (OSError, ValueError):
            return points
        box = np.asarray(info['box3d_lidar'], np.float64)
        dense_box = np.asarray(dense_info['box3d_lidar'], np.float64).copy()

        scan = points.copy()
        scan[:, :3] += box[:3]
        # occluder placed between the sensor and the sample
        scale = np.random.random() * 0.4 + 0.5
        new_cx = box[0] * scale
        if new_cx + dense_box[3] / 2 > box[0] - box[3] / 2:
            new_cx = box[0] - box[3] / 2 - dense_box[3] / 2
            scale = new_cx / max(box[0], 1e-6)
        new_cy = box[1] * scale
        dense_scan = dense_points.copy()
        dense_scan[:, 0] += new_cx
        dense_scan[:, 1] += new_cy
        dense_scan[:, 2] += dense_box[2]

        rv_sample = scan_to_rv(scan, self.variant)
        rv_dense = scan_to_rv(dense_scan, self.variant)
        if len(rv_dense) < 3 or len(rv_sample) == 0:
            return points

        sx0, sx1 = rv_sample[:, 0].min(), rv_sample[:, 0].max()
        sy0, sy1 = rv_sample[:, 1].min(), rv_sample[:, 1].max()
        dx0, dx1 = rv_dense[:, 0].min(), rv_dense[:, 0].max()
        dy0 = rv_dense[:, 1].min()
        x_move_min = 0.7 * sx0 + 0.3 * sx1 - dx1
        x_move_max = 0.3 * sx0 + 0.7 * sx1 - dx0
        y_move_min = 0.9 * sy0 + 0.1 * sy1 - dy0
        y_move_max = 0.5 * sy0 + 0.5 * sy1 - dy0

        try_num = 0
        while True:
            mv = np.array([
                np.random.rand() * (x_move_max - x_move_min) + x_move_min,
                np.random.rand() * (y_move_max - y_move_min) + y_move_min])
            rv_dense[:, :2] += mv
            pix = rv_dense[:, :2].astype(np.int64)
            # scipy hull containment replaces cv2.fillConvexPoly rasterizing
            occluded = _in_hull(rv_sample[:, :2].astype(np.int64), pix)
            reserved = points[~occluded]
            if min_num <= len(reserved) <= max_num:
                return reserved
            if try_num > max_try_time:
                return points
            try_num += 1

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, index):
        info = copy.deepcopy(self.infos[index])
        points = self._load_points(info)

        if self.training and self.occlude:
            rv = np.random.rand()
            if self.force_ratio * self.linear_anneal > rv and \
                    len(points) > self.force_num:
                points = self.occlude_aug(info, points,
                                          max_num=self.force_num,
                                          min_num=1, max_try_time=20)
            elif len(points) > 10:
                points = self.occlude_aug(info, points, max_num=99999,
                                          min_num=1, max_try_time=5)

        flip = False
        scale = 1.0
        angle = 0.0
        shift = np.zeros(2)
        if self.training:
            if self.enable_flip:
                flip = bool(np.random.choice([False, True]))
                if flip:
                    points[:, 1] = -points[:, 1]
            scale = np.random.uniform(*self.scale_range)
            points[:, :3] *= scale
            angle = (np.random.rand() - 0.5) * 2 * self.angle_rot_max
            shift = (np.random.rand(2) - 0.5) * 2 * self.pos_shift_max
            points = np.concatenate([
                rotate_points_along_z_np(points[:, :3], float(angle)),
                points[:, 3:]], axis=1)

        mean = points[:, :3].mean(axis=0) if len(points) else np.zeros(3)
        diag = np.sqrt(_ANCHOR[0] ** 2 + _ANCHOR[1] ** 2)
        points = points.astype(np.float64)
        points[:, 0] = (points[:, 0] - mean[0] + shift[0]) / diag
        points[:, 1] = (points[:, 1] - mean[1] + shift[1]) / diag
        points[:, 2] = (points[:, 2] - mean[2]) / _ANCHOR[2]

        if len(points):
            choice = np.random.choice(len(points), self.keep_num,
                                      replace=True)
            points = points[choice]
        else:
            points = np.zeros((self.keep_num, 4))

        out = {'points': points.astype(np.float32),        # (512, 4)
               'frame_id': info.get('image_idx', index),
               'gt_id': info.get('gt_idx', 0)}
        if 'box3d_lidar' not in info:
            return out

        box = np.asarray(info['box3d_lidar'], np.float64).copy()
        if flip:
            box[6] = -box[6]
        box[:6] *= scale
        box[0] = (-mean[0] + shift[0]) / diag
        box[1] = (-mean[1] + shift[1]) / diag
        box[2] = -mean[2] / _ANCHOR[2]
        box[3:6] = np.log(box[3:6] / _ANCHOR)
        box[6] += angle
        box7 = box.copy()
        box8 = np.concatenate([box[:6], [np.sin(box[6]), np.cos(box[6])]])
        out['gt_boxes_input'] = box8.astype(np.float32)
        out['gt_boxes'] = box7.astype(np.float32)
        return out

    @staticmethod
    def collate_batch(batch_list, _unused=False):
        out = {}
        for k in batch_list[0]:
            vals = [b[k] for b in batch_list]
            if isinstance(vals[0], np.ndarray):
                out[k] = np.stack(vals)
            else:
                out[k] = np.asarray(vals)
        out['batch_size'] = len(batch_list)
        return out


class WaymoGtDataset(KittiGtDataset):
    """Waymo variant (``dataset.py:532-1010``): same pipeline over
    ``waymo_dbinfos`` with the Waymo range-image geometry."""

    variant = 'waymo'

    def _load_infos(self):
        split = 'train' if self.training else 'val'
        path = self.root_path / f'waymo_dbinfos_{split}.pkl'
        if not path.exists():
            path = self.root_path / 'waymo_dbinfos_train.pkl'
        with open(path, 'rb') as f:
            infos = pickle.load(f)
        used = list(infos.get('Vehicle', []))
        if self.enable_similar_type:
            for k in ('Car', 'Truck'):
                used.extend(infos.get(k, []))
        return used

    def _load_points(self, info):
        pts = np.fromfile(str(self.root_path / info['path']),
                          dtype=np.float32)
        width = int(info.get('num_features', 5))
        return pts.reshape(-1, width)[:, :4]
