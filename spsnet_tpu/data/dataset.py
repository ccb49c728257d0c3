"""Dataset template + fixed-shape batch collation.

Parity: ``pcdet/datasets/dataset.py`` (``DatasetTemplate.prepare_data:102-163``
and ``collate_batch:165-234``), redesigned for the TPU: every frame leaves the
pipeline with EXACTLY ``num_sampled_points`` points (the sample_points
processor guarantees it), so collation is a plain stack — no batch-idx column,
no ragged concat. GT boxes are zero-padded to a static ``max_gt`` so the whole
batch dict has static shapes for jit.
"""
from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import numpy as np

from ..config import cfg_from_yaml_file
from .augmentor.data_augmentor import DataAugmentor
from .processor.data_processor import DataProcessor
from .processor.point_feature_encoder import PointFeatureEncoder

DEFAULT_MAX_GT = 64


class DatasetTemplate:
    def __init__(self, dataset_cfg=None, class_names=None, training=True,
                 root_path=None, logger=None):
        self.dataset_cfg = dataset_cfg
        self.training = training
        self.class_names = class_names
        self.logger = logger
        self.root_path = Path(root_path) if root_path is not None else \
            Path(dataset_cfg.DATA_PATH) if dataset_cfg else None
        if dataset_cfg is None or class_names is None:
            return
        self.point_cloud_range = np.array(
            dataset_cfg.POINT_CLOUD_RANGE, dtype=np.float32)
        self.max_gt = int(dataset_cfg.get('MAX_GT_BOXES', DEFAULT_MAX_GT))
        self.point_feature_encoder = PointFeatureEncoder(
            dataset_cfg.POINT_FEATURE_ENCODING,
            point_cloud_range=self.point_cloud_range)
        self.data_augmentor = DataAugmentor(
            self.root_path, dataset_cfg.DATA_AUGMENTOR, class_names,
            logger=logger) if self.training and dataset_cfg.get(
                'DATA_AUGMENTOR', None) else None
        self.data_processor = DataProcessor(
            dataset_cfg.DATA_PROCESSOR,
            point_cloud_range=self.point_cloud_range,
            training=self.training,
            num_point_features=self.point_feature_encoder.num_point_features)
        self._merge_all_iters_to_one_epoch = False

    @property
    def mode(self):
        return 'train' if self.training else 'test'

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index):
        raise NotImplementedError

    def prepare_data(self, data_dict):
        """Augment -> class filter -> encode -> process; re-draw on empty gt
        (parity: ``dataset.py:102-163``)."""
        if self.training:
            assert 'gt_boxes' in data_dict
            if self.data_augmentor is not None:
                data_dict = self.data_augmentor.forward(data_dict)

        if data_dict.get('gt_boxes', None) is not None:
            selected = np.array(
                [n in self.class_names for n in data_dict['gt_names']],
                dtype=bool)
            data_dict['gt_boxes'] = data_dict['gt_boxes'][selected]
            data_dict['gt_names'] = data_dict['gt_names'][selected]
            gt_classes = np.array(
                [self.class_names.index(n) + 1 for n in data_dict['gt_names']],
                dtype=np.int32)
            data_dict['gt_boxes'] = np.concatenate(
                (data_dict['gt_boxes'],
                 gt_classes.reshape(-1, 1).astype(np.float32)), axis=1)

        if data_dict.get('points', None) is not None:
            data_dict = self.point_feature_encoder.forward(data_dict)

        data_dict = self.data_processor.forward(data_dict)

        if self.training and len(data_dict.get('gt_boxes', [])) == 0:
            new_index = np.random.randint(len(self))
            return self.__getitem__(new_index)

        data_dict.pop('gt_names', None)
        return data_dict

    def pad_gt(self, gt_boxes):
        """Zero-pad (T, 8) -> (max_gt, 8); overflow keeps the first max_gt."""
        out = np.zeros((self.max_gt, gt_boxes.shape[1] if gt_boxes.size else 8),
                       dtype=np.float32)
        t = min(len(gt_boxes), self.max_gt)
        if t:
            out[:t] = gt_boxes[:t]
        return out


def collate_batch(batch_list, max_gt=DEFAULT_MAX_GT, max_points=None):
    """Stack equal-shape frames into fixed-shape arrays (jit-ready).

    points -> (B, N, C); gt_boxes -> (B, max_gt, 8) zero-padded;
    per-point labels -> (B, N); scalars/strings -> lists.

    Ragged ``points`` (voxel-family configs have no fixed-N ``sample_points``
    stage — the reference concatenates with a batch column instead,
    ``dataset.py:183-190``) are padded to ``max_points`` (or the batch max,
    rounded up to a multiple of 1024 for jit-shape stability) by CYCLING the
    frame's own points: duplicates are invisible to voxelization (done
    per-frame, pre-collate) and to FPS (a duplicate's min-distance is 0, so
    it is never re-picked), unlike zero-pads which would inject phantom
    points at the origin. A ``points_valid`` (B, N) mask marks real rows for
    consumers that count points (VFE padded-slot floor, num_pts IoU
    rescoring)."""
    data = defaultdict(list)
    for cur in batch_list:
        for key, val in cur.items():
            data[key].append(val)
    batch = {}

    pts = data.get('points')
    ragged = pts is not None and (
        max_points is not None or len({len(v) for v in pts}) > 1)
    if ragged:
        # no explicit cap (DATA_CONFIG.MAX_POINTS_PER_FRAME unset): round the
        # batch max up to a COARSE 8192 bucket — each new bucket retriggers
        # XLA compilation of the donated train/eval step (tens of seconds on
        # TPU), so KITTI-scale clouds (~17-20k in range) should land in one
        # or two buckets; the padding waste (<8192 rows/frame) is ~128 KB
        cap = int(max_points) if max_points is not None else \
            -(-max(len(v) for v in pts) // 8192) * 8192
        for key in ('sem_labels', 'fake_labels'):
            if data.get(key) and len(data[key]) != len(pts):
                raise ValueError(
                    f'{key} present in only {len(data[key])}/{len(pts)} '
                    'frames of a ragged batch; per-point labels must be '
                    'all-or-none across a batch (re-indexing by frame '
                    'position would silently misalign them)')
        padded, valid = [], []
        for i, v in enumerate(pts):
            if len(v) > cap:
                # evenly-spaced subsample over scan order — deterministic
                # and covers the whole sweep (a head truncation would crop
                # the frame's tail region entirely)
                n = cap
                idx = np.linspace(0, len(v) - 1, cap).astype(np.int64)
            else:
                n = len(v)
                idx = np.arange(cap) % max(n, 1)
            take = v[idx] if n else \
                np.zeros((cap, v.shape[1]), dtype=v.dtype)
            padded.append(take)
            valid.append(np.arange(cap) < n)
            for key in ('sem_labels', 'fake_labels'):
                if data.get(key):
                    data[key][i] = data[key][i][idx] if n else \
                        np.zeros(cap, data[key][i].dtype)
        data['points'] = padded
        data['points_valid'] = valid

    for key, vals in data.items():
        if key == 'gt_boxes':
            width = max((v.shape[1] for v in vals if v.size), default=8)
            out = np.zeros((len(vals), max_gt, width), dtype=np.float32)
            for i, v in enumerate(vals):
                t = min(len(v), max_gt)
                if t:
                    out[i, :t, :v.shape[1]] = v[:t]
            batch[key] = out
        elif key in ('points',):
            batch[key] = np.stack(vals).astype(np.float32)
        elif key in ('sem_labels', 'fake_labels'):
            batch[key] = np.stack(vals)
        elif key in ('frame_id', 'metadata', 'calib', 'image_shape',
                     'use_lead_xyz'):
            batch[key] = np.array(vals) if key == 'image_shape' else vals
        else:
            try:
                batch[key] = np.stack(vals)
            except Exception:
                batch[key] = vals
    batch['batch_size'] = len(batch_list)
    return batch
