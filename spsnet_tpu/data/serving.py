"""Host preprocessing for the serving CLIs (predict/export): raw point
cloud -> jit-ready fixed-shape batch.

Point-family configs need only a fixed-N sample of the raw cloud; voxel
families (any config with a ``VFE`` stage) additionally run the eval-mode
``PointFeatureEncoder`` + ``DataProcessor`` pipeline (voxelization,
sparse-conv planning) and pad the ragged masked cloud by cycling
(``collate_batch`` contract). The points array ships to the device only
when the model reads it (PFE keypoints / num_pts IoU rescoring) — over a
slow host<->device link the transfer would otherwise dominate.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..config import EDict
from .dataset import DatasetTemplate, collate_batch


def load_cloud(path, num_features=4):
    """Read a .bin (flat float32) or .npy point cloud as (N, num_features)."""
    path = Path(path)
    if path.suffix == '.bin':
        return np.fromfile(str(path), np.float32).reshape(-1, num_features)
    if path.suffix == '.npy':
        return np.load(str(path)).astype(np.float32)
    raise ValueError(f'unsupported file: {path}')


class ServingPipeline:
    def __init__(self, cfg, batch_size, num_points=None, num_features=4,
                 seed=0):
        self.cfg = cfg
        self.B = int(batch_size)
        self.num_features = int(num_features)
        self.rng = np.random.default_rng(seed)
        self.voxel_family = 'VFE' in cfg.MODEL
        self.num_points = num_points
        if self.num_points is None:
            self.num_points = 16384
            for proc in cfg.get('DATA_CONFIG', EDict()).get(
                    'DATA_PROCESSOR', []):
                if proc.get('NAME') == 'sample_points':
                    self.num_points = proc['NUM_POINTS'].get('test', 16384)
        if self.voxel_family:
            self.pipeline = DatasetTemplate(
                dataset_cfg=cfg.DATA_CONFIG,
                class_names=list(cfg.CLASS_NAMES), training=False)
            self.needs_points = 'PFE' in cfg.MODEL or (
                cfg.MODEL.POST_PROCESSING.NMS_CONFIG.get('SCORE_TYPE')
                == 'num_pts_iou_cls')
            self.max_points = int(cfg.DATA_CONFIG.get(
                'MAX_POINTS_PER_FRAME', num_points or 65536))

    def _sample_fixed(self, points):
        n = self.num_points
        if len(points) >= n:
            choice = self.rng.choice(len(points), n, replace=False)
        else:
            choice = np.concatenate([
                np.arange(len(points)),
                self.rng.choice(len(points), n - len(points))])
        return points[choice]

    def make_batch(self, clouds):
        """List of (N_i, C) raw clouds (<= batch_size; tail is padded by
        repeating the last frame) -> dict of fixed-shape numpy arrays."""
        assert clouds, 'empty batch'
        if not self.voxel_family:
            pts = np.stack([self._sample_fixed(p) for p in clouds])
            if len(clouds) < self.B:
                pad = np.repeat(pts[-1:], self.B - len(clouds), axis=0)
                pts = np.concatenate([pts, pad])
            return {'points': pts.astype(np.float32)}
        frames = [self.pipeline.prepare_data({'points': p}) for p in clouds]
        frames += [frames[-1]] * (self.B - len(clouds))
        cb = collate_batch(frames, max_points=self.max_points)
        drop = () if self.needs_points else ('points', 'points_valid')
        return {k: v for k, v in cb.items()
                if isinstance(v, np.ndarray) and v.dtype != object
                and k not in drop}

    def make_batch_from_files(self, paths):
        return self.make_batch(
            [load_cloud(p, self.num_features) for p in paths])

    def example_batch(self):
        """A synthetic full-size batch with the serving input structure."""
        pcr = np.asarray(self.cfg.get('DATA_CONFIG', EDict()).get(
            'POINT_CLOUD_RANGE', [0, -40, -3, 70.4, 40, 1]), np.float32)
        n = max(self.num_points, 4096)
        pts = np.zeros((n, self.num_features), np.float32)
        pts[:, 0] = self.rng.uniform(pcr[0], pcr[3], n)
        pts[:, 1] = self.rng.uniform(pcr[1], pcr[4], n)
        pts[:, 2] = self.rng.uniform(pcr[2], pcr[5], n)
        return self.make_batch([pts] * self.B)
