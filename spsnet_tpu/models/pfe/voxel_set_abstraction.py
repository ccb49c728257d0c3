"""Voxel Set Abstraction (PV-RCNN's keypoint feature encoder).

Rebuild of ``backbones_3d/pfe/voxel_set_abstraction.py``: FPS keypoints from
the raw cloud, then per source (raw points, each sparse-conv level's voxel
centers, the BEV map) group features around every keypoint with MSG ball
query + shared MLP + max-pool; concat and fuse to NUM_OUTPUT_FEATURES.

The reference uses the ragged "stack" pointnet2 ops; here every source is a
dense (B, V, C) cloud with validity masks — padded voxels are pushed to a far
sentinel so ball queries never see them.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import ops
from ..blocks import SharedMLP
from ..model_utils.vector_pool import VectorPoolAggregationMSG

_FAR = 1e6


def sample_points_with_roi_mask(xyz, rois, sample_radius_with_roi):
    """(B, N) mask of points near any roi (parity:
    ``voxel_set_abstraction.py:45-76 sample_points_with_roi`` — the ragged
    compaction becomes a mask).

    Args:
        xyz: (B, N, 3); rois: (B, R, 7+) zero-padded (dx == 0 => padding).
    """
    centers = rois[..., 0:3]                            # (B, R, 3)
    pad = rois[..., 3] <= 0
    d = jnp.linalg.norm(xyz[:, :, None, :] - centers[:, None, :, :], axis=-1)
    d = jnp.where(pad[:, None, :], jnp.inf, d)
    min_d = jnp.min(d, axis=-1)
    nearest = jnp.argmin(d, axis=-1)                    # (B, N)
    half_diag = jnp.linalg.norm(rois[..., 3:6] / 2, axis=-1)  # (B, R)
    roi_max_dim = jnp.take_along_axis(half_diag, nearest, axis=1)
    mask = min_d < roi_max_dim + sample_radius_with_roi
    # reference falls back to points[:1] when nothing is near a roi
    none = jnp.logical_not(mask.any(-1, keepdims=True))
    return mask | (none & (jnp.arange(xyz.shape[1])[None] == 0))


def sector_fps_dense(xyz, point_mask, num_keypoints, num_sectors):
    """Sectorized FPS (parity: ``voxel_set_abstraction.py:78-123``).

    Points are bucketed into azimuth sectors; each sector contributes
    ``min(cnt_s, ceil(cnt_s / total * K))`` FPS picks. The reference's ragged
    per-sector stack becomes: one masked FPS per sector (static loop) whose
    first ``quota_s`` picks are scattered into the K output slots at the
    running offset. Returns (idx (B, K) int32, valid (B, K) bool).
    """
    B, N, _ = xyz.shape
    K = int(num_keypoints)
    S = int(num_sectors)
    sector_size = 2 * np.pi / S
    ang = jnp.arctan2(xyz[..., 1], xyz[..., 0]) + np.pi
    sector = jnp.clip(jnp.floor(ang / sector_size), 0, S - 1).astype(jnp.int32)

    total = jnp.clip(point_mask.sum(-1), 1, None).astype(jnp.float32)  # (B,)
    out_idx = jnp.zeros((B, K), jnp.int32)
    offset = jnp.zeros((B,), jnp.int32)
    for s in range(S):
        m = point_mask & (sector == s)
        cnt = m.sum(-1)                                  # (B,)
        quota = jnp.minimum(cnt, jnp.ceil(
            cnt.astype(jnp.float32) / total * K).astype(jnp.int32))
        picks = ops.farthest_point_sample(xyz, K, valid_mask=m)  # (B, K)
        slots = offset[:, None] + jnp.arange(K)[None, :]
        ok = (jnp.arange(K)[None, :] < quota[:, None]) & (slots < K)
        out_idx = out_idx.at[
            jnp.arange(B)[:, None],
            jnp.where(ok, slots, K)].set(picks, mode='drop')
        offset = jnp.minimum(offset + quota, K)
    valid = jnp.arange(K)[None, :] < offset[:, None]
    return out_idx, valid


class VoxelSetAbstraction(nn.Module):
    model_cfg: Any
    voxel_size: Any
    point_cloud_range: Any
    num_bev_features: int = 256
    bev_stride: int = 8

    def _voxel_centers(self, coords_zyx, downsample):
        vs = np.asarray(self.voxel_size, np.float32) * downsample
        pcr = np.asarray(self.point_cloud_range, np.float32)
        xyz_idx = coords_zyx[..., ::-1].astype(jnp.float32)   # zyx -> xyz
        return xyz_idx * vs + pcr[:3] + vs / 2

    def _bev_interpolate(self, keypoints, bev):
        """Bilinear BEV features at keypoint xy (``voxel_set_abstraction.py:
        176-205``). bev: (B, H, W, C) NHWC."""
        vs = np.asarray(self.voxel_size, np.float32)
        pcr = np.asarray(self.point_cloud_range, np.float32)
        x_idx = (keypoints[..., 0] - pcr[0]) / vs[0] / self.bev_stride
        y_idx = (keypoints[..., 1] - pcr[1]) / vs[1] / self.bev_stride
        B, H, W, C = bev.shape
        x0 = jnp.clip(jnp.floor(x_idx), 0, W - 2).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(y_idx), 0, H - 2).astype(jnp.int32)
        wx = jnp.clip(x_idx - x0, 0.0, 1.0)[..., None]
        wy = jnp.clip(y_idx - y0, 0.0, 1.0)[..., None]

        def at(yy, xx):
            flat = yy * W + xx
            return jnp.take_along_axis(
                bev.reshape(B, H * W, C), flat[..., None], axis=1)

        v00 = at(y0, x0)
        v01 = at(y0, x0 + 1)
        v10 = at(y0 + 1, x0)
        v11 = at(y0 + 1, x0 + 1)
        return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                v10 * wy * (1 - wx) + v11 * wy * wx)

    @nn.compact
    def __call__(self, batch, train: bool = True):
        cfg = self.model_cfg
        points = batch['points']
        xyz = points[..., 0:3]
        num_kp = int(cfg.NUM_KEYPOINTS)
        if str(cfg.get('SAMPLE_METHOD', 'FPS')) == 'SPC':
            # sectorized proposal-centric sampling (PV-RCNN++,
            # ``voxel_set_abstraction.py:206-225``)
            spc = cfg.SPC_SAMPLING
            near = sample_points_with_roi_mask(
                xyz, batch['rois'][..., :7],
                float(spc.SAMPLE_RADIUS_WITH_ROI))
            kp_idx, kp_valid = sector_fps_dense(
                xyz, near, num_kp, int(spc.NUM_SECTORS))
            keypoints = ops.gather_points(xyz, kp_idx)        # (B, K, 3)
            keypoints = jnp.where(kp_valid[..., None], keypoints, _FAR)
        else:
            kp_idx = ops.farthest_point_sample(xyz, num_kp)
            keypoints = ops.gather_points(xyz, kp_idx)        # (B, K, 3)
            kp_valid = jnp.ones(keypoints.shape[:2], bool)

        feats = []
        sources = list(cfg.FEATURES_SOURCE)
        if 'bev' in sources:
            feats.append(jnp.where(
                kp_valid[..., None],
                self._bev_interpolate(keypoints, batch['spatial_features']),
                0.0))
        if 'raw_points' in sources:
            sa = cfg.SA_LAYER.raw_points
            raw_feats = points[..., 3:] if points.shape[-1] > 3 else None
            if str(sa.get('NAME', '')) == 'VectorPoolAggregationModuleMSG':
                feats.append(VectorPoolAggregationMSG(
                    model_cfg=sa, input_channels=raw_feats.shape[-1],
                    name='raw_vp')(xyz, raw_feats, keypoints, train=train,
                                   new_valid=kp_valid))
            else:
                scale = []
                for i, (r, ns, mlp) in enumerate(zip(sa.POOL_RADIUS,
                                                     sa.NSAMPLE, sa.MLPS)):
                    grouped, _ = ops.query_and_group(
                        float(r), int(ns), xyz, keypoints, raw_feats)
                    # stack-op semantics: empty balls are zeroed pre-MLP
                    grouped = ops.grouping.zero_empty_balls(grouped, r)
                    h = SharedMLP(list(mlp), name=f'raw_mlp_{i}')(grouped,
                                                                  train=train)
                    scale.append(jnp.max(h, axis=2))
                feats.append(jnp.concatenate(scale, axis=-1))

        level_srcs = {
            'x_conv1': ('voxel_coords', 1),
            'x_conv2': ('down2_coords', 2),
            'x_conv3': ('down3_coords', 4),
            'x_conv4': ('down4_coords', 8),
        }
        for name, (coord_key, ds) in level_srcs.items():
            if name not in sources:
                continue
            sa = cfg.SA_LAYER[name]
            src_feats = batch['multi_scale_3d_features'][name]
            coords = batch[coord_key]
            valid_key = coord_key.replace('coords', 'valid')
            valid = batch.get(valid_key, batch.get('voxel_valid'))
            centers = self._voxel_centers(coords, ds)
            centers = jnp.where(valid[..., None], centers, _FAR)
            if str(sa.get('NAME', '')) == 'VectorPoolAggregationModuleMSG':
                feats.append(VectorPoolAggregationMSG(
                    model_cfg=sa, input_channels=src_feats.shape[-1],
                    name=f'{name}_vp')(centers, src_feats, keypoints,
                                       train=train, new_valid=kp_valid))
            else:
                scale = []
                for i, (r, ns, mlp) in enumerate(zip(sa.POOL_RADIUS,
                                                     sa.NSAMPLE, sa.MLPS)):
                    grouped, _ = ops.query_and_group(
                        float(r), int(ns), centers, keypoints, src_feats)
                    grouped = ops.grouping.zero_empty_balls(grouped, r)
                    h = SharedMLP(list(mlp), name=f'{name}_mlp_{i}')(grouped,
                                                                     train=train)
                    scale.append(jnp.max(h, axis=2))
                feats.append(jnp.concatenate(scale, axis=-1))

        kp_features = jnp.concatenate(feats, axis=-1)         # (B, K, C_cat)
        fused = SharedMLP([int(cfg.NUM_OUTPUT_FEATURES)],
                          name='vsa_point_feature_fusion')(
                              kp_features, train=train)

        batch = dict(batch)
        batch['point_features_before_fusion'] = kp_features
        batch['point_features'] = fused
        batch['point_coords'] = keypoints
        batch['point_valid'] = kp_valid
        return batch
