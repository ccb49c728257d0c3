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

_FAR = 1e6


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
        kp_idx = ops.farthest_point_sample(xyz, num_kp)
        keypoints = ops.gather_points(xyz, kp_idx)            # (B, K, 3)

        feats = []
        sources = list(cfg.FEATURES_SOURCE)
        if 'bev' in sources:
            feats.append(self._bev_interpolate(
                keypoints, batch['spatial_features']))
        if 'raw_points' in sources:
            sa = cfg.SA_LAYER.raw_points
            raw_feats = points[..., 3:] if points.shape[-1] > 3 else None
            scale = []
            for i, (r, ns, mlp) in enumerate(zip(sa.POOL_RADIUS, sa.NSAMPLE,
                                                 sa.MLPS)):
                grouped, _ = ops.query_and_group(
                    float(r), int(ns), xyz, keypoints, raw_feats)
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
            scale = []
            for i, (r, ns, mlp) in enumerate(zip(sa.POOL_RADIUS, sa.NSAMPLE,
                                                 sa.MLPS)):
                grouped, _ = ops.query_and_group(
                    float(r), int(ns), centers, keypoints, src_feats)
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
        return batch
