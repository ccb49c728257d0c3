"""Voxel feature encoders (dense, fixed-shape).

Parity: ``pcdet/models/backbones_3d/vfe/{mean_vfe,pillar_vfe}.py``. Voxels
arrive zero-padded as (B, V, P, C) with per-voxel counts — the host
processor's fixed-shape layout — so everything is masked dense math.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class MeanVFE(nn.Module):
    """Per-voxel mean of point features (``mean_vfe.py``)."""
    model_cfg: Any = None
    num_point_features: int = 4

    @nn.compact
    def __call__(self, batch, train: bool = True):
        voxels = batch['voxels']                    # (B, V, P, C)
        counts = batch['voxel_num_points']          # (B, V)
        denom = jnp.clip(counts[..., None].astype(voxels.dtype), 1.0, None)
        batch = dict(batch)
        batch['voxel_features'] = voxels.sum(axis=2) / denom
        return batch


class PFNLayer(nn.Module):
    out_channels: int
    use_norm: bool = True
    last_layer: bool = False

    @nn.compact
    def __call__(self, inputs, mask, train: bool = True):
        """inputs (B, V, P, C); mask (B, V, P) valid points."""
        units = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(units, use_bias=not self.use_norm)(inputs)
        if self.use_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3)(x)
        x = nn.relu(x)
        x_masked = jnp.where(mask[..., None], x, -1e9)
        x_max = jnp.max(x_masked, axis=2, keepdims=True)    # (B, V, 1, U)
        if self.last_layer:
            return x_max[:, :, 0, :]
        x_repeat = jnp.broadcast_to(x_max, x.shape)
        return jnp.concatenate([x, x_repeat], axis=-1)


class PillarVFE(nn.Module):
    """PointPillars feature net (``pillar_vfe.py``): augment each point with
    (xyz - pillar mean) and (xy - pillar center), then PFN layers with
    masked max-pool."""
    model_cfg: Any
    num_point_features: int
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]

    @nn.compact
    def __call__(self, batch, train: bool = True):
        voxels = batch['voxels']                    # (B, V, P, C)
        counts = batch['voxel_num_points']          # (B, V)
        coords = batch['voxel_coords']              # (B, V, 3) zyx

        P = voxels.shape[2]
        mask = jnp.arange(P)[None, None, :] < counts[..., None]

        denom = jnp.clip(counts[..., None, None].astype(voxels.dtype), 1, None)
        points_mean = voxels[..., :3].sum(axis=2, keepdims=True) / denom
        f_cluster = voxels[..., :3] - points_mean

        vs = np.asarray(self.voxel_size, dtype=np.float32)
        pcr = np.asarray(self.point_cloud_range, dtype=np.float32)
        x_offset = vs[0] / 2 + pcr[0]
        y_offset = vs[1] / 2 + pcr[1]
        z_offset = vs[2] / 2 + pcr[2]
        cx = coords[..., 2:3].astype(voxels.dtype) * vs[0] + x_offset
        cy = coords[..., 1:2].astype(voxels.dtype) * vs[1] + y_offset
        cz = coords[..., 0:1].astype(voxels.dtype) * vs[2] + z_offset
        f_center = jnp.stack([
            voxels[..., 0] - cx[..., None, 0],
            voxels[..., 1] - cy[..., None, 0],
            voxels[..., 2] - cz[..., None, 0]], axis=-1)

        features = [voxels, f_cluster, f_center]
        if self.model_cfg.get('USE_ABSLOTE_XYZ', self.model_cfg.get(
                'USE_ABSOLUTE_XYZ', True)) is False:
            features[0] = voxels[..., 3:]
        if self.model_cfg.get('WITH_DISTANCE', False):
            features.append(jnp.linalg.norm(voxels[..., :3], axis=-1,
                                            keepdims=True))
        x = jnp.concatenate(features, axis=-1)
        x = jnp.where(mask[..., None], x, 0.0)

        filters = list(self.model_cfg.NUM_FILTERS)
        for i, ch in enumerate(filters):
            x = PFNLayer(ch, use_norm=bool(self.model_cfg.get('USE_NORM', True)),
                         last_layer=(i == len(filters) - 1),
                         name=f'pfn_{i}')(x, mask, train=train)

        batch = dict(batch)
        batch['pillar_features'] = x                # (B, V, C_out)
        return batch
