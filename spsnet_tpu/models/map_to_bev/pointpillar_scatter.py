"""Scatter pillar features to a dense BEV grid.

Parity: ``map_to_bev/pointpillar_scatter.py``. The per-frame index_put loop
becomes one batched scatter: invalid/padding pillars target an out-of-range
slot and are dropped.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class PointPillarScatter(nn.Module):
    model_cfg: Any
    grid_size: Sequence[int]        # (nx, ny, nz)

    @nn.compact
    def __call__(self, batch, train: bool = True):
        if 'spatial_features' in batch:
            # DynamicPillarVFE already scattered straight into the canvas
            return batch
        feats = batch['pillar_features']            # (B, V, C)
        coords = batch['voxel_coords']              # (B, V, 3) zyx
        valid = batch.get('voxel_valid', None)
        nx, ny = int(self.grid_size[0]), int(self.grid_size[1])
        B, V, C = feats.shape

        flat_idx = coords[..., 1] * nx + coords[..., 2]      # y * nx + x
        if valid is not None:
            flat_idx = jnp.where(valid, flat_idx, nx * ny)   # dropped slot

        canvas = jnp.zeros((B, ny * nx + 1, C), dtype=feats.dtype)
        canvas = canvas.at[
            jnp.arange(B)[:, None], flat_idx].set(feats, mode='drop')
        canvas = canvas[:, :ny * nx].reshape(B, ny, nx, C)

        batch = dict(batch)
        batch['spatial_features'] = canvas          # (B, ny, nx, C) — NHWC
        return batch
