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
        """inputs (B, V, P, C); mask (B, V, P) valid points (unused — kept
        for call-site stability).

        Reference semantics (``pillar_vfe.py:29-48``): padded point slots
        are zeroed ONCE before the PFN stack (``PillarVFE.forward``) and the
        max-pool runs over ALL slots, so each channel has an f(0) activation
        floor in partially-filled pillars. Reproduced exactly for
        checkpoint/output parity (round 1 masked to -1e9 before the max,
        which excludes padded activations — deviation removed)."""
        units = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(units, use_bias=not self.use_norm)(inputs)
        if self.use_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3)(x)
        x = nn.relu(x)
        x_max = jnp.max(x, axis=2, keepdims=True)           # (B, V, 1, U)
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


class DynamicPillarVFE(nn.Module):
    """Device-side pillar encoder straight from raw points.

    Rebuild of ``vfe/dynamic_pillar_vfe.py`` (``DynamicPillarVFE`` +
    ``PFNLayerV2``): the reference voxelizes on-device with
    ``torch.unique`` + ``torch_scatter`` to skip the padded (V, P, C)
    intermediate. The TPU formulation keeps points dense (B, N, C) and
    scatters each PFN layer's features into the (B, ny*nx) BEV canvas by
    flat pillar id (segment-max), gathering back per point for the
    concat stage — no host voxelization, no (V, P) padding, and the final
    canvas IS ``spatial_features`` (the ``Sparse2BEV`` scatter folds away).

    Deviation (documented): BatchNorm runs over all N point slots including
    out-of-range ones (zeroed features) rather than the reference's
    compacted point list — fixed shapes preclude compaction; with the usual
    >95% in-range fraction the statistics drift is negligible.
    """
    model_cfg: Any
    num_point_features: int
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]

    @nn.compact
    def __call__(self, batch, train: bool = True):
        points = batch['points']                    # (B, N, 4+)
        vs = np.asarray(self.voxel_size, dtype=np.float32)
        pcr = np.asarray(self.point_cloud_range, dtype=np.float32)
        nx = int(round((pcr[3] - pcr[0]) / vs[0]))
        ny = int(round((pcr[4] - pcr[1]) / vs[1]))
        B, N, _ = points.shape
        P = ny * nx

        ix = jnp.floor((points[..., 0] - pcr[0]) / vs[0]).astype(jnp.int32)
        iy = jnp.floor((points[..., 1] - pcr[1]) / vs[1]).astype(jnp.int32)
        mask = (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
        if 'points_valid' in batch:
            mask = mask & batch['points_valid']
        flat = jnp.where(mask, iy * nx + ix, P)     # dump slot P

        barange = jnp.arange(B)[:, None]

        def seg_sum(vals):
            out = jnp.zeros((B, P + 1, vals.shape[-1]), vals.dtype)
            return out.at[barange, flat].add(vals)

        def seg_max(vals):
            out = jnp.full((B, P + 1, vals.shape[-1]), -1e9, vals.dtype)
            return out.at[barange, flat].max(vals)

        def gather(canvas):
            return jnp.take_along_axis(canvas, flat[..., None], axis=1)

        # per-pillar mean of xyz -> f_cluster
        cnt = seg_sum(jnp.where(mask, 1.0, 0.0)[..., None])
        xyz_sum = seg_sum(jnp.where(mask[..., None], points[..., :3], 0.0))
        mean = xyz_sum / jnp.clip(cnt, 1.0, None)
        f_cluster = points[..., :3] - gather(mean)

        # offset from pillar center
        cx = (ix.astype(jnp.float32) + 0.5) * vs[0] + pcr[0]
        cy = (iy.astype(jnp.float32) + 0.5) * vs[1] + pcr[1]
        cz = vs[2] / 2 + pcr[2]
        f_center = jnp.stack([points[..., 0] - cx, points[..., 1] - cy,
                              points[..., 2] - cz], axis=-1)

        use_abs = self.model_cfg.get('USE_ABSLOTE_XYZ', self.model_cfg.get(
            'USE_ABSOLUTE_XYZ', True))
        feats = [points if use_abs else points[..., 3:], f_cluster, f_center]
        if self.model_cfg.get('WITH_DISTANCE', False):
            feats.append(jnp.linalg.norm(points[..., :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        x = jnp.where(mask[..., None], x, 0.0)

        use_norm = bool(self.model_cfg.get('USE_NORM', True))
        filters = list(self.model_cfg.NUM_FILTERS)
        canvas = None
        for i, ch in enumerate(filters):
            last = i == len(filters) - 1
            units = ch if last else ch // 2
            x = nn.Dense(units, use_bias=not use_norm, name=f'pfn{i}_fc')(x)
            if use_norm:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99, epsilon=1e-3,
                                 name=f'pfn{i}_bn')(x)
            x = nn.relu(x)
            x = jnp.where(mask[..., None], x, 0.0)
            canvas = seg_max(x)
            if not last:
                x = jnp.concatenate([x, gather(canvas)], axis=-1)

        canvas = jnp.where(canvas > -1e9, canvas, 0.0)[:, :P]
        batch = dict(batch)
        batch['pillar_canvas'] = canvas
        batch['spatial_features'] = canvas.reshape(
            B, ny, nx, canvas.shape[-1])
        return batch
