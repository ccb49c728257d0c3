"""VectorPool aggregation (PV-RCNN++), dense TPU formulation.

Rebuild of ``ops/pointnet2/pointnet2_stack/pointnet2_modules.py``:
``VectorPoolLocalInterpolateModule`` (:160), ``VectorPoolAggregationModule``
(:247) and ``VectorPoolAggregationModuleMSG`` (:423), plus the CUDA
``vector_pool_with_voxel_query_op``. Per query point, a G=gx*gy*gz local grid
spans the cube of half-extent R; each cell is summarized either by

- ``local_interpolation``: IDW over the 3 nearest supports of the cell
  center (gated at R * neighbor_distance_multiplier), with the 9-dim
  (cell_center - neighbor) encoding appended; or
- ``voxel_avg_pool`` / ``voxel_random_choice``: neighbors from a cube
  (neighbor_type 0) or ball (1) query binned into cells; mean (or the first
  hit in index order — the CUDA "random" winner is an atomics race) of the
  reduced features + local offset.

Cell vectors are mixed by a per-cell (grouped 1x1 conv) projection and a
shared post-MLP. Everything is dense (B, M, G, C) with validity masks — the
reference's ragged stacked layout and its two-step CUDA neighbor search
collapse into one masked top-k.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.grouping import _first_k_hits, group_points
from ...ops.interpolate import three_nn

_FAR = 1e6


def grid_offsets(num_voxels, radius):
    """Static (G, 3) cell-center offsets (``get_dense_voxels_by_center``)."""
    gx, gy, gz = [int(g) for g in num_voxels]
    R = float(radius)
    ax = [(-R + R / g) + np.arange(g) * (2 * R / g) for g in (gx, gy, gz)]
    mesh = np.stack(np.meshgrid(*ax, indexing='ij'), axis=-1)   # (gx,gy,gz,3)
    return mesh.reshape(-1, 3).astype(np.float32)


def cube_query(radius, nsample, xyz, new_xyz, chunk=512):
    """First-k supports with Chebyshev distance <= radius (CUDA
    ``query_stacked_local_neighbor_idxs`` neighbor_type=0)."""
    B, M, _ = new_xyz.shape
    chunk = min(chunk, M)
    pad = (-M) % chunk
    centers = jnp.pad(new_xyz, ((0, 0), (0, pad), (0, 0)))
    n_chunks = centers.shape[1] // chunk
    centers = centers.reshape(B, n_chunks, chunk, 3).transpose(1, 0, 2, 3)

    def one_chunk(ctr):
        diff = jnp.abs(ctr[:, :, None, :] - xyz[:, None, :, :])
        hit = jnp.max(diff, axis=-1) <= radius
        return _first_k_hits(hit, nsample), hit.any(-1)

    idx, any_hit = jax.lax.map(one_chunk, centers)
    idx = idx.transpose(1, 0, 2, 3).reshape(B, n_chunks * chunk, nsample)
    any_hit = any_hit.transpose(1, 0, 2).reshape(B, n_chunks * chunk)
    return idx[:, :M], any_hit[:, :M]


class VectorPoolAggregation(nn.Module):
    """One VectorPool group (``VectorPoolAggregationModule``)."""
    num_local_voxel: Sequence[int]
    max_neighbor_distance: float
    post_mlps: Sequence[int]
    num_reduced_channels: int
    num_channels_of_local_aggregation: int = 32
    local_aggregation_type: str = 'local_interpolation'
    neighbor_nsample: int = -1
    neighbor_type: int = 0
    neighbor_distance_multiplier: float = 2.0

    def _reduce(self, feats):
        """C -> num_reduced_channels by summing channel groups
        (``VectorPoolAggregationModule.forward``:405)."""
        r = int(self.num_reduced_channels)
        B, N, C = feats.shape
        assert C % r == 0, f'{C} % {r}'
        return feats.reshape(B, N, C // r, r).sum(axis=2)

    def _interp_cells(self, xyz, feats, centers):
        """(B, M, G, 3) cell centers -> (B, M, G, r+9) IDW features."""
        B, M, G, _ = centers.shape
        flat_c = centers.reshape(B, M * G, 3)
        d2, idx = three_nn(flat_c, xyz)             # (B, MG, 3)
        gate = d2 <= (self.max_neighbor_distance *
                      self.neighbor_distance_multiplier) ** 2
        recip = jnp.where(gate, 1.0 / (d2 + 1e-8), 0.0)
        norm = jnp.clip(recip.sum(-1, keepdims=True), 1e-8, None)
        w = recip / norm
        nbr_feats = group_points(feats, idx)        # (B, MG, 3, r)
        interp = jnp.sum(nbr_feats * w[..., None], axis=2)
        nbr_xyz = group_points(xyz, idx)            # (B, MG, 3, 3)
        local = (flat_c[:, :, None, :] - nbr_xyz) * gate[..., None]
        enc = jnp.concatenate([interp, local.reshape(B, M * G, 9)], axis=-1)
        enc = jnp.where(gate.any(-1, keepdims=True), enc, 0.0)
        return enc.reshape(B, M, G, -1)

    def _voxel_cells(self, xyz, feats, new_xyz):
        """Cube/ball query -> bin neighbors into the local grid."""
        K = int(self.neighbor_nsample) if self.neighbor_nsample > 0 else 32
        R = float(self.max_neighbor_distance)
        gx, gy, gz = [int(g) for g in self.num_local_voxel]
        G = gx * gy * gz
        if self.neighbor_type == 1:
            from ...ops.grouping import ball_query
            idx = ball_query(R, K, xyz, new_xyz)
            nbr_xyz = group_points(xyz, idx)
            local = nbr_xyz - new_xyz[:, :, None, :]
            hit = jnp.sum(local ** 2, -1) < R * R
        else:
            idx, _ = cube_query(R, K, xyz, new_xyz)
            nbr_xyz = group_points(xyz, idx)
            local = nbr_xyz - new_xyz[:, :, None, :]
            hit = jnp.max(jnp.abs(local), axis=-1) <= R
        nbr_feats = group_points(feats, idx)        # (B, M, K, r)

        cell = jnp.floor((local + R) / (2 * R) *
                         jnp.asarray([gx, gy, gz], jnp.float32))
        cell = jnp.clip(cell, 0, jnp.asarray([gx - 1, gy - 1, gz - 1],
                                             jnp.float32))
        flat = (cell[..., 0] * gy * gz + cell[..., 1] * gz +
                cell[..., 2]).astype(jnp.int32)     # (B, M, K)
        onehot = jax.nn.one_hot(flat, G) * hit[..., None]   # (B, M, K, G)

        if self.local_aggregation_type == 'voxel_avg_pool':
            cnt = onehot.sum(axis=2)                         # (B, M, G)
            fsum = jnp.einsum('bmkg,bmkc->bmgc', onehot, nbr_feats)
            xsum = jnp.einsum('bmkg,bmkc->bmgc', onehot, local)
            denom = jnp.clip(cnt, 1.0, None)[..., None]
            cell_feats = jnp.concatenate(
                [xsum / denom, fsum / denom], axis=-1)
            cell_feats = cell_feats * (cnt[..., None] > 0)
        else:   # voxel_random_choice: first hit in index order per cell
            first = jnp.argmax(onehot, axis=2)               # (B, M, G)
            has = onehot.max(axis=2) > 0                     # (B, M, G)
            take = jnp.take_along_axis(
                jnp.concatenate([local, nbr_feats], axis=-1),
                first[..., None], axis=2)                    # (B, M, G, 3+r)
            cell_feats = take * has[..., None]
        return cell_feats                                    # (B, M, G, 3+r)

    @nn.compact
    def __call__(self, xyz, feats, new_xyz, train: bool = True,
                 new_valid=None):
        """xyz (B,N,3) supports (invalid pushed to far sentinel by caller);
        feats (B,N,C); new_xyz (B,M,3). Returns (B, M, C_out)."""
        feats = self._reduce(feats)
        G = int(np.prod([int(g) for g in self.num_local_voxel]))
        if self.local_aggregation_type == 'local_interpolation':
            centers = new_xyz[:, :, None, :] + jnp.asarray(
                grid_offsets(self.num_local_voxel,
                             self.max_neighbor_distance))[None, None]
            cells = self._interp_cells(xyz, feats, centers)  # (B,M,G,r+9)
        else:
            cells = self._voxel_cells(xyz, feats, new_xyz)   # (B,M,G,r+3)

        B, M, _, Cin = cells.shape
        co = int(self.num_channels_of_local_aggregation)
        # grouped 1x1 conv: per-cell weight (parity: Conv1d(groups=G))
        w = self.param('grouped_kernel', nn.initializers.kaiming_normal(),
                       (G, Cin, co))
        h = jnp.einsum('bmgc,gco->bmgo', cells, w).reshape(B, M, G * co)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, name='agg_bn')(h)
        h = nn.relu(h)
        for i, ch in enumerate(self.post_mlps):
            h = nn.Dense(int(ch), use_bias=False, name=f'post_{i}')(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f'post_bn_{i}')(h)
            h = nn.relu(h)
        if new_valid is not None:
            h = jnp.where(new_valid[..., None], h, 0.0)
        return h


class VectorPoolAggregationMSG(nn.Module):
    """Multi-group VectorPool (``VectorPoolAggregationModuleMSG``)."""
    model_cfg: Any
    input_channels: int

    @nn.compact
    def __call__(self, xyz, feats, new_xyz, train: bool = True,
                 new_valid=None):
        cfg = self.model_cfg
        outs = []
        for k in range(int(cfg.NUM_GROUPS)):
            g = cfg[f'GROUP_CFG_{k}']
            mod = VectorPoolAggregation(
                num_local_voxel=tuple(int(v) for v in g.NUM_LOCAL_VOXEL),
                max_neighbor_distance=float(g.MAX_NEIGHBOR_DISTANCE),
                post_mlps=tuple(int(v) for v in g.POST_MLPS),
                num_reduced_channels=int(cfg.get('NUM_REDUCED_CHANNELS',
                                                 self.input_channels)),
                num_channels_of_local_aggregation=int(
                    cfg.NUM_CHANNELS_OF_LOCAL_AGGREGATION),
                local_aggregation_type=str(cfg.LOCAL_AGGREGATION_TYPE),
                neighbor_nsample=int(g.get('NEIGHBOR_NSAMPLE', -1)),
                neighbor_type=int(g.get('NEIGHBOR_TYPE', 0)),
                name=f'layer_{k}')
            outs.append(mod(xyz, feats, new_xyz, train=train,
                            new_valid=new_valid))
        h = jnp.concatenate(outs + [new_xyz], axis=-1)
        for i, ch in enumerate(cfg.MSG_POST_MLPS):
            h = nn.Dense(int(ch), use_bias=False, name=f'msg_post_{i}')(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f'msg_post_bn_{i}')(h)
            h = nn.relu(h)
        if new_valid is not None:
            h = jnp.where(new_valid[..., None], h, 0.0)
        return h
