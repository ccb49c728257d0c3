"""Point downsampling strategies for SA layers.

One function per ``SAMPLE_METHOD_LIST`` entry of the reference's
``PointnetSAModuleMSG_WithSampling.forward`` dispatch
(``pointnet2_modules.py:267-419``):

- ``D-FPS``     — euclidean farthest point sampling,
- ``F-FPS``     — FPS over xyz+feature distance,
- ``FS``        — F-FPS and D-FPS concatenated (2x npoint),
- ``ctr``/``cls`` — top-k of sigmoid(max class logit)  (IA-SSD ctr_aware),
- ``sss``       — top-k of cls score x stability score ``1-sigmoid(stds/8-3)``
                   (SPSNet's stability-aware sampler, :293-305),
- ``S-FPS``     — D-FPS then swap each sample for its argmin-stds ball
                   neighbor, falling back to plain D-FPS when the swap
                   degenerates (<min_unique unique picks, :314-355),
- ``Rand``      — random subset,
- ``ds-FPS``/``ry-FPS`` — radial / azimuth partitioned FPS (:372-419).

All are fixed-shape jnp and return ``(sample_idx, stds)`` where ``stds`` is
the per-sample stability gathered along the chosen indices (or None).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import ops


def _topk_idx(scores, npoint):
    _, idx = jax.lax.top_k(scores, npoint)
    return idx.astype(jnp.int32)


def _gather_stds(stds, idx):
    if stds is None:
        return None
    return jnp.take_along_axis(stds, idx, axis=1)


def stability_score(stds):
    """SPSNet's stability mapping: ``1 - sigmoid(stds/8 - 3)``
    (``pointnet2_modules.py:301``). High stds (unstable) -> low score."""
    return 1.0 - jax.nn.sigmoid(stds / 8.0 - 3.0)


def sample_ctr_aware(cls_features, npoint):
    scores = jax.nn.sigmoid(jnp.max(cls_features, axis=-1))
    return _topk_idx(scores, npoint)


def sample_sss_aware(cls_features, stds, npoint):
    cls_score = jax.nn.sigmoid(jnp.max(cls_features, axis=-1))
    idx = _topk_idx(cls_score * stability_score(stds), npoint)
    return idx, _gather_stds(stds, idx)


def sample_dfps(xyz, npoint, stds=None, valid_mask=None):
    # allow_seed: this is the SA-module D-FPS dispatch — the call site the
    # seeded-FPS lifecycle quality gate validated (see ops.fps_seed_config).
    idx = ops.farthest_point_sample(xyz, npoint, valid_mask=valid_mask,
                                    allow_seed=True)
    return idx, _gather_stds(stds, idx)


def sample_ffps(xyz, features, npoint):
    feat = jnp.concatenate([xyz, features], axis=-1)
    dmat = ops.calc_square_dist(feat, feat)
    return ops.farthest_point_sample_with_dist(dmat, npoint)


def sample_fs(xyz, features, npoint):
    """3DSSD fusion sampling: [F-FPS idx, D-FPS idx] -> (B, 2*npoint)."""
    idx1 = sample_ffps(xyz, features, npoint)
    idx2 = ops.farthest_point_sample(xyz, npoint)
    return jnp.concatenate([idx1, idx2], axis=-1)


def sample_rand(rng, batch_size, n, npoint):
    """Random subset; the reference draws one permutation shared across the
    batch (``pointnet2_modules.py:370-371``)."""
    perm = jax.random.permutation(rng, n)[:npoint].astype(jnp.int32)
    return jnp.broadcast_to(perm[None, :], (batch_size, npoint))


def sample_sfps(xyz, stds, npoint, ss_radius, ss_nsample, min_unique=3500):
    """SPSNet S-FPS: D-FPS then per-sample argmin-stds neighbor swap.

    ``min_unique`` reproduces the reference's hardcoded degeneracy fallback
    (``pointnet2_modules.py:352-353``): if batch row 0 yields fewer than this
    many unique swapped indices, the whole batch falls back to plain D-FPS.
    """
    base_idx = ops.farthest_point_sample(xyz, npoint)
    new_xyz = ops.gather_points(xyz, base_idx)
    nbr_idx = ops.ball_query(ss_radius, ss_nsample, xyz, new_xyz)      # (B,M,S)
    nbr_stds = ops.group_points(stds[..., None], nbr_idx)[..., 0]      # (B,M,S)
    best = jnp.argmin(nbr_stds, axis=-1)                               # (B,M)
    swapped = jnp.take_along_axis(nbr_idx, best[..., None], axis=-1)[..., 0]

    # unique count of batch row 0 (sorted-diff trick; jit-friendly)
    row0 = jnp.sort(swapped[0])
    n_unique = 1 + jnp.sum(row0[1:] != row0[:-1])
    idx = jnp.where(n_unique < min_unique, base_idx, swapped.astype(jnp.int32))
    return idx, _gather_stds(stds, idx)


def _partitioned_fps(xyz, keys, npoint, part_num=4):
    """Shared core of ds-FPS / ry-FPS: sort by key, split into ``part_num``
    contiguous partitions, FPS each, map back (``pointnet2_modules.py:372-419``).
    Requires N % part_num == 0 (true for the reference's usage)."""
    B, N, _ = xyz.shape
    order = jnp.argsort(keys, axis=-1).astype(jnp.int32)               # (B, N)
    xyz_sorted = jnp.take_along_axis(xyz, order[..., None], axis=1)
    per = N // part_num
    xyz_div = xyz_sorted.reshape(B * part_num, per, 3)
    sub = ops.farthest_point_sample(xyz_div, npoint // part_num)
    sub = sub.reshape(B, part_num, npoint // part_num)
    offs = (jnp.arange(part_num, dtype=jnp.int32) * per)[None, :, None]
    flat = (sub + offs).reshape(B, -1)
    return jnp.take_along_axis(order, flat, axis=1)


def sample_ds_fps(xyz, npoint, part_num=4):
    keys = jnp.linalg.norm(xyz, axis=-1) - 5.0
    return _partitioned_fps(xyz, keys, npoint, part_num)


def sample_ry_fps(xyz, npoint, part_num=4):
    keys = jnp.arctan(xyz[..., 0] / (xyz[..., 1] + 1e-12))
    return _partitioned_fps(xyz, keys, npoint, part_num)
