"""Farthest point sampling (D-FPS / F-FPS) as XLA loops or a Pallas kernel.

Replaces ``pointnet2_batch_cuda`` sampling kernels
(``pcdet/ops/pointnet2/pointnet2_batch/src/sampling_gpu.cu:93-374``).
Semantics replicated:
- the first selected index is always 0 (``sampling_gpu.cu:112-114``),
- running min-distance update ``temp = min(temp, d2)`` then global argmax,
- F-FPS runs the same loop over a precomputed (B, N, N) distance matrix.

Tie-breaking: we take the lowest index among maxima (numpy-argmax order);
the CUDA tree reduction has an arbitrary but fixed tie order — ties are
measure-zero for float point clouds.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def calc_square_dist(a, b):
    """Squared pairwise distances, (B, N, C) x (B, M, C) -> (B, N, M).

    Mirrors ``_PointnetSAModuleBase.calc_square_dist``
    (``pointnet2_modules.py:19-43``) — the MXU-friendly |a|^2+|b|^2-2ab form.
    """
    a_sq = jnp.sum(a * a, axis=-1, keepdims=True)          # (B, N, 1)
    b_sq = jnp.sum(b * b, axis=-1, keepdims=True)          # (B, M, 1)
    # HIGHEST precision: distances feed argmax/top-k selection — the TPU
    # default bf16 matmul reorders near-ties and breaks kernel parity.
    cross = jnp.einsum('bnc,bmc->bnm', a, b,
                       precision=jax.lax.Precision.HIGHEST)
    return a_sq + jnp.swapaxes(b_sq, 1, 2) - 2.0 * cross


def fps_seed_config():
    """Effective seeded-FPS setting as ``(fraction, mode)``.

    On TPU the DEFAULT is f=0.75 with grid-stratified seeds: detection
    quality is gated >= exact FPS on the train/serve lifecycle gate
    (``tools/validate_approx_topk.py --fps-train``: gt recall 0.375 vs
    0.297 exact, precision and center error no worse on either data seed)
    and throughput measured 308 vs 246 scenes/s (DESIGN.md round 4).
    ``SPSNET_FPS_SEED=0`` restores exact CUDA-parity FPS; any f in (0, 1)
    plus ``SPSNET_FPS_SEED_MODE=head|grid`` overrides. CPU (and the parity
    suite, which runs on CPU) defaults to exact.

    SCOPE: the default only APPLIES to call sites that opt in with
    ``allow_seed=True`` — the SA-module D-FPS dispatch, which is what the
    lifecycle gate validated. Un-gated FPS consumers (PV-RCNN keypoint
    selection, ds/ry-FPS partitions, S-FPS/FS bases) stay exact unless
    ``SPSNET_FPS_SEED_SCOPE=all`` widens the scope explicitly.

    NOTE all of these env vars are read at TRACE time: flipping them after
    a jitted model has been traced is silently ignored by the jit cache —
    call ``jax.clear_caches()`` after changing them (as
    ``tools/validate_approx_topk.py`` does).
    """
    on_tpu = jax.default_backend() == 'tpu'
    frac = float(os.environ.get('SPSNET_FPS_SEED',
                                '0.75' if on_tpu else '0'))
    mode = os.environ.get('SPSNET_FPS_SEED_MODE',
                          'grid' if on_tpu else 'head')
    return frac, mode


def fps_seed_k0(npoint: int) -> int:
    """Seed count the seeded-FPS path would use for ``npoint``, or 0 when
    seeding disengages (fraction outside (0,1), or the 128-aligned seed
    block rounds to nothing — npoint <= 170 at f=0.75).

    Single source of truth for the engagement condition, shared by the
    dispatch below and sa_module's prefix-shortcut gating so the two can
    never disagree.

    ``frac >= 1.0`` with grid mode means PURE stratified sampling
    (k0 == npoint: no sequential completion steps at all) — only
    meaningful for grid seeds, so head mode disengages there.
    """
    frac, mode = fps_seed_config()
    if frac >= 1.0:
        return npoint if (mode == 'grid' and npoint % 128 == 0) else 0
    if not 0.0 < frac:
        return 0
    k0 = int(frac * npoint) // 128 * 128
    return k0 if 0 < k0 < npoint else 0


def fps_seeding_active(npoint: int, allow_seed: bool = True) -> bool:
    """Whether ``farthest_point_sample(npoint, allow_seed=...)`` will run
    the seeded approximation (TPU backend, engaged seed block, and either
    a gated call site or ``SPSNET_FPS_SEED_SCOPE=all``)."""
    if not (allow_seed
            or os.environ.get('SPSNET_FPS_SEED_SCOPE', 'gated') == 'all'):
        return False
    return jax.default_backend() == 'tpu' and fps_seed_k0(npoint) > 0


def farthest_point_sample(xyz, npoint: int, valid_mask=None,
                          allow_seed: bool = False):
    """Iterative farthest point sampling.

    Args:
        xyz: (B, N, 3) float coordinates.
        npoint: number of samples (static).
        valid_mask: optional (B, N) bool; invalid points are never selected
            (used for padded point tensors — a capability the CUDA kernel
            lacks; it assumes fully-valid fixed N).
        allow_seed: opt this call site into the TPU seeded-FPS default
            (quality-gated sites only — the SA-module D-FPS dispatch).
            Sites that leave it False always run exact FPS unless
            ``SPSNET_FPS_SEED_SCOPE=all``.
    Returns:
        (B, npoint) int32 sample indices.

    On TPU (and without a mask) this dispatches to the fused Pallas kernel
    (``ops/pallas/fps.py``) — ~7x faster than the XLA loop at IA-SSD sizes
    (12 ms vs 83 ms for B=4, 16384->4096 on v5e). The exact kernel's
    outputs are identical to the XLA loop; when ``allow_seed`` engages the
    seeded approximation (default ON on TPU for gated sites — see
    ``fps_seed_config``) the first ``fps_seed_k0(npoint)`` picks are
    stratified seeds rather than true FPS picks. ``SPSNET_FPS_SEED=0``
    restores exact everywhere; env reads happen at trace time (see
    ``fps_seed_config``).
    """
    # integer-index output: no grad by semantics (like the CUDA kernel),
    # and the Pallas kernel defines no VJP — cut reverse-mode off here
    xyz = jax.lax.stop_gradient(xyz)
    if valid_mask is None and jax.default_backend() == 'tpu':
        from .pallas.fps import (farthest_point_sample_chunked,
                                 farthest_point_sample_pallas,
                                 farthest_point_sample_seeded,
                                 grid_seed_indices)
        # Seeded FPS (default ON at f=0.75/grid on TPU for GATED call
        # sites — see fps_seed_config): the first f*npoint picks are
        # pre-selected seeds with a parallel dist-init prepass, only the
        # rest run the sequential kernel. 'head' mode seeds with the
        # shuffled cloud head (uniform random subsample); 'grid'
        # voxel-stratifies (one rep per occupied cell — holds quality at
        # high f). Seeding also turns off the prefix-nesting shortcut
        # (sa_module.py) — a seeded chain is not FPS-ordered.
        if fps_seeding_active(npoint, allow_seed):
            k0 = fps_seed_k0(npoint)
            _, mode = fps_seed_config()
            if k0 == npoint:
                # frac >= 1.0: pure grid-stratified sampling — one rep per
                # occupied voxel cell, zero sequential FPS steps
                return grid_seed_indices(xyz, npoint)
            seed_idx = None
            if mode == 'grid':
                seed_idx = grid_seed_indices(xyz, k0)
            return farthest_point_sample_seeded(xyz, npoint, k0, seed_idx)
        # SPSNET_FPS_CHUNKS=S > 1 opts into chunked (stratified) FPS —
        # measured FLAT on v5e (issue-bound kernel; see DESIGN.md), kept
        # for other hardware generations; divisibility permitting
        chunks = int(os.environ.get('SPSNET_FPS_CHUNKS', '1'))
        N = xyz.shape[1]
        if chunks > 1 and N % chunks == 0 and npoint % chunks == 0 \
                and npoint // chunks >= 1:
            return farthest_point_sample_chunked(xyz, npoint, chunks)
        return farthest_point_sample_pallas(xyz, npoint)
    return _farthest_point_sample_xla(xyz, npoint, valid_mask)


@functools.partial(jax.jit, static_argnames=('npoint',))
def _farthest_point_sample_xla(xyz, npoint: int, valid_mask=None):
    B, N, _ = xyz.shape
    dist = jnp.full((B, N), 1e10, dtype=jnp.float32)
    if valid_mask is not None:
        # Invalid points keep dist -1 so any valid point beats them at argmax.
        dist = jnp.where(valid_mask, dist, -1.0)
        # Seed at the FIRST VALID point: matches compact-then-FPS (the CUDA
        # kernel's `old = 0` on a compacted subset = its first point).
        idx0 = jnp.argmax(valid_mask, axis=1).astype(jnp.int32)
    else:
        idx0 = jnp.zeros((B,), dtype=jnp.int32)

    def body(i, carry):
        dist, last, out = carry
        last_xyz = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # (B,1,3)
        d2 = jnp.sum((xyz - last_xyz) ** 2, axis=-1)                       # (B,N)
        if valid_mask is not None:
            d2 = jnp.where(valid_mask, d2, -1.0)
        dist = jnp.minimum(dist, d2)
        nxt = jnp.argmax(dist, axis=1).astype(jnp.int32)
        out = out.at[:, i].set(nxt)
        return dist, nxt, out

    out = jnp.zeros((B, npoint), dtype=jnp.int32)
    out = out.at[:, 0].set(idx0)
    if npoint == 1:
        return out
    # First update uses index 0 as the seed (matches CUDA `old = 0`).
    _, _, out = jax.lax.fori_loop(1, npoint, body, (dist, idx0, out))
    return out


@functools.partial(jax.jit, static_argnames=('npoint',))
def farthest_point_sample_with_dist(dist_mat, npoint: int):
    """FPS over a precomputed (B, N, N) squared-distance matrix (F-FPS).

    Replaces ``furthest_point_sampling_with_dist_kernel``
    (``sampling_gpu.cu:256-374``).
    """
    B, N, _ = dist_mat.shape
    dist = jnp.full((B, N), 1e10, dtype=jnp.float32)
    idx0 = jnp.zeros((B,), dtype=jnp.int32)

    def body(i, carry):
        dist, last, out = carry
        d2 = jnp.take_along_axis(dist_mat, last[:, None, None], axis=1)[:, 0, :]
        dist = jnp.minimum(dist, d2)
        nxt = jnp.argmax(dist, axis=1).astype(jnp.int32)
        out = out.at[:, i].set(nxt)
        return dist, nxt, out

    out = jnp.zeros((B, npoint), dtype=jnp.int32)
    out = out.at[:, 0].set(idx0)
    if npoint == 1:
        return out
    _, _, out = jax.lax.fori_loop(1, npoint, body, (dist, idx0, out))
    return out
