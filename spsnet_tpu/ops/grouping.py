"""Neighborhood query + grouping ops.

Replaces ``ball_query_gpu.cu`` / ``group_points_gpu.cu`` with dense masked
formulations. The CUDA ball query scans points in index order, keeps the
first ``nsample`` hits inside the radius, and pads the remainder of the slot
buffer by replicating the *first* hit (``ball_query_gpu.cu:29-44``); empty
neighborhoods leave the zero-initialized buffer → index 0
(``pointnet2_utils.py:241``, ``torch.cuda.IntTensor(...).zero_()``).

TPU-native trick: "first-k hits in index order" == top-k over the integer key
``where(hit, -index, -BIG)`` — a single dense top-k the XLA TPU backend runs as
an optimized partial sort, instead of a serial scan. Padding/empty semantics
are then reproduced with two selects.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .sampling import calc_square_dist

# plain python int: a module-scope jnp constant would initialize a JAX
# backend at import time, before callers (driver entry points, CLIs) can pin
# the platform — the round-1 multichip gate failed exactly this way.
_BIG = 2 ** 30


def _query_d2(ctr, xyz):
    """Squared center-to-point distances (B, chunk, N).

    NON-DIFFERENTIABLE BY DESIGN: every caller reduces this to integer
    neighbor indices (the CUDA ball-query has no grad either), so inputs
    are stop_gradient'ed here. This also keeps reverse-mode away from the
    Pallas kernel, which defines no VJP.

    CPU: direct (a-b)^2 fp32 — bit-matches the CUDA kernel's boundary
    arithmetic (the parity tests' spec).
    TPU: |a|^2+|b|^2-2ab with Precision.HIGHEST — the cross term rides the
    MXU's 6-pass fp32 path, ~2x faster than the diff form at IA-SSD layer-1
    sizes (12.8 vs 23.5 ms piped, B=8 M=4096 N=16384 on v5e) because the
    (B, M, N, 3) broadcast intermediate never materializes. Max |d2| error
    vs fp64 is ~1.5e-3 at 35 m coords — the same order as the CUDA fp32
    diff-form's own rounding at the radius boundary, so only points within
    that band of the radius can flip in/out. (bf16/bf16_3x matmuls are
    unusable: ~1e0 error at these magnitudes.)
    Compile note: an earlier HIGHEST experiment blew compile time >5 min;
    measured again in isolation it compiles in ~15 s — the blowup came from
    a different surrounding fusion, not the 6-pass expansion itself.
    """
    ctr = jax.lax.stop_gradient(ctr)
    xyz = jax.lax.stop_gradient(xyz)
    if jax.default_backend() == 'tpu':
        # Pallas tiled diff-form kernel (ops/pallas/d2.py): exact fp32
        # arithmetic (no MXU rounding band) and 2x the conv-emitter XLA
        # matmul form (4.0 vs 7.9 ms standalone at B=8 M=4096 N=16384).
        from .pallas import d2 as _pallas_d2
        if _pallas_d2.supports(ctr, xyz):
            return _pallas_d2.ball_d2_bf16(ctr, xyz)
        qq = jnp.sum(ctr * ctr, axis=-1)[:, :, None]
        xx = jnp.sum(xyz * xyz, axis=-1)[:, None, :]
        qx = jax.lax.dot_general(
            ctr, xyz, (((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST)
        # store the (B, M, N) transient in bf16: the d2 tensor is written
        # once and read per scale — halving it saves ~20% of the whole ball
        # query (14.1 -> 11.5 ms at layer-1 sizes). Only the radius COMPARE
        # consumes d2, and the bf16 rounding band (~1e-2 relative) flips
        # membership for ~4e-8 of pairs at KITTI scales — a few mm on a
        # 0.2-0.8 m radius, far below sensor noise.
        return (qq + xx - 2.0 * qx).astype(jnp.bfloat16)
    diff = ctr[:, :, None, :] - xyz[:, None, :, :]       # (B, chunk, N, 3)
    return (diff[..., 0] * diff[..., 0] + diff[..., 1] * diff[..., 1]
            + diff[..., 2] * diff[..., 2])


_METHOD_OVERRIDE = None
_RECALL_OVERRIDE = None
_DEFAULT_RECALL = 0.8


def set_first_k_method(method, recall_target=None):
    """Force 'exact'/'approx' first-k globally (None restores 'auto') and
    optionally the approx recall_target. Call ``jax.clear_caches()``
    afterwards — jitted callers cache traces keyed on their own static
    args, not this override. Used by tools/validate_approx_topk.py to
    bound the approx-top-k output delta."""
    global _METHOD_OVERRIDE, _RECALL_OVERRIDE
    _METHOD_OVERRIDE = method
    _RECALL_OVERRIDE = recall_target


def _resolve_method(method):
    if _METHOD_OVERRIDE is not None:
        return _METHOD_OVERRIDE
    env = os.environ.get('SPSNET_FIRSTK')
    if env in ('exact', 'approx'):
        return env
    if method == 'auto':
        # Sort-based exact top-k is ~17x slower than the TPU-optimized
        # approximate PartialReduce at IA-SSD sizes (measured on v5e).
        # The relaxation changes WHICH in-radius points fill the slots;
        # gt-quality metrics (recall/precision vs gt under each method,
        # tools/validate_approx_topk.py) are the accept gate, and
        # SPSNET_FIRSTK=exact opts out at zero code change.
        return 'approx' if jax.default_backend() == 'tpu' else 'exact'
    return method


def _resolve_recall():
    if _RECALL_OVERRIDE is not None:
        return float(_RECALL_OVERRIDE)
    return float(os.environ.get('SPSNET_APPROX_RECALL', _DEFAULT_RECALL))


def _first_k_hits(hit, nsample, method='auto'):
    """(..., N) bool -> (..., nsample) int32 indices of first hits, CUDA-padded.

    method='exact' reproduces the CUDA first-k-in-index-order exactly via
    top-k over the integer key ``where(hit, -index, -BIG)``; 'approx' uses
    ``jax.lax.approx_max_k`` (TPU PartialReduce) — slots may hold slightly
    later hits, all still inside the radius.
    """
    method = _resolve_method(method)
    n = hit.shape[-1]
    idx_n = jnp.arange(n, dtype=jnp.int32)
    if method == 'approx':
        key = jnp.where(hit, -idx_n.astype(jnp.float32), -jnp.float32(2e30))
        # recall_target 0.8 halves the PartialReduce aggregation cost vs the
        # 0.95 default (11 vs 24 ms for the IA-SSD layer-1 MSG pair on v5e);
        # a missed early index just lets a later in-radius point take the
        # slot. Override via SPSNET_APPROX_RECALL / set_first_k_method.
        vals, _ = jax.lax.approx_max_k(key, nsample,
                                       recall_target=_resolve_recall())
        idx = (-vals).astype(jnp.int32)
        valid = vals > -1e30
    else:
        key = jnp.where(hit, -idx_n, -_BIG)        # top-k => smallest indices
        vals, _ = jax.lax.top_k(key, nsample)      # sorted desc => idx ascending
        idx = -vals
        valid = vals > -_BIG
    any_hit = valid[..., 0:1]
    first = idx[..., 0:1]
    return jnp.where(valid, idx, jnp.where(any_hit, first, 0)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('nsample', 'chunk', 'method'))
def ball_query(radius: float, nsample: int, xyz, new_xyz, chunk: int = 1024,
               method: str = 'auto'):
    """For each center, indices of the first <=nsample points within radius.

    Args:
        radius: ball radius (strict ``d2 < r^2`` like the CUDA kernel).
        nsample: slots per center (static).
        xyz: (B, N, 3) support points.
        new_xyz: (B, M, 3) query centers.
        chunk: centers processed per scan step (bounds the (B, chunk, N)
            distance tile held in memory).
    Returns:
        (B, M, nsample) int32 indices into N.
    """
    return _ball_query_impl(xyz, new_xyz, radius * radius, None, nsample, chunk, method)


@functools.partial(jax.jit, static_argnames=('nsample', 'chunk', 'method'))
def ball_query_dilated(min_radius: float, max_radius: float, nsample: int,
                       xyz, new_xyz, chunk: int = 1024, method: str = 'auto'):
    """Annulus query ``min_r^2 <= d2 < max_r^2`` (plus exact-center hits).

    Mirrors ``ball_query_dilated_kernel_fast`` (``ball_query_gpu.cu:70-137``)
    including its ``d2 == 0`` always-hit branch.
    """
    return _ball_query_impl(xyz, new_xyz, max_radius * max_radius,
                            min_radius * min_radius, nsample, chunk, method)


def _effective_chunk(B, M, N, chunk):
    """On TPU, skip chunking when the (B, M, N) d2 transient fits easily in
    HBM — the lax.map chunk loop serializes and adds copy traffic (the
    chunking exists to bound memory, not for speed)."""
    if jax.default_backend() == 'tpu' and B * M * N <= 2 ** 30:
        return M
    return min(chunk, M)


def _ball_query_impl(xyz, new_xyz, r2_max, r2_min, nsample, chunk, method='auto'):
    B, M, _ = new_xyz.shape
    chunk = _effective_chunk(B, M, xyz.shape[1], chunk)
    pad = (-M) % chunk
    centers = jnp.pad(new_xyz, ((0, 0), (0, pad), (0, 0)))
    n_chunks = centers.shape[1] // chunk
    centers = centers.reshape(B, n_chunks, chunk, 3).transpose(1, 0, 2, 3)

    def one_chunk(ctr):
        d2 = _query_d2(ctr, xyz)
        if r2_min is None:
            hit = d2 < r2_max
        else:
            # CUDA's always-hit branch for the exact center is `d2 == 0`;
            # the TPU MXU/bf16 d2 rounds self-distances to ~+/-5e-3, so the
            # self test needs a tolerance there (annulus r2_min >= 0.04 in
            # every config, so no genuine annulus point can be caught)
            self_eps = 5e-3 if jax.default_backend() == 'tpu' else 0.0
            hit = ((d2 >= r2_min) & (d2 < r2_max)) | (d2 <= self_eps)
        return _first_k_hits(hit, nsample, method=method)

    if n_chunks == 1:
        return one_chunk(centers[0])[:, :M]
    out = jax.lax.map(one_chunk, centers)          # (n_chunks, B, chunk, S)
    out = out.transpose(1, 0, 2, 3).reshape(B, n_chunks * chunk, nsample)
    return out[:, :M]


def gather_points(points, idx):
    """(B, N, C) gathered by (B, M) -> (B, M, C).

    Channel-last equivalent of ``gather_operation`` (``sampling_gpu.cu:8-83``);
    the backward scatter-add comes for free from JAX autodiff of the gather.
    """
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


def group_points(points, idx):
    """(B, N, C) grouped by (B, M, S) -> (B, M, S, C).

    Channel-last equivalent of ``group_points_gpu.cu:53-92``.
    """
    B, M, S = idx.shape
    flat = idx.reshape(B, M * S).astype(jnp.int32)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(B, M, S, points.shape[-1])


@functools.partial(jax.jit, static_argnames=('nsamples', 'chunk', 'method'))
def ball_query_multi(radii, nsamples, xyz, new_xyz, chunk: int = 2048,
                     method: str = 'auto'):
    """Multi-scale ball query sharing ONE distance computation.

    The MSG layers query the same (centers x points) distances at several
    radii (``RADIUS_LIST`` pairs); computing d2 once halves the dominant
    bandwidth cost vs calling ``ball_query`` per scale.

    Returns a tuple of (B, M, nsamples[i]) index arrays.
    """
    radii = tuple(radii)
    nsamples = tuple(nsamples)
    B, M, _ = new_xyz.shape
    chunk = _effective_chunk(B, M, xyz.shape[1], chunk)
    pad = (-M) % chunk
    centers = jnp.pad(new_xyz, ((0, 0), (0, pad), (0, 0)))
    n_chunks = centers.shape[1] // chunk
    centers = centers.reshape(B, n_chunks, chunk, 3).transpose(1, 0, 2, 3)

    def one_chunk(ctr):
        d2 = _query_d2(ctr, xyz)
        outs = []
        for r, s in zip(radii, nsamples):
            outs.append(_first_k_hits(d2 < r * r, s, method=method))
        return tuple(outs)

    if n_chunks == 1:
        return tuple(o[:, :M] for o in one_chunk(centers[0]))
    outs = jax.lax.map(one_chunk, centers)
    result = []
    for i, s in enumerate(nsamples):
        o = outs[i].transpose(1, 0, 2, 3).reshape(B, n_chunks * chunk, s)
        result.append(o[:, :M])
    return tuple(result)


def query_and_group(radius, nsample, xyz, new_xyz, features=None, use_xyz=True,
                    min_radius=None, chunk=1024, idx=None):
    """Ball query + grouping with center-relative coords.

    Channel-last equivalent of ``QueryAndGroup.forward``
    (``pointnet2_utils.py:289-322``): grouped xyz is made relative to the
    center and concatenated before the grouped features.

    Returns:
        (B, M, S, 3 + C) if use_xyz and features is not None,
        else (B, M, S, 3) or (B, M, S, C).

    ``idx`` short-circuits the query (e.g. precomputed by ``ball_query_multi``).
    """
    if idx is None:
        if min_radius is None:
            idx = ball_query(radius, nsample, xyz, new_xyz, chunk=chunk)
        else:
            idx = ball_query_dilated(min_radius, radius, nsample, xyz, new_xyz,
                                     chunk=chunk)
    if features is not None:
        # ONE gather for xyz+features: TPU dynamic-gather cost is per ROW
        # (~8 us / 1k rows regardless of row width, measured on v5e), so two
        # separate gathers of the same 1.5M neighbor rows double the cost
        grouped = group_points(
            jnp.concatenate([xyz, features], axis=-1), idx)
        grouped_xyz = grouped[..., :3] - new_xyz[:, :, None, :]
        grouped_features = grouped[..., 3:]
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_features], axis=-1), idx
        return grouped_features, idx
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    assert use_xyz, 'cannot have no features and not use xyz'
    return grouped_xyz, idx


def zero_empty_balls(grouped, radius):
    """Zero grouped rows whose ball found NO in-radius point — the stack
    QueryAndGroup semantics (``pointnet2_stack/pointnet2_utils.py:139-143``:
    ``grouped[empty_ball_mask] = 0`` BEFORE the MLP). The batch-family CUDA
    kernels have no such mask (they gather point 0), so this applies only
    where the reference uses the stack ops (VSA, RoI-grid pool).

    grouped: (B, M, S, 3 + C) from ``query_and_group(use_xyz=True)`` —
    slot 0 holds the FIRST in-radius hit when one exists, so the ball is
    empty iff slot 0's center-relative xyz is outside the radius (strict
    ``d2 < r^2``, matching the query).
    """
    slot0 = grouped[..., 0, :3]
    empty = jnp.sum(slot0 * slot0, axis=-1) >= jnp.float32(radius) ** 2
    return jnp.where(empty[..., None, None], 0.0, grouped)


_MSG_SHARED_OVERRIDE = None


def set_msg_shared(enabled):
    """Force the shared-gather MSG path on/off (None restores 'auto' =
    TPU-with-approx only). Call ``jax.clear_caches()`` afterwards. Used by
    tests (force-enable on CPU) and tools/validate_approx_topk.py."""
    global _MSG_SHARED_OVERRIDE
    _MSG_SHARED_OVERRIDE = enabled


def msg_shared_enabled(dilated: bool, n_scales: int) -> bool:
    """Whether the multi-scale grouping should share ONE gather across
    scales (see ``msg_shared_group``)."""
    if dilated or n_scales < 2:
        return False
    if _MSG_SHARED_OVERRIDE is not None:
        return _MSG_SHARED_OVERRIDE
    return jax.default_backend() == 'tpu' and _resolve_method('auto') == 'approx'


def msg_shared_group(radii, nsamples, xyz, new_xyz, features=None,
                     use_xyz=True):
    """Multi-scale grouping with ONE ball query and ONE neighbor gather.

    TPU fast path: the dynamic-gather cost is per ROW (~6 us / 1k rows on
    v5e regardless of width), so gathering each MSG scale separately pays
    for the same neighbors twice. Instead gather once at
    ``(max(radii), max(nsamples))`` and reconstruct each smaller scale by
    masking the gathered candidates with its own radius at the pool:

    - the scale with the max radius keeps exact CUDA semantics (its first-k
      hits are slots ``0..nsample`` of the shared gather — same hit set,
      same scan order);
    - a smaller-radius scale pools over *gathered candidates inside its
      radius* (plus the nearest candidate as the empty-ball fallback)
      instead of *its own first-k*. This changes WHICH in-radius points
      participate — the same relaxation class as ``approx_max_k``
      (max-pooled grouping is slot-insensitive), measured end-to-end by
      ``tools/validate_approx_topk.py``.

    Returns:
        grouped: (B, M, Kmax, 3 + C) center-relative grouped tensor,
        valids: per-scale list, each None (no mask needed: exact path) or
            (B, M, Kmax) bool pool mask.
    """
    radii = tuple(radii)
    nsamples = tuple(nsamples)
    kmax = max(nsamples)
    rmax = max(radii)
    idx = ball_query(rmax, kmax, xyz, new_xyz)
    grouped, _ = query_and_group(rmax, kmax, xyz, new_xyz, features,
                                 use_xyz=True, idx=idx)
    rel = grouped[..., :3]
    d2g = jnp.sum(rel * rel, axis=-1)                     # (B, M, Kmax)
    # nearest gathered candidate: always a valid pool member, so a scale
    # whose radius catches no candidate still pools over one real point
    # (the CUDA kernel pads empty balls with point 0 instead — documented
    # deviation, reachable only for vote-center queries)
    nearest = d2g == jnp.min(d2g, axis=-1, keepdims=True)
    slot = jnp.arange(kmax, dtype=jnp.int32)
    valids = []
    for r, ns in zip(radii, nsamples):
        if r == rmax:
            # same hit set and scan order as a direct (r, ns) query:
            # keep the first ns slots (== CUDA first-k), pad slots of the
            # shared gather replicate the first hit -> harmless under max
            valids.append(None if ns == kmax else jnp.broadcast_to(
                (slot < ns)[None, None, :], d2g.shape))
        else:
            valids.append((d2g < r * r) | nearest)
    if not use_xyz:
        grouped = grouped[..., 3:]
    return grouped, valids


def masked_pool(h, valid, method='max_pool'):
    """Pool (B, M, S, C) over S with an optional (B, M, S) validity mask."""
    if valid is None:
        if method == 'max_pool':
            return jnp.max(h, axis=2)
        return jnp.mean(h, axis=2)
    v = valid[..., None]
    if method == 'max_pool':
        return jnp.max(jnp.where(v, h, -jnp.inf), axis=2)
    cnt = jnp.maximum(jnp.sum(v, axis=2), 1)
    return jnp.sum(jnp.where(v, h, 0.0), axis=2) / cnt


def group_all(xyz, features=None, use_xyz=True):
    """``GroupAll`` equivalent: one group containing every point."""
    grouped_xyz = xyz[:, None, :, :]
    if features is not None:
        grouped = features[:, None, :, :]
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped], axis=-1)
        return grouped
    return grouped_xyz
