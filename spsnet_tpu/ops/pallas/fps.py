"""Farthest point sampling as a single fused Pallas kernel.

Replaces the XLA ``fori_loop`` FPS (``ops/sampling.py``) with one kernel per
batch element that keeps the running min-distance vector resident in VMEM for
the whole M-step argmax chain — the CUDA kernel's strategy
(``sampling_gpu.cu:93-209``: shared-memory reduction per step) mapped to the
TPU: distance update + tree max-reduction become (R, 128) VPU ops.

Semantics identical to ``farthest_point_sample``: seed index 0, ``min`` update,
lowest-index tie-break, padding lanes never selected.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_BIG_F = 1e10
_BIG_I = 2 ** 30


def _fps_kernel(nvalid_ref, x_ref, y_ref, z_ref, out_ref, dist_ref):
    # out_ref block is (1, Mr, 128): indices are written via full-row
    # read-modify-write (Mosaic cannot store scalars to VMEM).
    n_valid = nvalid_ref[0]
    R = x_ref.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 1)
    flat_ids = row_ids * _LANE + lane_ids
    valid = flat_ids < n_valid
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)

    dist_ref[:] = jnp.where(valid, _BIG_F, -1.0)

    def write(j, val):
        r = j // _LANE
        c = j % _LANE
        row = out_ref[0, pl.ds(r, 1), :]
        out_ref[0, pl.ds(r, 1), :] = jnp.where(lane_row == c, val, row)

    write(0, jnp.int32(0))

    x = x_ref[0]
    y = y_ref[0]
    z = z_ref[0]

    def body(j, carry):
        x1, y1, z1 = carry
        d2 = (x - x1) ** 2 + (y - y1) ** 2 + (z - z1) ** 2
        new_dist = jnp.minimum(dist_ref[:], jnp.where(valid, d2, -1.0))
        dist_ref[:] = new_dist
        m = jnp.max(new_dist)
        nxt = jnp.min(jnp.where(new_dist == m, flat_ids, jnp.int32(_BIG_I)))
        write(j, nxt)
        # coords of the selected point via masked sums (Mosaic cannot do
        # dynamic scalar loads from VMEM)
        sel = flat_ids == nxt
        nx = jnp.sum(jnp.where(sel, x, 0.0))
        ny = jnp.sum(jnp.where(sel, y, 0.0))
        nz = jnp.sum(jnp.where(sel, z, 0.0))
        return nx, ny, nz

    seed = (x_ref[0, 0, 0], y_ref[0, 0, 0], z_ref[0, 0, 0])
    # NOTE: manual unrolling (tried 5x) cuts ~10% runtime but balloons the
    # Mosaic compile from ~1 min to many minutes — not worth it.
    jax.lax.fori_loop(1, out_ref.shape[1] * _LANE, body, seed, unroll=False)


def _fps_kernel_batched(nvalid_ref, x_ref, y_ref, z_ref, out_ref, dist_ref):
    """All batch rows advance together: one M-step loop instead of B of them.
    The loop is latency-bound, so batching the per-step VPU work is ~free.

    EXPERIMENTAL: correct in interpret mode, but the current Mosaic release
    cannot lower the (B, 1, 1)-per-batch broadcast patterns ("Broadcast in
    both sublanes and lanes"); not dispatched until the toolchain catches up.
    The per-batch grid kernel below is the production path.
    """
    n_valid = nvalid_ref[0]
    B, R = x_ref.shape[0], x_ref.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (B, R, _LANE), 1)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (B, R, _LANE), 2)
    flat_ids = row_ids * _LANE + lane_ids
    valid = flat_ids < n_valid
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _LANE), 2)

    dist_ref[:] = jnp.where(valid, _BIG_F, -1.0)

    x = x_ref[:]
    y = y_ref[:]
    z = z_ref[:]

    def write(j, vals):
        """vals: (B, 1, 1) int32 written to flat output slot j of every row."""
        r = j // _LANE
        c = j % _LANE
        rows = out_ref[:, pl.ds(r, 1), :]            # (B, 1, 128)
        vals_row = jnp.broadcast_to(vals, (rows.shape[0], 1, _LANE))
        out_ref[:, pl.ds(r, 1), :] = jnp.where(
            jnp.broadcast_to(lane_row, vals_row.shape) == c, vals_row, rows)

    write(0, jnp.zeros((B, 1, 1), jnp.int32))

    def bcast(a):
        # (B, 1, 1) -> (B, R, 128) in two stages: Mosaic cannot broadcast
        # sublanes and lanes in one op
        a = jnp.broadcast_to(a, (B, 1, _LANE))
        return jnp.broadcast_to(a, (B, R, _LANE))

    def body(j, carry):
        x1, y1, z1 = carry                            # each (B, 1, 1)
        d2 = (x - bcast(x1)) ** 2 + (y - bcast(y1)) ** 2 + (z - bcast(z1)) ** 2
        new_dist = jnp.minimum(dist_ref[:], jnp.where(valid, d2, -1.0))
        dist_ref[:] = new_dist
        # single-axis reductions only: multi-axis reduce lowers through a
        # reshape that crashes Mosaic's layout inference
        def reduce2(op, a):
            return op(op(a, axis=1, keepdims=True), axis=2, keepdims=True)

        m = reduce2(jnp.max, new_dist)                           # (B, 1, 1)
        eq = new_dist == bcast(m)
        nxt = reduce2(jnp.min, jnp.where(eq, flat_ids, jnp.int32(_BIG_I)))
        write(j, nxt)
        sel = flat_ids == bcast(nxt)
        nx = reduce2(jnp.sum, jnp.where(sel, x, 0.0))
        ny = reduce2(jnp.sum, jnp.where(sel, y, 0.0))
        nz = reduce2(jnp.sum, jnp.where(sel, z, 0.0))
        return nx, ny, nz

    seed = (x[:, 0:1, 0:1], y[:, 0:1, 0:1], z[:, 0:1, 0:1])
    jax.lax.fori_loop(1, out_ref.shape[1] * _LANE, body, seed, unroll=False)


@functools.partial(jax.jit, static_argnames=('npoint', 'interpret'))
def farthest_point_sample_pallas_batched(xyz, npoint: int,
                                         interpret: bool = False):
    """Single-program batched variant of ``farthest_point_sample_pallas``."""
    B, N, _ = xyz.shape
    pad = (-N) % _LANE
    R = (N + pad) // _LANE
    xyz_p = jnp.pad(xyz, ((0, 0), (0, pad), (0, 0)))
    planes = [xyz_p[..., i].reshape(B, R, _LANE) for i in range(3)]
    n_valid = jnp.full((1,), N, dtype=jnp.int32)
    Mr = -(-npoint // _LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((B, R, _LANE), lambda g, nv: (0, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((B, Mr, _LANE), lambda g, nv: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, R, _LANE), jnp.float32)],
    )
    out = pl.pallas_call(
        _fps_kernel_batched,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Mr, _LANE), jnp.int32),
        interpret=interpret,
    )(n_valid, *planes)
    return out.reshape(B, Mr * _LANE)[:, :npoint]


def _fps_kernel_unrolled_b(nvalid_ref, x_ref, y_ref, z_ref, out_ref,
                           dist_ref, *, no_padding=False):
    """ALL batch rows in ONE step loop, python-unrolled over B.

    The per-batch grid kernel pays the full M-step dependency chain B times
    (grid steps run sequentially on one core). Here each fori step advances
    every batch's chain once using the exact (R, 128) per-batch ops of
    ``_fps_kernel`` on static slices — no (B, 1, 1) broadcasts or multi-axis
    reduces, so Mosaic lowers it where ``_fps_kernel_batched`` failed. The B
    independent chains interleave in the VPU pipeline: measured 2.6x faster
    than the grid kernel at B=8, 16384->4096 on v5e (8.5 vs 21.7 ms).
    """
    n_valid = nvalid_ref[0]
    B = x_ref.shape[0]
    R = x_ref.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 1)
    flat_ids = row_ids * _LANE + lane_ids
    valid = flat_ids < n_valid
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)

    def mask_pad(d2):
        # static specialization: with N % 128 == 0 every lane is a real
        # point and the per-step validity select is dead weight
        return d2 if no_padding else jnp.where(valid, d2, -1.0)

    for b in range(B):
        dist_ref[b] = jnp.full((R, _LANE), _BIG_F) if no_padding \
            else jnp.where(valid, _BIG_F, -1.0)

    def write(b, j, val):
        r = j // _LANE
        c = j % _LANE
        row = out_ref[b, pl.ds(r, 1), :]
        out_ref[b, pl.ds(r, 1), :] = jnp.where(lane_row == c, val, row)

    for b in range(B):
        write(b, 0, jnp.int32(0))

    def step(j, carry):
        out = []
        for b in range(B):
            x1, y1, z1 = carry[b]
            x = x_ref[b]
            y = y_ref[b]
            z = z_ref[b]
            d2 = (x - x1) ** 2 + (y - y1) ** 2 + (z - z1) ** 2
            nd = jnp.minimum(dist_ref[b], mask_pad(d2))
            dist_ref[b] = nd
            m = jnp.max(nd)
            nxt = jnp.min(jnp.where(nd == m, flat_ids, jnp.int32(_BIG_I)))
            write(b, j, nxt)
            # coords of the selected point: dynamic-slice its (1, 128) row
            # (pl.ds with a traced sublane index is supported) + a lane-mask
            # reduce — far cheaper than three full (R, 128) masked sums
            r = nxt // _LANE
            c = nxt % _LANE
            lane_sel = lane_row == c
            out.append((
                jnp.sum(jnp.where(lane_sel, x_ref[b, pl.ds(r, 1), :], 0.0)),
                jnp.sum(jnp.where(lane_sel, y_ref[b, pl.ds(r, 1), :], 0.0)),
                jnp.sum(jnp.where(lane_sel, z_ref[b, pl.ds(r, 1), :], 0.0))))
        return tuple(out)

    seed = tuple((x_ref[b, 0, 0], y_ref[b, 0, 0], z_ref[b, 0, 0])
                 for b in range(B))
    # NOTE: Mosaic fori supports unroll 1/full only; a manual 2-step body
    # was measured at parity (15.8 vs 15.7 ms) — the cost is the per-step
    # d2 -> min -> argmax dependency chain, not loop management
    jax.lax.fori_loop(1, out_ref.shape[1] * _LANE, step, seed, unroll=False)


def _fps_kernel_unrolled_b_v2(nvalid_ref, x_ref, y_ref, z_ref, out_ref,
                              dist_ref, *, no_padding=False):
    """Hierarchical-argmax variant of ``_fps_kernel_unrolled_b``
    (EXPERIMENTAL, not dispatched — measured SLOWER).

    Hypothesis: the baseline step runs TWO full (R, 128) reduction passes
    back-to-back (global max, then eq + min-index); replacing them with one
    lane-reduce to per-row maxima (R, 1), tiny (R, 1) reduces, and a single
    dynamically-sliced (1, 128) row should shorten the serial chain.
    Outcome on v5e (B=8, 16384->4096): 16.2 ms vs 14.9 ms baseline, outputs
    bit-identical. The (R, 1) single-lane layouts reduce over sublanes at
    1/128th VPU width and the extra dynamic slice adds serial hops — the
    step is bound by the cross-step coords->d2->reduce->select dependency
    LATENCY, not by reduction work, so removing a full pass buys nothing.
    Kept for reference next to the other negative results in this file.
    Same semantics incl. the lowest-flat-index tie-break (min row first,
    then min lane within it, row-major flat ids).
    """
    n_valid = nvalid_ref[0]
    B = x_ref.shape[0]
    R = x_ref.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 1)
    flat_ids = row_ids * _LANE + lane_ids
    valid = flat_ids < n_valid
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    rid_col = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)

    def mask_pad(d2):
        return d2 if no_padding else jnp.where(valid, d2, -1.0)

    for b in range(B):
        dist_ref[b] = jnp.full((R, _LANE), _BIG_F) if no_padding \
            else jnp.where(valid, _BIG_F, -1.0)

    def write(b, j, val):
        r = j // _LANE
        c = j % _LANE
        row = out_ref[b, pl.ds(r, 1), :]
        out_ref[b, pl.ds(r, 1), :] = jnp.where(lane_row == c, val, row)

    for b in range(B):
        write(b, 0, jnp.int32(0))

    def step(j, carry):
        out = []
        for b in range(B):
            x1, y1, z1 = carry[b]
            x = x_ref[b]
            y = y_ref[b]
            z = z_ref[b]
            d2 = (x - x1) ** 2 + (y - y1) ** 2 + (z - z1) ** 2
            nd = jnp.minimum(dist_ref[b], mask_pad(d2))
            dist_ref[b] = nd
            rowmax = jnp.max(nd, axis=1, keepdims=True)          # (R, 1)
            m = jnp.max(rowmax, axis=0, keepdims=True)[0, 0]     # scalar
            r_star = jnp.min(jnp.where(rowmax == m, rid_col,
                                       jnp.int32(_BIG_I)),
                             axis=0, keepdims=True)[0, 0]
            win = dist_ref[b, pl.ds(r_star, 1), :]               # (1, 128)
            c_star = jnp.min(jnp.where(win == m, lane_row,
                                       jnp.int32(_BIG_I)))
            nxt = r_star * _LANE + c_star
            write(b, j, nxt)
            lane_sel = lane_row == c_star
            out.append((
                jnp.sum(jnp.where(lane_sel, x_ref[b, pl.ds(r_star, 1), :], 0.0)),
                jnp.sum(jnp.where(lane_sel, y_ref[b, pl.ds(r_star, 1), :], 0.0)),
                jnp.sum(jnp.where(lane_sel, z_ref[b, pl.ds(r_star, 1), :], 0.0))))
        return tuple(out)

    seed = tuple((x_ref[b, 0, 0], y_ref[b, 0, 0], z_ref[b, 0, 0])
                 for b in range(B))
    jax.lax.fori_loop(1, out_ref.shape[1] * _LANE, step, seed, unroll=False)


@functools.partial(jax.jit, static_argnames=('npoint', 'interpret'))
def _fps_pallas_allbatch_v2(xyz, npoint: int, interpret: bool = False):
    """One-program dispatch of ``_fps_kernel_unrolled_b_v2``."""
    B, N, _ = xyz.shape
    pad = (-N) % _LANE
    R = (N + pad) // _LANE
    xyz_p = jnp.pad(xyz, ((0, 0), (0, pad), (0, 0)))
    planes = [xyz_p[..., i].reshape(B, R, _LANE) for i in range(3)]
    n_valid = jnp.full((1,), N, dtype=jnp.int32)
    Mr = -(-npoint // _LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((B, R, _LANE), lambda g, nv: (0, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((B, Mr, _LANE), lambda g, nv: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, R, _LANE), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_fps_kernel_unrolled_b_v2, no_padding=(pad == 0)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Mr, _LANE), jnp.int32),
        interpret=interpret,
    )(n_valid, *planes)
    return out.reshape(B, Mr * _LANE)[:, :npoint]


@functools.partial(jax.jit, static_argnames=('npoint', 'interpret'))
def _fps_pallas_allbatch(xyz, npoint: int, interpret: bool = False):
    """One-program dispatch of ``_fps_kernel_unrolled_b``."""
    B, N, _ = xyz.shape
    pad = (-N) % _LANE
    R = (N + pad) // _LANE
    xyz_p = jnp.pad(xyz, ((0, 0), (0, pad), (0, 0)))
    planes = [xyz_p[..., i].reshape(B, R, _LANE) for i in range(3)]
    n_valid = jnp.full((1,), N, dtype=jnp.int32)
    Mr = -(-npoint // _LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((B, R, _LANE), lambda g, nv: (0, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((B, Mr, _LANE), lambda g, nv: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, R, _LANE), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_fps_kernel_unrolled_b, no_padding=(pad == 0)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Mr, _LANE), jnp.int32),
        interpret=interpret,
    )(n_valid, *planes)
    return out.reshape(B, Mr * _LANE)[:, :npoint]


@functools.partial(jax.jit, static_argnames=('npoint', 'interpret'))
def farthest_point_sample_pallas(xyz, npoint: int, interpret: bool = False):
    """(B, N, 3) -> (B, npoint) int32; N and npoint padded to 128 lanes.

    Dispatch: the unrolled-B single-program kernel when the working set
    fits comfortably in VMEM (4 x (B, R, 128) fp32 planes), else the
    per-batch grid kernel.
    """
    B, N, _ = xyz.shape
    if B > 1 and B * (-(-N // _LANE)) * _LANE * 4 * 4 <= 12 * 2 ** 20:
        return _fps_pallas_allbatch(xyz, npoint, interpret=interpret)
    return _fps_pallas_grid(xyz, npoint, interpret=interpret)


def _fps_kernel_seeded(scalars_ref, x_ref, y_ref, z_ref, d0_ref, sidx_ref,
                       out_ref, dist_ref, *, k0, no_padding=False):
    """``_fps_kernel_unrolled_b`` with ``k0`` points pre-selected as seeds:
    the min-dist plane starts from ``d0_ref`` (min d2 to the seeds,
    computed OUTSIDE the kernel in parallel), seed indices are copied from
    ``sidx_ref`` (arange rows for head seeding, arbitrary for grid
    seeding), and the step loop runs only the remaining ``M - k0`` FPS
    completions. ``scalars_ref`` carries [n_valid, last-seed flat index per
    batch]. The kernel is issue-bound per chain-step body (see the
    chunked-FPS negative result), so time scales with (M - k0) / M."""
    n_valid = scalars_ref[0]
    B = x_ref.shape[0]
    R = x_ref.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 1)
    flat_ids = row_ids * _LANE + lane_ids
    valid = flat_ids < n_valid
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)

    def mask_pad(d2):
        return d2 if no_padding else jnp.where(valid, d2, -1.0)

    for b in range(B):
        dist_ref[b] = d0_ref[b] if no_padding \
            else jnp.where(valid, d0_ref[b], -1.0)

    def write(b, j, val):
        r = j // _LANE
        c = j % _LANE
        row = out_ref[b, pl.ds(r, 1), :]
        out_ref[b, pl.ds(r, 1), :] = jnp.where(lane_row == c, val, row)

    # seed indices fill whole output rows (k0 % 128 == 0)
    for b in range(B):
        for r in range(k0 // _LANE):
            out_ref[b, pl.ds(r, 1), :] = sidx_ref[b, pl.ds(r, 1), :]

    def step(j, carry):
        out = []
        for b in range(B):
            x1, y1, z1 = carry[b]
            x = x_ref[b]
            y = y_ref[b]
            z = z_ref[b]
            d2 = (x - x1) ** 2 + (y - y1) ** 2 + (z - z1) ** 2
            nd = jnp.minimum(dist_ref[b], mask_pad(d2))
            dist_ref[b] = nd
            m = jnp.max(nd)
            nxt = jnp.min(jnp.where(nd == m, flat_ids, jnp.int32(_BIG_I)))
            write(b, j, nxt)
            r = nxt // _LANE
            c = nxt % _LANE
            lane_sel = lane_row == c
            out.append((
                jnp.sum(jnp.where(lane_sel, x_ref[b, pl.ds(r, 1), :], 0.0)),
                jnp.sum(jnp.where(lane_sel, y_ref[b, pl.ds(r, 1), :], 0.0)),
                jnp.sum(jnp.where(lane_sel, z_ref[b, pl.ds(r, 1), :], 0.0))))
        return tuple(out)

    # carry = last seed's coords, extracted with the same (dynamic row,
    # lane select) pattern the step loop uses; its d2 is already folded
    # into d0 (the first step recomputes it — the min update is idempotent)
    seed = []
    for b in range(B):
        idx = scalars_ref[1 + b]
        r0 = idx // _LANE
        lane_sel = lane_row == idx % _LANE
        seed.append(tuple(
            jnp.sum(jnp.where(lane_sel, ref[b, pl.ds(r0, 1), :], 0.0))
            for ref in (x_ref, y_ref, z_ref)))
    jax.lax.fori_loop(k0, out_ref.shape[1] * _LANE, step, tuple(seed),
                      unroll=False)


def _seed_min_kernel(px_ref, py_ref, pz_ref, sx_ref, sy_ref, sz_ref, o_ref):
    """One (seeds BM, points BN) diff-form d2 tile, min-reduced over seeds
    and min-accumulated into the output across the innermost grid dim
    (same register-resident FMA pattern as ``d2.py``)."""
    k = pl.program_id(2)
    BM = sx_ref.shape[1]
    BN = px_ref.shape[2]

    def axis(p_ref, s_ref):
        p = jnp.broadcast_to(p_ref[0], (BM, BN))
        s = jnp.broadcast_to(s_ref[0], (BM, BN))
        d = p - s
        return d * d

    d2 = axis(px_ref, sx_ref) + axis(py_ref, sy_ref) + axis(pz_ref, sz_ref)
    m = jnp.min(d2, axis=0, keepdims=True)              # (1, BN)

    @pl.when(k == 0)
    def _init():
        o_ref[0] = m

    @pl.when(k > 0)
    def _acc():
        o_ref[0] = jnp.minimum(o_ref[0], m)


@functools.partial(jax.jit, static_argnames=('interpret',))
def _seed_min_d2(xyz_p, seed_xyz, interpret: bool = False):
    """(B, Np, 3), (B, k0, 3) seeds -> (B, Np) min squared distance to the
    seeds. Fused Pallas kernel: no (B, Np, k0) transient ever touches HBM
    (the XLA scan/matmul forms measured 6.4 ms at B=8 Np=16384 k0=2048;
    this kernel ~0.6 ms)."""
    B, Np, _ = xyz_p.shape
    k0 = seed_xyz.shape[1]
    bn = min(2048, Np)
    bm = min(256, k0)
    if Np % bn or k0 % bm:
        bn, bm = _LANE, _LANE               # both 128-multiples by contract
    p_planes = [xyz_p[..., i][:, None, :] for i in range(3)]   # (B, 1, Np)
    s_planes = [seed_xyz[..., i][..., None] for i in range(3)]  # (B, k0, 1)
    out = pl.pallas_call(
        _seed_min_kernel,
        grid=(B, Np // bn, k0 // bm),
        in_specs=[pl.BlockSpec((1, 1, bn), lambda b, n, k: (b, 0, n))] * 3
        + [pl.BlockSpec((1, bm, 1), lambda b, n, k: (b, k, 0))] * 3,
        out_specs=pl.BlockSpec((1, 1, bn), lambda b, n, k: (b, 0, n)),
        out_shape=jax.ShapeDtypeStruct((B, 1, Np), jnp.float32),
        interpret=interpret,
    )(*p_planes, *s_planes)
    return out[:, 0, :]


@functools.partial(jax.jit, static_argnames=('npoint', 'k0', 'interpret'))
def farthest_point_sample_seeded(xyz, npoint: int, k0: int, seed_idx=None,
                                 interpret: bool = False):
    """Seeded FPS: pre-select ``k0`` points as seeds, initialize the
    min-dist plane against them with one PARALLEL prepass, and run only
    ``npoint - k0`` sequential FPS completion steps that fill the seed
    set's coverage holes. Returns (B, npoint): the seed indices followed
    by the completion picks in selection order.

    ``seed_idx=None`` seeds with the first ``k0`` points (the cloud is
    shuffled upstream, so they are a uniform random subsample); an
    explicit (B, k0) int array seeds arbitrarily — see
    ``grid_seed_indices`` for the voxel-stratified selector.

    Approximation contract mirrors the approx-top-k one: quality-vs-gt is
    the accept gate (tools/validate_approx_topk.py --fps / --fps-train),
    SPSNET_FPS_SEED opts in/out. Requires k0 % 128 == 0 and
    0 < k0 < npoint <= N.
    """
    B, N, _ = xyz.shape
    if not (0 < k0 < npoint and k0 % _LANE == 0):
        raise ValueError(f'need 0 < k0 < npoint, k0 % 128 == 0; '
                         f'got k0={k0}, npoint={npoint}')
    if seed_idx is None:
        seed_idx = jnp.broadcast_to(jnp.arange(k0, dtype=jnp.int32)[None],
                                    (B, k0))
        seed_xyz = xyz[:, :k0]
    else:
        seed_idx = seed_idx.astype(jnp.int32)
        seed_xyz = jnp.take_along_axis(xyz, seed_idx[..., None], axis=1)
    pad = (-N) % _LANE
    R = (N + pad) // _LANE
    xyz_p = jnp.pad(xyz, ((0, 0), (0, pad), (0, 0)))
    d0 = _seed_min_d2(xyz_p, seed_xyz,
                      interpret=interpret).reshape(B, R, _LANE)
    planes = [xyz_p[..., i].reshape(B, R, _LANE) for i in range(3)]
    # scalar prefetch row: [n_valid, last-seed flat index per batch]
    scalars = jnp.concatenate([jnp.full((1,), N, dtype=jnp.int32),
                               seed_idx[:, -1]])
    sidx_rows = seed_idx.reshape(B, k0 // _LANE, _LANE)
    Mr = -(-npoint // _LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((B, R, _LANE), lambda g, nv: (0, 0, 0),
                               memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec((B, k0 // _LANE, _LANE), lambda g, nv: (0, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, Mr, _LANE), lambda g, nv: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, R, _LANE), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_fps_kernel_seeded, k0=k0, no_padding=(pad == 0)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Mr, _LANE), jnp.int32),
        interpret=interpret,
    )(scalars, *planes, d0, sidx_rows)
    return out.reshape(B, Mr * _LANE)[:, :npoint]


@functools.partial(jax.jit, static_argnames=('k0', 'grid'))
def grid_seed_indices(xyz, k0: int, grid=(32, 32, 8)):
    """(B, N, 3) -> (B, k0) voxel-stratified seed indices for seeded FPS.

    Quantize each scene onto a ``grid`` of cells spanning its bounding box,
    pick one representative point per occupied cell (the lowest original
    index — a uniform draw, the cloud is shuffled upstream), and fill any
    remaining slots with the lowest-index non-representatives. All returned
    indices are DISTINCT (the rep/fill key spaces are disjoint and each
    point appears once). Better completion coverage than head seeding at
    the same k0: no two seeds are wasted on the same dense cluster cell.

    Cost: one (B, N) sort + one top_k — no scatter (TPU scatters
    serialize). int32-safe while n_cells * N < 2**31.
    """
    B, N, _ = xyz.shape
    gf = jnp.asarray(grid, jnp.float32)
    gi = jnp.asarray(grid, jnp.int32)
    mn = xyz.min(axis=1, keepdims=True)
    mx = xyz.max(axis=1, keepdims=True)
    cell = jnp.maximum((mx - mn) / gf, 1e-6)
    q = jnp.clip(((xyz - mn) / cell).astype(jnp.int32), 0, gi - 1)
    vid = (q[..., 2] * grid[1] + q[..., 1]) * grid[0] + q[..., 0]  # (B, N)
    assert grid[0] * grid[1] * grid[2] * N < 2 ** 31
    comp = vid * N + jnp.arange(N, dtype=jnp.int32)[None]   # all distinct
    s = jnp.sort(comp, axis=1)
    svid, sidx = s // N, s % N
    first = jnp.concatenate(
        [jnp.ones((B, 1), bool), svid[:, 1:] != svid[:, :-1]], axis=1)
    key = jnp.where(first, sidx, sidx + N)     # reps first, then fillers
    neg_top = jax.lax.top_k(-key, k0)[0]
    return ((-neg_top) % N).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('npoint', 'chunks', 'interpret'))
def farthest_point_sample_chunked(xyz, npoint: int, chunks: int,
                                  interpret: bool = False):
    """Chunked FPS: split each scene's INDEX space into ``chunks`` equal
    slices and run exact FPS independently per slice with quota
    ``npoint / chunks`` — the scene points are shuffled upstream
    (``DataProcessor.shuffle_points``), so each slice is a uniform random
    subsample and per-slice FPS is spatially-stratified sampling of the
    whole scene (the same approximation family as PV-RCNN++'s sector-FPS,
    reference ``voxel_set_abstraction.py:53-87``, but with static shapes:
    slices are equal by construction, no azimuth bucketing).

    Why: the FPS step chain is LATENCY-bound (see the negative results in
    this file) — S chunks cut the sequential chain AND the per-step
    footprint by S, and the B*S independent chains interleave in the VPU
    pipeline exactly like the unrolled-B batch chains. Measured v5e B=8
    16384->4096: chunks=4 3.9 ms vs 12.4 ms exact.

    Each slice's result is bit-exact FPS of that slice (seed = slice's
    first point); outputs are the concatenated per-slice selections with
    index offsets restored. Requires N % chunks == npoint % chunks == 0.
    """
    B, N, _ = xyz.shape
    if N % chunks or npoint % chunks:
        raise ValueError(f'chunks={chunks} must divide N={N} and '
                         f'npoint={npoint}')
    nc, mc = N // chunks, npoint // chunks
    idx = farthest_point_sample_pallas(
        xyz.reshape(B * chunks, nc, 3), mc, interpret=interpret)
    offs = (jnp.arange(chunks, dtype=jnp.int32) * nc)[None, :, None]
    return (idx.reshape(B, chunks, mc) + offs).reshape(B, npoint)


@functools.partial(jax.jit, static_argnames=('npoint', 'interpret'))
def _fps_pallas_grid(xyz, npoint: int, interpret: bool = False):
    """Per-batch grid variant (original production path)."""
    B, N, _ = xyz.shape
    pad = (-N) % _LANE
    R = (N + pad) // _LANE
    xyz_p = jnp.pad(xyz, ((0, 0), (0, pad), (0, 0)))
    planes = [xyz_p[..., i].reshape(B, R, _LANE) for i in range(3)]
    n_valid = jnp.full((1,), N, dtype=jnp.int32)
    Mr = -(-npoint // _LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, R, _LANE), lambda b, nv: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, _LANE), lambda b, nv: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, _LANE), lambda b, nv: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Mr, _LANE), lambda b, nv: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, _LANE), jnp.float32)],
    )
    out = pl.pallas_call(
        _fps_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Mr, _LANE), jnp.int32),
        interpret=interpret,
    )(n_valid, *planes)
    return out.reshape(B, Mr * _LANE)[:, :npoint]


def _fps_kernel_batched2d(nvalid_ref, x_ref, y_ref, z_ref, out_ref, dist_ref):
    """Strictly-2D batched FPS (EXPERIMENTAL, not dispatched).

    Outcome of the experiment: lowers under Mosaic (rank-2 only, selector-
    matrix matmul broadcasts, static-slice reductions) but (a) the per-batch
    broadcast matmul runs in bf16 on TPU which corrupts integer indices
    (> 2^8) and coordinates, and (b) even so it measured SLOWER than the
    per-batch grid kernel (58.6 vs 49.5 ms, B=8 16384->4096) — the per-step
    select/concat machinery costs more than the B-fold loop it saves.
    Kept for reference; the per-batch grid kernel is the production path.

    Layouts: coords/dist (B*R, 128); output (Mr, B*128) — column block b*128
    holds batch b's indices; the wrapper transposes back.
    """
    n_valid = nvalid_ref[0]
    BR = x_ref.shape[0]
    B = out_ref.shape[1] // _LANE
    R = BR // B

    lane = jax.lax.broadcasted_iota(jnp.int32, (BR, _LANE), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (BR, _LANE), 0)
    flat_ids = (row % R) * _LANE + lane            # per-b point id
    valid = flat_ids < n_valid
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, B * _LANE), 1)
    out_col = out_lane % _LANE                     # slot-in-row per column

    x = x_ref[:]
    y = y_ref[:]
    z = z_ref[:]
    dist_ref[:] = jnp.where(valid, _BIG_F, -1.0)

    # selector matrix S[i, b] = 1 iff row i belongs to batch b: per-batch
    # broadcast becomes an MXU matmul and per-batch sum a transposed matmul —
    # no reshapes (Mosaic cannot shape-cast lanes into sublanes).
    sel_rows = jax.lax.broadcasted_iota(jnp.int32, (BR, B), 0) // R
    sel_cols = jax.lax.broadcasted_iota(jnp.int32, (BR, B), 1)
    S = (sel_rows == sel_cols).astype(jnp.float32)          # (BR, B)

    def per_b_full(col):
        """(B, 1) -> (B*R, 128) per-batch broadcast via S @ col."""
        full_col = jnp.dot(S, col, preferred_element_type=jnp.float32)
        return jnp.broadcast_to(full_col, (BR, _LANE))

    def reduce_per_b(arr, op):
        """(B*R, 128) -> (B, 1): lane-reduce, then per-batch static slices."""
        m_row = op(arr.astype(jnp.float32), axis=1, keepdims=True)  # (BR, 1)
        parts = [op(m_row[b * R:(b + 1) * R, :], axis=0, keepdims=True)
                 for b in range(B)]
        return jnp.concatenate(parts, axis=0)                # (B, 1)

    def write(j, vals_b):
        """vals_b (B, 1) -> output row j (Mr, B*128) layout."""
        r = j // _LANE
        c = j % _LANE
        vals_row = jnp.broadcast_to(vals_b, (B, _LANE)).reshape(1, B * _LANE)
        cur = out_ref[pl.ds(r, 1), :]
        out_ref[pl.ds(r, 1), :] = jnp.where(out_col == c, vals_row, cur)

    write(0, jnp.zeros((B, 1), jnp.int32))

    def body(j, carry):
        x1, y1, z1 = carry                          # each (B, 1)
        d2 = (x - per_b_full(x1)) ** 2 + (y - per_b_full(y1)) ** 2 \
            + (z - per_b_full(z1)) ** 2
        new_dist = jnp.minimum(dist_ref[:], jnp.where(valid, d2, -1.0))
        dist_ref[:] = new_dist
        m_b = reduce_per_b(new_dist, jnp.max)
        eq = new_dist == per_b_full(m_b)
        cand = jnp.where(eq, flat_ids, jnp.int32(_BIG_I))
        nxt_b = reduce_per_b(cand, jnp.min)            # (B, 1) float32
        write(j, nxt_b.astype(jnp.int32))
        sel = flat_ids.astype(jnp.float32) == per_b_full(nxt_b)
        nx = reduce_per_b(jnp.where(sel, x, 0.0), jnp.sum)
        ny = reduce_per_b(jnp.where(sel, y, 0.0), jnp.sum)
        nz = reduce_per_b(jnp.where(sel, z, 0.0), jnp.sum)
        return nx, ny, nz

    seed = (reduce_per_b(jnp.where(flat_ids == 0, x, 0.0), jnp.sum),
            reduce_per_b(jnp.where(flat_ids == 0, y, 0.0), jnp.sum),
            reduce_per_b(jnp.where(flat_ids == 0, z, 0.0), jnp.sum))
    jax.lax.fori_loop(1, out_ref.shape[0] * _LANE, body, seed, unroll=False)


@functools.partial(jax.jit, static_argnames=('npoint', 'interpret'))
def farthest_point_sample_pallas_batched2d(xyz, npoint: int,
                                           interpret: bool = False):
    """Strictly-2D batched FPS wrapper; one program for the whole batch."""
    B, N, _ = xyz.shape
    pad = (-N) % _LANE
    R = (N + pad) // _LANE
    xyz_p = jnp.pad(xyz, ((0, 0), (0, pad), (0, 0)))
    planes = [xyz_p[..., i].reshape(B * R, _LANE) for i in range(3)]
    n_valid = jnp.full((1,), N, dtype=jnp.int32)
    Mr = -(-npoint // _LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((B * R, _LANE), lambda g, nv: (0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((Mr, B * _LANE), lambda g, nv: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B * R, _LANE), jnp.float32)],
    )
    out = pl.pallas_call(
        _fps_kernel_batched2d,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mr, B * _LANE), jnp.int32),
        interpret=interpret,
    )(n_valid, *planes)
    out = out.reshape(Mr, B, _LANE).transpose(1, 0, 2).reshape(B, Mr * _LANE)
    return out[:, :npoint]
