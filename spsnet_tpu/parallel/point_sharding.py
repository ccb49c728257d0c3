"""Point-axis (sequence-parallel) sharding for Waymo-scale clouds.

SURVEY §5's planned design: when one frame's cloud (Waymo: ~180k points)
dominates a chip's memory/time, shard the POINT axis over a mesh axis
instead of (or in addition to) the batch axis.

Two classes of op:

- ``ball query / grouping / MLPs``: queries shard cleanly — each device
  owns a slice of the query points and sees the full (replicated) support
  set; GSPMD partitions the (B, M, N) distance work with ZERO collectives.
  Use plain jit with a ``P(None, 'points')`` sharding on the query axis
  (``sharded_query_group`` below demonstrates the annotation).

- ``farthest point sampling``: inherently global — every step's argmax
  ranges over ALL points. ``sharded_farthest_point_sample`` runs the exact
  min-distance chain under ``shard_map``: each device keeps the running
  min-dist of its contiguous point shard; per step, an ``all_gather`` of
  the (per-shard max, per-shard argmax) pairs elects the global winner
  (first shard with the max + lowest local index == lowest global index on
  contiguous shards — the CUDA kernel's tie-break), and a ``psum`` of the
  masked winner coords broadcasts the new seed. One tiny collective pair
  per step rides the ICI; the O(N) distance update is fully sharded.

Exactness: identical results to ``farthest_point_sample`` (asserted by
tests on an 8-device CPU mesh) — same fp32 ops, same tie-break.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_point_mesh(n_data: int = 1, axis_names=('data', 'points'),
                    devices=None) -> Mesh:
    """(data, points) 2-D mesh; n_data=1 gives pure point-parallelism."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    return Mesh(devices.reshape(n_data, -1), axis_names)


@functools.partial(jax.jit, static_argnames=('npoint', 'axis'))
def _fps_local(xyz, npoint, axis):
    """shard_map body: xyz (B, N_local, 3) — this shard's contiguous slice."""
    B, n_loc, _ = xyz.shape
    shard = jax.lax.axis_index(axis)
    n_shards = jax.lax.psum(1, axis)
    offset = shard * n_loc

    # seed = global point 0 (shard 0, local 0)
    seed = jax.lax.psum(
        jnp.where(shard == 0, xyz[:, 0, :], jnp.zeros_like(xyz[:, 0, :])),
        axis)

    local_ids = jnp.arange(n_loc, dtype=jnp.int32)

    def body(i, carry):
        dist, last, out = carry
        d2 = jnp.sum((xyz - last[:, None, :]) ** 2, axis=-1)
        dist = jnp.minimum(dist, d2)
        loc_max = jnp.max(dist, axis=1)                       # (B,)
        loc_arg = jnp.argmax(dist, axis=1).astype(jnp.int32)  # lowest local
        gmax = jax.lax.all_gather(loc_max, axis)              # (S, B)
        m = jnp.max(gmax, axis=0)                             # (B,)
        # first shard attaining the max -> lowest global index
        winner = jnp.argmax(gmax == m[None, :], axis=0)       # (B,)
        is_winner = winner == shard
        g_idx_local = jnp.where(is_winner, offset + loc_arg, 0)
        g_idx = jax.lax.psum(g_idx_local, axis)               # (B,)
        sel_coords = jnp.take_along_axis(
            xyz, loc_arg[:, None, None], axis=1)[:, 0, :]
        nxt = jax.lax.psum(
            jnp.where(is_winner[:, None], sel_coords,
                      jnp.zeros_like(sel_coords)), axis)
        out = out.at[:, i].set(g_idx.astype(jnp.int32))
        return dist, nxt, out

    out0 = jnp.zeros((B, npoint), jnp.int32)
    dist0 = jnp.full((B, n_loc), 1e10, jnp.float32)
    _, _, out = jax.lax.fori_loop(1, npoint, body, (dist0, seed, out0))
    return out


def sharded_farthest_point_sample(xyz, npoint: int, mesh: Mesh,
                                  axis: str = 'points'):
    """(B, N, 3) with N sharded over ``axis`` -> replicated (B, npoint)."""
    try:
        from jax import shard_map
        kw = {'check_vma': False}       # jax >= 0.8 renamed check_rep
    except ImportError:                 # older jax
        from jax.experimental.shard_map import shard_map
        kw = {'check_rep': False}
    fn = shard_map(
        functools.partial(_fps_local, npoint=npoint, axis=axis),
        mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(),
        **kw)
    return fn(xyz)


def sharded_query_group(radius, nsample, xyz, new_xyz, features, mesh,
                        axis: str = 'points'):
    """Ball query + grouping with the QUERY axis sharded: supports stay
    replicated, each device resolves its query slice — GSPMD inserts no
    collectives (verify with jit(...).lower().compile()). Returns grouped
    features (B, M, S, 3+C) sharded on M."""
    from ..ops.grouping import query_and_group
    q_shard = NamedSharding(mesh, P(None, axis))
    rep = NamedSharding(mesh, P())
    new_xyz = jax.device_put(new_xyz, NamedSharding(mesh, P(None, axis, None)))
    xyz = jax.device_put(xyz, NamedSharding(mesh, P(None, None, None)))
    features = jax.device_put(features, NamedSharding(mesh, P()))

    @functools.partial(jax.jit,
                       out_shardings=NamedSharding(
                           mesh, P(None, axis, None, None)))
    def run(x, q, f):
        grouped, _ = query_and_group(radius, nsample, x, q, f)
        return grouped

    return run(xyz, new_xyz, features)
