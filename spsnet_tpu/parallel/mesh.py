"""SPMD device mesh + sharding helpers.

Replaces the reference's NCCL/DDP layer (``common_utils.py:134-176``,
``commu_utils.py``) the TPU-native way: one jitted program over a
``jax.sharding.Mesh``; the batch axis is sharded over the ``data`` axis and
XLA inserts the gradient ``psum`` (riding ICI) during the backward pass — no
explicit collectives, no process groups, no pickle barriers.

Multi-host: each process feeds its host-local shard via
``make_array_from_process_local_data``; eval merge uses
``multihost_utils.process_allgather`` instead of the reference's
filesystem-barrier pickle merge (``common_utils.merge_results_dist``).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = 'data') -> Mesh:
    """1-D data mesh over all local+global devices (IA-SSD-class models are
    tiny — DP is the only parallelism that pays; the mesh API leaves room for
    model axes later, e.g. ('data', 'points') for Waymo-scale frames)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = 'data') -> dict:
    """Device-put array leaves batch-sharded; non-arrays pass through.

    This is the single host->device boundary (the analog of the reference's
    ``load_data_to_gpu``, ``models/__init__.py:23-34``).
    """
    sharding = batch_sharding(mesh, axis_name)
    rep = replicate(mesh)
    n_dev = mesh.devices.size
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype != object and v.ndim >= 1:
            # batches that don't divide the mesh (ragged eval tails) fall
            # back to replicated placement instead of erroring
            s = sharding if v.shape[0] % n_dev == 0 else rep
            if jax.process_count() > 1:
                out[k] = jax.make_array_from_process_local_data(s, v)
            else:
                out[k] = jax.device_put(v, s)
        elif isinstance(v, (int, float, np.integer, np.floating)):
            out[k] = v
        else:
            out[k] = v
    return out


def host_local_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    assert global_batch % n == 0, \
        f'global batch {global_batch} not divisible by {n} processes'
    return global_batch // n


def all_gather_host(values: Any):
    """Gather a pytree of host values across processes (eval merge)."""
    if jax.process_count() == 1:
        return [values]
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(values)
