"""Process-level JAX setup: persistent compilation cache + multi-host init.

First compile of the full IA-SSD program is ~1-3 min; the cache drops repeat
launches to seconds. Call early in every CLI entry point.
"""
from __future__ import annotations

import os


def maybe_init_distributed() -> bool:
    """Join the multi-host job when one is configured; no-op otherwise.

    Replaces the reference's ``init_dist_pytorch``/``init_dist_slurm``
    (``common_utils.py:134-176``) — but instead of NCCL process groups,
    ``jax.distributed.initialize`` wires every process into ONE global
    device set and GSPMD handles all communication. Triggers:

    - SLURM / OpenMPI / TPU-pod / k8s env (srun, mpirun, gcloud tpu-vm):
      jax auto-detects coordinator, process count, and process id.
    - manual launch: set ``JAX_COORDINATOR_ADDRESS=host0:port`` plus
      ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` (these two are this
      repo's convention — jax 0.9 has no env fallback for them) on every
      process, e.g. via ``tools/scripts/dist_train.sh``.

    Must run before any JAX backend touch. Idempotent. Returns True when
    this process is part of a multi-process job.
    """
    import jax

    if getattr(maybe_init_distributed, '_done', False):
        return jax.process_count() > 1

    n = os.environ.get('JAX_NUM_PROCESSES')
    coord = os.environ.get('JAX_COORDINATOR_ADDRESS')
    from jax._src import clusters

    def _all_cluster_types(base):
        # Recursive walk: GCE/GKE TPU pod detectors subclass BaseTpuCluster
        # (itself never env-present), so direct __subclasses__() misses the
        # exact platforms this feature targets. Mirrors jax's own
        # ClusterEnv._cluster_types registry.
        for c in base.__subclasses__():
            yield c
            yield from _all_cluster_types(c)

    auto = any(c.is_env_present() for c in _all_cluster_types(clusters.ClusterEnv))
    if coord or n or os.environ.get('JAX_PROCESS_ID'):
        trio = ('JAX_COORDINATOR_ADDRESS', 'JAX_NUM_PROCESSES',
                'JAX_PROCESS_ID')
        missing = [k for k in trio if not os.environ.get(k)]
        if missing:
            raise RuntimeError(
                'manual multi-host launch needs all three of '
                f'{", ".join(trio)}; missing: {", ".join(missing)} '
                '(set them on every process, e.g. via '
                'tools/scripts/dist_train.sh)')
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(n),
            process_id=int(os.environ['JAX_PROCESS_ID']))
    elif auto:
        # managed job (srun/mpirun/TPU pod/k8s): jax derives coordinator,
        # process count, and process id itself; fine for 1-task jobs too
        jax.distributed.initialize()
    else:
        return False
    maybe_init_distributed._done = True
    return jax.process_count() > 1


def setup_jax(cache_dir: str | None = None, distributed: bool = True):
    import jax
    # SPSNET_PLATFORM=cpu pins the backend from the environment. On hosts
    # with a device-plugin that overrides JAX_PLATFORMS (e.g. axon), this
    # config update is the only way to force CPU for a CLI entry point
    # (same recipe as tests/conftest.py).
    platform = os.environ.get('SPSNET_PLATFORM')
    if platform:
        jax.config.update('jax_platforms', platform)
    if distributed:
        maybe_init_distributed()
    cache_dir = cache_dir or os.environ.get(
        'JAX_COMPILATION_CACHE_DIR', '/tmp/spsnet_tpu_jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
