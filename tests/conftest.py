"""Test env: force CPU backend with 8 virtual devices so sharding/multi-chip
logic is exercised without TPU hardware (SURVEY.md §4 test pyramid, layer 5).

Note: the axon TPU plugin overrides ``JAX_PLATFORMS`` from the environment, so
we must force the platform through ``jax.config`` after import.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
