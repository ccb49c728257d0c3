"""Point-axis sharding on the 8-device CPU mesh: exactness vs single-device
ops and correct output shardings."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.parallel.point_sharding import (
    make_point_mesh, sharded_farthest_point_sample, sharded_query_group)


@pytest.fixture(scope='module')
def pmesh():
    if len(jax.devices()) < 2:
        pytest.skip('needs multi-device mesh')
    return make_point_mesh(n_data=1)


def test_sharded_fps_exact(pmesh):
    from spsnet_tpu.ops.sampling import _farthest_point_sample_xla
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-35, 35, (2, 1024, 3)).astype(np.float32))
    got = np.asarray(sharded_farthest_point_sample(xyz, 128, pmesh))
    want = np.asarray(_farthest_point_sample_xla(xyz, 128))
    np.testing.assert_array_equal(got, want)


def test_sharded_fps_tie_break_lowest_global_index(pmesh):
    # duplicate points across shards: the winner must be the LOWEST global
    # index (CUDA chain semantics), even when the max lives on many shards
    xyz = np.zeros((1, 1024, 3), np.float32)
    xyz[0, :, 0] = np.arange(1024) % 4          # heavy duplication
    got = np.asarray(sharded_farthest_point_sample(
        jnp.asarray(xyz), 8, pmesh))
    from spsnet_tpu.ops.sampling import _farthest_point_sample_xla
    want = np.asarray(_farthest_point_sample_xla(jnp.asarray(xyz), 8))
    np.testing.assert_array_equal(got, want)


def test_sharded_query_group_matches_replicated(pmesh):
    from spsnet_tpu.ops.grouping import query_and_group
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.uniform(-10, 10, (2, 512, 3)).astype(np.float32))
    new_xyz = xyz[:, :256]
    feats = jnp.asarray(rng.normal(size=(2, 512, 8)).astype(np.float32))
    got = np.asarray(sharded_query_group(1.5, 8, xyz, new_xyz, feats, pmesh))
    want, _ = query_and_group(1.5, 8, xyz, new_xyz, feats)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-6)


def test_sharded_query_group_output_sharding(pmesh):
    rng = np.random.default_rng(2)
    xyz = jnp.asarray(rng.uniform(-10, 10, (2, 512, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(2, 512, 8)).astype(np.float32))
    out = sharded_query_group(1.5, 8, xyz, xyz[:, :256], feats, pmesh)
    # the query axis must actually be sharded across the 8 devices
    assert len(out.sharding.device_set) == len(jax.devices())
    spec = out.sharding.spec
    assert spec[1] == 'points'
