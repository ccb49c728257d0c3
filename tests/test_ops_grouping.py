import numpy as np
import jax.numpy as jnp

from spsnet_tpu import ops
from tests.reference_impls import ball_query_ref, ball_query_dilated_ref


def test_ball_query_matches_cuda_semantics():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-2, 2, size=(2, 200, 3)).astype(np.float32)
    new_xyz = xyz[:, :40]
    got = np.asarray(ops.ball_query(0.9, 8, jnp.asarray(xyz), jnp.asarray(new_xyz),
                                    chunk=16))
    want = ball_query_ref(0.9, 8, xyz, new_xyz)
    np.testing.assert_array_equal(got, want)


def test_ball_query_empty_neighborhood_is_zero():
    xyz = np.zeros((1, 8, 3), dtype=np.float32)
    xyz[0, :, 0] = np.arange(8) * 10.0
    new_xyz = np.full((1, 2, 3), 500.0, dtype=np.float32)
    got = np.asarray(ops.ball_query(0.5, 4, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    np.testing.assert_array_equal(got, 0)


def test_ball_query_pads_with_first_hit():
    xyz = np.zeros((1, 10, 3), dtype=np.float32)
    xyz[0, :, 0] = np.arange(10)
    new_xyz = np.array([[[5.0, 0, 0]]], dtype=np.float32)
    got = np.asarray(ops.ball_query(1.5, 6, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    # hits: 4, 5, 6 -> padded with first hit (4)
    np.testing.assert_array_equal(got[0, 0], [4, 5, 6, 4, 4, 4])


def test_ball_query_dilated():
    rng = np.random.default_rng(1)
    xyz = rng.uniform(-2, 2, size=(2, 120, 3)).astype(np.float32)
    new_xyz = xyz[:, ::5]
    got = np.asarray(ops.ball_query_dilated(0.4, 1.2, 8, jnp.asarray(xyz),
                                            jnp.asarray(new_xyz), chunk=8))
    want = ball_query_dilated_ref(0.4, 1.2, 8, xyz, new_xyz)
    np.testing.assert_array_equal(got, want)


def test_gather_and_group():
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(2, 30, 5)).astype(np.float32)
    idx = rng.integers(0, 30, size=(2, 7)).astype(np.int32)
    got = np.asarray(ops.gather_points(jnp.asarray(feats), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], feats[b, idx[b]])

    gidx = rng.integers(0, 30, size=(2, 7, 4)).astype(np.int32)
    got = np.asarray(ops.group_points(jnp.asarray(feats), jnp.asarray(gidx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], feats[b][gidx[b]])


def test_query_and_group_relative_coords():
    rng = np.random.default_rng(3)
    xyz = rng.uniform(-1, 1, size=(1, 50, 3)).astype(np.float32)
    feats = rng.normal(size=(1, 50, 4)).astype(np.float32)
    new_xyz = xyz[:, :5]
    grouped, idx = ops.query_and_group(0.8, 8, jnp.asarray(xyz),
                                       jnp.asarray(new_xyz), jnp.asarray(feats))
    grouped = np.asarray(grouped)
    idx = np.asarray(idx)
    assert grouped.shape == (1, 5, 8, 7)
    # first 3 channels are center-relative coordinates
    np.testing.assert_allclose(
        grouped[0, :, :, :3], xyz[0][idx[0]] - new_xyz[0][:, None], atol=1e-6)
    np.testing.assert_array_equal(grouped[0, :, :, 3:], feats[0][idx[0]])


def test_msg_shared_group_matches_per_scale_on_sparse_scene():
    """Shared-gather MSG == per-scale MSG when every ball is under-full.

    With <= nsample hits per ball at every scale, the reference first-k
    keeps ALL in-radius points, and the shared path's radius mask selects
    exactly the same set (the nearest-candidate fallback is the center
    itself, already in-radius) -> pooled outputs must match bitwise.
    """
    import jax
    import flax.linen as nn
    from spsnet_tpu.ops import grouping
    from spsnet_tpu.models.sa_module import SAModuleMSGWithSampling

    rng = np.random.default_rng(7)
    # sparse: 96 points in a 40m box -> every 1.6m ball is under-full
    pts = rng.uniform(-20, 20, size=(2, 96, 3)).astype(np.float32)
    feats = rng.normal(size=(2, 96, 5)).astype(np.float32)

    mod = SAModuleMSGWithSampling(
        npoint_list=[32], sample_range_list=[-1], sample_type_list=['D-FPS'],
        radii=[0.8, 1.6], nsamples=[8, 16], mlps=[[8, 16], [8, 16]],
        num_class=3, aggregation_mlp=[16], confidence_mlp=None)

    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                         jnp.asarray(feats), train=False)

    def run():
        out = mod.apply(variables, jnp.asarray(pts), jnp.asarray(feats),
                        train=False)
        return np.asarray(out[1])

    try:
        grouping.set_msg_shared(False)
        jax.clear_caches()
        want = run()
        grouping.set_msg_shared(True)
        jax.clear_caches()
        got = run()
    finally:
        grouping.set_msg_shared(None)
        jax.clear_caches()

    np.testing.assert_allclose(got, want, rtol=0, atol=0)
