import numpy as np
import jax.numpy as jnp

from spsnet_tpu import ops
from tests.reference_impls import fps_ref, fps_with_dist_ref


def test_fps_matches_cuda_semantics():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(3, 128, 3)).astype(np.float32)
    got = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 32))
    want = fps_ref(xyz, 32)
    np.testing.assert_array_equal(got, want)


def test_fps_first_index_zero():
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(2, 64, 3)).astype(np.float32)
    got = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 8))
    assert (got[:, 0] == 0).all()


def test_fps_with_valid_mask_never_selects_padding():
    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(2, 64, 3)).astype(np.float32)
    mask = np.ones((2, 64), dtype=bool)
    mask[:, 48:] = False
    xyz[:, 48:] = 100.0  # far away padding that unmasked FPS would love
    got = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 16,
                                               valid_mask=jnp.asarray(mask)))
    assert got.max() < 48


def test_fps_with_dist():
    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(2, 96, 3)).astype(np.float32)
    dmat = np.linalg.norm(xyz[:, :, None] - xyz[:, None, :], axis=-1) ** 2
    got = np.asarray(ops.farthest_point_sample_with_dist(
        jnp.asarray(dmat.astype(np.float32)), 24))
    want = fps_with_dist_ref(dmat, 24)
    np.testing.assert_array_equal(got, want)


def test_calc_square_dist():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(2, 10, 3)).astype(np.float32)
    b = rng.normal(size=(2, 7, 3)).astype(np.float32)
    got = np.asarray(ops.calc_square_dist(jnp.asarray(a), jnp.asarray(b)))
    want = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_index_ops_are_gradient_opaque():
    """FPS and ball query must CUT reverse-mode at their inputs.

    Their outputs are integer indices (the CUDA kernels define no grad),
    and on TPU the inputs feed Pallas kernels with no VJP — train broke
    the first time a param-dependent query center (SA layer 6 groups
    around predicted vote centers) reached one. Gradient w.r.t. coords
    must flow ONLY through the downstream gather/relative-coord math,
    never through the index selection itself.
    """
    import jax
    import jax.numpy as jnp
    from spsnet_tpu import ops

    rng = np.random.default_rng(3)
    xyz = jnp.asarray(rng.uniform(-5, 5, size=(2, 64, 3)), jnp.float32)

    def fps_loss(x):
        idx = ops.farthest_point_sample(x, 16)
        return jnp.sum(idx.astype(jnp.float32))

    def bq_loss(c):
        idx = ops.ball_query(2.0, 8, xyz, c)
        return jnp.sum(idx.astype(jnp.float32))

    # linearization must succeed AND produce exactly-zero cotangents
    np.testing.assert_array_equal(np.asarray(jax.grad(fps_loss)(xyz)), 0.0)
    centers = xyz[:, :16] * 1.0
    np.testing.assert_array_equal(np.asarray(jax.grad(bq_loss)(centers)), 0.0)


def test_fps_prefix_nesting_property():
    """FPS restricted to its own output prefix-nests: if S = FPS(P, n) in
    selection order, then FPS(P[S], m) == arange(m) for any m <= n — pick k
    of the restricted chain is the global argmax over P (which is S[k]).
    This property lets a D-FPS layer fed a D-FPS-ordered input return
    arange for free (sa_module.py prefix shortcut)."""
    import jax.numpy as jnp
    from spsnet_tpu import ops

    rng = np.random.default_rng(7)
    P = jnp.asarray(rng.normal(size=(3, 256, 3)).astype(np.float32) * 10)
    S = ops.farthest_point_sample(P, 64)                  # (3, 64)
    sub = ops.gather_points(P, S)                         # selection order
    again = np.asarray(ops.farthest_point_sample(sub, 16))
    np.testing.assert_array_equal(
        again, np.broadcast_to(np.arange(16, dtype=np.int32), (3, 16)))


def test_fps_seed_scope_gating(monkeypatch):
    """Seeded FPS engagement is scoped: un-gated call sites stay exact
    unless SPSNET_FPS_SEED_SCOPE=all, and the shared k0 rounding kills
    seeding for small npoint (advisor round-4 medium/low)."""
    from spsnet_tpu.ops import sampling

    monkeypatch.setenv('SPSNET_FPS_SEED', '0.75')
    monkeypatch.setenv('SPSNET_FPS_SEED_MODE', 'grid')
    # 128-aligned seed block: 4096 -> 3072; small npoint rounds to 0
    assert sampling.fps_seed_k0(4096) == 3072
    assert sampling.fps_seed_k0(170) == 0
    assert sampling.fps_seed_k0(128) == 0
    monkeypatch.setenv('SPSNET_FPS_SEED', '0')
    assert sampling.fps_seed_k0(4096) == 0

    # pretend we are on TPU so the backend check passes
    monkeypatch.setenv('SPSNET_FPS_SEED', '0.75')
    monkeypatch.setattr(sampling.jax, 'default_backend', lambda: 'tpu')
    assert sampling.fps_seeding_active(4096, allow_seed=True)
    assert not sampling.fps_seeding_active(4096, allow_seed=False)
    assert not sampling.fps_seeding_active(170, allow_seed=True)
    monkeypatch.setenv('SPSNET_FPS_SEED_SCOPE', 'all')
    assert sampling.fps_seeding_active(4096, allow_seed=False)
    monkeypatch.setenv('SPSNET_FPS_SEED_SCOPE', 'gated')
    assert not sampling.fps_seeding_active(4096, allow_seed=False)


def test_fps_pure_grid_mode_dispatch(monkeypatch):
    """frac >= 1.0 + grid mode = pure stratified sampling (k0 == npoint,
    no sequential completion). Head mode disengages there; non-128
    npoint disengages. (Opt-in only — the lifecycle gate REJECTED it as
    a default; see DESIGN.md round-5 spikes.)"""
    import jax.numpy as jnp

    from spsnet_tpu.ops import sampling
    from spsnet_tpu.ops.pallas.fps import grid_seed_indices

    monkeypatch.setenv('SPSNET_FPS_SEED', '1.0')
    monkeypatch.setenv('SPSNET_FPS_SEED_MODE', 'grid')
    assert sampling.fps_seed_k0(4096) == 4096
    assert sampling.fps_seed_k0(100) == 0          # not 128-aligned
    monkeypatch.setenv('SPSNET_FPS_SEED_MODE', 'head')
    assert sampling.fps_seed_k0(4096) == 0         # head mode: meaningless

    # the stratified selector itself: distinct indices, full count
    rng = np.random.default_rng(11)
    xyz = jnp.asarray(rng.normal(size=(2, 1024, 3)).astype(np.float32) * 20)
    idx = np.asarray(grid_seed_indices(xyz, 256))
    assert idx.shape == (2, 256)
    for b in range(2):
        assert len(np.unique(idx[b])) == 256


def test_layer_fps_ordered_seeding_aware(monkeypatch):
    """A seeded producing layer yields a chain that is NOT FPS-ordered:
    the backbone's order flag must go False for it even when the NEXT
    layer's npoint would disengage seeding (the k0-rounding hole)."""
    from spsnet_tpu.models.backbones_3d.iassd_backbone import (
        _layer_fps_ordered)
    from spsnet_tpu.ops import sampling

    monkeypatch.setenv('SPSNET_FPS_SEED', '0.75')
    monkeypatch.setattr(sampling.jax, 'default_backend', lambda: 'tpu')
    # layer ran seeded FPS (k0(1024)=768 engages) -> chain not FPS-ordered
    assert _layer_fps_ordered(True, 1024, prev_ordered=False) is False
    # small layer disengages seeding (k0(128)=0) -> exact chain
    assert _layer_fps_ordered(True, 128, prev_ordered=False) is True
    # pass-through inherits the input's order either way
    assert _layer_fps_ordered(False, 1024, prev_ordered=True) is True
    assert _layer_fps_ordered(False, 1024, prev_ordered=False) is False
    # seeding off: any genuine FPS run is an exact chain
    monkeypatch.setenv('SPSNET_FPS_SEED', '0')
    assert _layer_fps_ordered(True, 1024, prev_ordered=False) is True
