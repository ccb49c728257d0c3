"""Pallas kernel parity (interpret mode on CPU; real lowering covered by the
driver's TPU bench)."""
import numpy as np
import jax.numpy as jnp

from spsnet_tpu.ops.pallas.fps import farthest_point_sample_pallas
from tests.reference_impls import fps_ref


def test_pallas_fps_interpret_parity():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(3, 300, 3)).astype(np.float32)
    got = np.asarray(farthest_point_sample_pallas(jnp.asarray(xyz), 64,
                                                  interpret=True))
    want = fps_ref(xyz, 64)
    np.testing.assert_array_equal(got, want)


def test_pallas_fps_nonaligned_n():
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(2, 197, 3)).astype(np.float32)  # N % 128 != 0
    got = np.asarray(farthest_point_sample_pallas(jnp.asarray(xyz), 32,
                                                  interpret=True))
    want = fps_ref(xyz, 32)
    np.testing.assert_array_equal(got, want)
    assert got.max() < 197  # padding lanes never selected


def test_pallas_d2_interpret_parity():
    """ball_d2_bf16 == exact diff-form d2 up to bf16 output rounding."""
    from spsnet_tpu.ops.pallas.d2 import ball_d2_bf16, supports

    rng = np.random.default_rng(2)
    B, M, N = 2, 256, 512
    ctr = rng.uniform(-35, 35, (B, M, 3)).astype(np.float32)
    xyz = rng.uniform(-35, 35, (B, N, 3)).astype(np.float32)
    assert supports(jnp.asarray(ctr), jnp.asarray(xyz))
    got = np.asarray(ball_d2_bf16(jnp.asarray(ctr), jnp.asarray(xyz),
                                  interpret=True), dtype=np.float64)
    exact = ((ctr[:, :, None, :].astype(np.float64)
              - xyz[:, None, :, :]) ** 2).sum(-1)
    # bf16 has 8 bits of precision: relative error <= 2^-8
    np.testing.assert_allclose(got, exact, rtol=2 ** -8, atol=1e-6)


def test_pallas_d2_fps_v2_variant_parity():
    """The experimental hierarchical-argmax FPS matches the production
    kernel bit-for-bit (kept as a documented negative result)."""
    from spsnet_tpu.ops.pallas.fps import (_fps_pallas_allbatch,
                                           _fps_pallas_allbatch_v2)

    rng = np.random.default_rng(3)
    xyz = jnp.asarray(rng.uniform(-30, 30, (2, 640, 3)).astype(np.float32))
    a = np.asarray(_fps_pallas_allbatch(xyz, 128, interpret=True))
    b = np.asarray(_fps_pallas_allbatch_v2(xyz, 128, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_pallas_d2_supports_gate():
    from spsnet_tpu.ops.pallas.d2 import supports
    ok = jnp.zeros((1, 256, 3)), jnp.zeros((1, 512, 3))
    bad = jnp.zeros((1, 250, 3)), jnp.zeros((1, 500, 3))
    assert supports(*ok)
    assert not supports(bad[0], ok[1])  # M=250 not 8-aligned
    assert not supports(ok[0], bad[1])
