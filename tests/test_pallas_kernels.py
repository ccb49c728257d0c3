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
