import numpy as np
import jax.numpy as jnp

from spsnet_tpu.ops import interpolate
from tests.reference_impls import three_nn_ref


def test_three_nn():
    rng = np.random.default_rng(0)
    unknown = rng.normal(size=(2, 40, 3)).astype(np.float32)
    known = rng.normal(size=(2, 15, 3)).astype(np.float32)
    d2, idx = interpolate.three_nn(jnp.asarray(unknown), jnp.asarray(known))
    want_d, want_i = three_nn_ref(unknown, known)
    np.testing.assert_allclose(np.asarray(d2), want_d, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), want_i)


def test_three_interpolate():
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(2, 15, 6)).astype(np.float32)
    idx = rng.integers(0, 15, size=(2, 40, 3)).astype(np.int32)
    w = rng.uniform(size=(2, 40, 3)).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    got = np.asarray(interpolate.three_interpolate(
        jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w)))
    want = np.einsum('bnk,bnkc->bnc', w,
                     np.stack([feats[b][idx[b]] for b in range(2)]))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_weights_from_dist():
    d2 = jnp.asarray([[[1.0, 2.0, 4.0]]])
    w = np.asarray(interpolate.three_interpolate_weights(d2))
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)
    assert w[0, 0, 0] > w[0, 0, 1] > w[0, 0, 2]
