import numpy as np
import jax.numpy as jnp
import pytest

from spsnet_tpu.utils.box_coder import PointResidualBinOriCoder, ResidualCoder


MEAN_SIZE = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]


def test_binori_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    coder = PointResidualBinOriCoder(use_mean_size=True, mean_size=MEAN_SIZE,
                                     angle_bin_num=12)
    n = 50
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0:3] = rng.uniform(-10, 10, (n, 3))
    boxes[:, 3:6] = rng.uniform(0.5, 4.0, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi + 0.01, np.pi - 0.01, n)
    points = boxes[:, 0:3] + rng.normal(scale=1.0, size=(n, 3)).astype(np.float32)
    classes = rng.integers(1, 4, n)

    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(points),
                       gt_classes=jnp.asarray(classes))
    assert enc.shape == (n, 8)
    # expand target encoding to prediction layout: one-hot bin logits
    bin_id = np.asarray(enc[:, 6]).astype(int)
    bin_logits = np.eye(12)[bin_id] * 10.0
    bin_res = np.zeros((n, 12))
    bin_res[np.arange(n), bin_id] = np.asarray(enc[:, 7])
    pred = np.concatenate([np.asarray(enc[:, :6]), bin_logits, bin_res], axis=1)
    dec = np.asarray(coder.decode(jnp.asarray(pred.astype(np.float32)),
                                  jnp.asarray(points),
                                  pred_classes=jnp.asarray(classes)))
    np.testing.assert_allclose(dec[:, :6], boxes[:, :6], atol=1e-3)
    ang_err = np.abs(np.angle(np.exp(1j * (dec[:, 6] - boxes[:, 6]))))
    assert ang_err.max() < 1e-3


def test_residual_coder_roundtrip():
    rng = np.random.default_rng(1)
    coder = ResidualCoder()
    n = 30
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0:3] = rng.uniform(-10, 10, (n, 3))
    boxes[:, 3:6] = rng.uniform(0.5, 4.0, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    anchors = boxes + rng.normal(scale=0.1, size=boxes.shape).astype(np.float32)
    anchors[:, 3:6] = np.abs(anchors[:, 3:6]) + 0.5
    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
    dec = np.asarray(coder.decode(enc, jnp.asarray(anchors)))
    np.testing.assert_allclose(dec, boxes, atol=1e-4)


def test_previous_residual_decoders():
    from spsnet_tpu.utils.box_coder import (PreviousResidualDecoder,
                                            PreviousResidualRoIDecoder)
    anchors = jnp.asarray([[10.0, 5.0, -1.0, 3.9, 1.6, 1.5, 0.3]])
    enc = jnp.asarray([[0.1, -0.2, 0.05, 0.0, 0.0, 0.0, 0.2]])
    out = np.asarray(PreviousResidualDecoder.decode(enc, anchors))[0]
    diag = np.sqrt(3.9 ** 2 + 1.6 ** 2)
    assert out[0] == pytest.approx(0.1 * diag + 10.0, abs=1e-5)
    # legacy (w, l, h) slot swap: exp(l-slot)*dxa for dx
    assert out[3] == pytest.approx(3.9, abs=1e-5)
    assert out[4] == pytest.approx(1.6, abs=1e-5)
    assert out[6] == pytest.approx(0.5, abs=1e-6)
    out2 = np.asarray(PreviousResidualRoIDecoder.decode(enc, anchors))[0]
    assert out2[6] == pytest.approx(0.3 - 0.2, abs=1e-6)


def test_point_bin_residual_coder_roundtrip():
    from spsnet_tpu.utils.box_coder import PointBinResidualCoder
    coder = PointBinResidualCoder(
        use_mean_size=True, mean_size=[[3.9, 1.6, 1.56]], angle_bin_num=12)
    assert coder.code_size == 30
    rng = np.random.default_rng(0)
    boxes = np.zeros((16, 7), np.float32)
    boxes[:, 0:3] = rng.uniform(-5, 5, (16, 3))
    boxes[:, 3:6] = rng.uniform(1, 4, (16, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 16)
    pts = rng.uniform(-5, 5, (16, 3)).astype(np.float32)
    cls = np.ones(16, np.int32)
    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(pts),
                       jnp.asarray(cls))
    dec = np.asarray(coder.decode(enc, jnp.asarray(pts), jnp.asarray(cls)))
    np.testing.assert_allclose(dec[:, :6], boxes[:, :6], atol=1e-4)
    dtheta = np.remainder(dec[:, 6] - boxes[:, 6] + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(dtheta, 0.0, atol=1e-4)
