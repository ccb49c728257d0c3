"""Module-level goldens: IA-SSD forward/loss on synthetic frames (CPU, tiny)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.config import EDict
from spsnet_tpu.models import build_detector
from spsnet_tpu.models.detectors.detector3d import post_processing


from spsnet_tpu.zoo import tiny_iassd_cfg  # noqa: E402 (shared tiny config)


def synthetic_batch(rng, B=2, N=256, T=5):
    points = rng.uniform(-10, 10, size=(B, N, 4)).astype(np.float32)
    gt = np.zeros((B, T, 8), dtype=np.float32)
    for b in range(B):
        n_gt = 3
        gt[b, :n_gt, 0:2] = rng.uniform(-8, 8, size=(n_gt, 2))
        gt[b, :n_gt, 2] = rng.uniform(-1, 1, size=n_gt)
        gt[b, :n_gt, 3:6] = rng.uniform(1.0, 4.0, size=(n_gt, 3))
        gt[b, :n_gt, 6] = rng.uniform(-np.pi, np.pi, size=n_gt)
        gt[b, :n_gt, 7] = rng.integers(1, 4, size=n_gt)
        # drop some points inside the first gt box so fg exists
        points[b, :20, 0:3] = gt[b, 0, 0:3] + rng.normal(scale=0.3, size=(20, 3))
    return {'points': jnp.asarray(points), 'gt_boxes': jnp.asarray(gt)}


@pytest.fixture(scope='module')
def model_and_vars():
    cfg = tiny_iassd_cfg()
    model = build_detector(cfg, num_class=3)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return cfg, model, variables, batch


def test_forward_shapes(model_and_vars):
    cfg, model, variables, batch = model_and_vars
    out = model.apply(variables, batch, train=False)
    B = batch['points'].shape[0]
    assert out['centers'].shape == (B, 16, 3)
    assert out['centers_origin'].shape == (B, 16, 3)
    assert out['ctr_offsets'].shape == (B, 16, 3)
    assert out['batch_cls_preds'].shape == (B, 16, 3)
    assert out['batch_box_preds'].shape == (B, 16, 7)
    # vote offsets clamped to MAX_TRANSLATE_RANGE
    off = np.asarray(out['centers'] - out['centers_origin'])
    assert (np.abs(off[..., :2]) <= 3.0 + 1e-5).all()
    assert (np.abs(off[..., 2]) <= 2.0 + 1e-5).all()


def test_train_loss_finite_and_differentiable(model_and_vars):
    cfg, model, variables, batch = model_and_vars
    params = variables['params']
    other = {k: v for k, v in variables.items() if k != 'params'}

    def loss_fn(p):
        out, _ = model.apply({'params': p, **other}, batch, train=True,
                             mutable=['batch_stats'])
        loss, tb = model.apply({'params': p, **other}, out, method=model.loss)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least one nonzero gradient
    assert any(np.abs(np.asarray(g)).max() > 0 for g in flat)


def test_post_processing(model_and_vars):
    cfg, model, variables, batch = model_and_vars
    out = model.apply(variables, batch, train=False)
    dets = post_processing(out, cfg.POST_PROCESSING)
    B = batch['points'].shape[0]
    assert dets['boxes'].shape == (B, 16, 7)
    assert dets['scores'].shape == (B, 16)
    assert dets['labels'].shape == (B, 16)
    count = np.asarray(dets['count'])
    labels = np.asarray(dets['labels'])
    for b in range(B):
        assert (labels[b, :count[b]] >= 1).all()
        assert (labels[b, count[b]:] == 0).all()
