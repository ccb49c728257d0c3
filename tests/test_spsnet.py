"""SPSNet-IA end-to-end on synthetic frames: stability stds -> delete hook ->
PAGNet backbone (surface features, sss_aware sampling) -> MLT head loss."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.config import EDict
from spsnet_tpu.models import build_detector
from spsnet_tpu.runtime.trainer import make_loss_fn
from spsnet_tpu.stability.hook import stability_delete_points
from spsnet_tpu.zoo import tiny_spsnet_cfg
from tests.test_model_iassd import synthetic_batch


@pytest.fixture(scope='module')
def spsnet_setup():
    cfg = tiny_spsnet_cfg()
    model = build_detector(cfg, num_class=3)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, B=2, N=256)
    batch['stds'] = jnp.asarray(
        rng.uniform(0.1, 30.0, size=(2, 256)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return cfg, model, variables, batch


def test_spsnet_forward(spsnet_setup):
    cfg, model, variables, batch = spsnet_setup
    out = model.apply(variables, batch, train=False)
    assert out['batch_box_preds'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()


def test_spsnet_loss_differentiable(spsnet_setup):
    cfg, model, variables, batch = spsnet_setup
    loss_fn = make_loss_fn(cfg, num_class=3)
    other = {k: v for k, v in variables.items() if k != 'params'}

    def compute(params):
        out, _ = model.apply({'params': params, **other}, batch, train=True,
                             mutable=['batch_stats'])
        loss, tb = loss_fn(out)
        return loss

    loss, grads = jax.value_and_grad(compute)(variables['params'])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # surface-feature params must receive gradient
    sf = grads['backbone_3d']['sf_extract']
    assert any(np.abs(np.asarray(g)).max() > 0
               for g in jax.tree_util.tree_leaves(sf))


def test_full_pipeline_with_delete_hook(spsnet_setup):
    cfg, model, variables, batch = spsnet_setup
    rng = np.random.default_rng(1)
    fake = (rng.uniform(size=(2, 256)) < 0.3).astype(np.int32)
    new_points, keep_idx = stability_delete_points(
        batch['points'], batch['stds'], jnp.asarray(fake),
        jax.random.PRNGKey(0), delete_number=32)
    sub_batch = dict(batch)
    sub_batch['points'] = new_points
    sub_batch['stds'] = jnp.take_along_axis(batch['stds'], keep_idx, axis=1)
    out = model.apply(variables, sub_batch, train=False)
    assert out['batch_box_preds'].shape == (2, 16, 7)
