"""PointRCNN two-stage end-to-end on synthetic frames."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.models import build_detector
from spsnet_tpu.models.detectors.point_rcnn import pointrcnn_loss
from spsnet_tpu.zoo import tiny_pointrcnn_cfg
from tests.test_model_iassd import synthetic_batch


@pytest.fixture(scope='module')
def prcnn_setup():
    cfg = tiny_pointrcnn_cfg()
    model = build_detector(cfg, num_class=3)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, B=2, N=128)
    rngs = {'params': jax.random.PRNGKey(0),
            'roi_sampling': jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, train=True)
    return cfg, model, variables, batch


def test_pointrcnn_eval_forward(prcnn_setup):
    cfg, model, variables, batch = prcnn_setup
    out = model.apply(variables, batch, train=False)
    # eval path: refined boxes from the roi head, R = TEST post maxsize
    assert out['batch_box_preds'].shape == (2, 8, 7)
    assert out['batch_cls_preds'].shape == (2, 8, 1)
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()


def test_pointrcnn_train_loss(prcnn_setup):
    cfg, model, variables, batch = prcnn_setup
    model_built = model.bind(variables, rngs={'roi_sampling': jax.random.PRNGKey(1)})
    point_coder = model_built.point_head.box_coder
    roi_coder = model_built.roi_head.box_coder
    other = {k: v for k, v in variables.items() if k != 'params'}

    def compute(params):
        out, _ = model.apply(
            {'params': params, **other}, batch, train=True,
            mutable=['batch_stats'],
            rngs={'roi_sampling': jax.random.PRNGKey(2)})
        from spsnet_tpu.config import StaticConfig
        loss, tb = pointrcnn_loss(out, model.model_cfg, 3, point_coder,
                                  roi_coder)
        return loss

    loss, grads = jax.value_and_grad(compute)(variables['params'])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # both stages must receive gradient
    assert any(np.abs(np.asarray(g)).max() > 0 for g in
               jax.tree_util.tree_leaves(grads['roi_head']))
    assert any(np.abs(np.asarray(g)).max() > 0 for g in
               jax.tree_util.tree_leaves(grads['point_head']))


def test_roipoint_pool3d():
    from spsnet_tpu.models.roi_heads.roi_utils import roipoint_pool3d
    rng = np.random.default_rng(0)
    points = rng.uniform(-5, 5, size=(1, 200, 3)).astype(np.float32)
    feats = rng.normal(size=(1, 200, 4)).astype(np.float32)
    rois = np.array([[[0, 0, 0, 4, 4, 4, 0.3],
                      [100, 100, 100, 1, 1, 1, 0.0]]], dtype=np.float32)
    pooled, empty = roipoint_pool3d(jnp.asarray(points), jnp.asarray(feats),
                                    jnp.asarray(rois), num_sampled_points=16)
    pooled, empty = np.asarray(pooled), np.asarray(empty)
    assert pooled.shape == (1, 2, 16, 7)
    assert not empty[0, 0] and empty[0, 1]
    # pooled points of roi 0 are really inside it
    from tests.reference_impls import points_in_boxes_ref
    inside = points_in_boxes_ref(pooled[0, 0, :, :3][None], rois[:, :1])
    assert (inside[0] == 0).all()
