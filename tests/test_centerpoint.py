"""CenterPoint-pillar end-to-end: heatmap targets, focal+L1 losses, decode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.models import build_detector
from spsnet_tpu.zoo import tiny_centerpoint_cfg
from tests.test_pointpillar import PCR, VOXEL, make_batch


@pytest.fixture(scope='module')
def cp_setup():
    cfg = tiny_centerpoint_cfg()
    model = build_detector(cfg, num_class=3, voxel_size=tuple(VOXEL),
                           point_cloud_range=tuple(PCR))
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return cfg, model, variables, batch


def test_centerpoint_forward(cp_setup):
    cfg, model, variables, batch = cp_setup
    out = model.apply(variables, batch, train=False)
    assert out['batch_box_preds'].shape == (2, 32, 7)
    assert out['cls_preds_normalized'] is True
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()


def test_centerpoint_loss_grads(cp_setup):
    cfg, model, variables, batch = cp_setup
    other = {k: v for k, v in variables.items() if k != 'params'}

    def compute(params):
        out, _ = model.apply({'params': params, **other}, batch, train=True,
                             mutable=['batch_stats'])
        loss, tb = model.apply({'params': params, **other}, out,
                               method=model.loss)
        return loss

    loss, grads = jax.value_and_grad(compute)(variables['params'])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_heatmap_target_peaks_at_gt():
    from spsnet_tpu.models.dense_heads.center_head import assign_center_targets
    gt = np.zeros((4, 8), dtype=np.float32)
    gt[0] = [12.8, 0.0, -1.0, 3.9, 1.6, 1.56, 0.3, 1]
    hm, boxes, inds, mask, gt7 = assign_center_targets(
        jnp.asarray(gt), 3, (64, 64), 1,
        np.array([0.4, 0.4, 4], np.float32),
        np.array(PCR, np.float32), num_max_objs=8)
    hm = np.asarray(hm)
    assert hm.shape == (3, 64, 64)
    cx = int((12.8 - PCR[0]) / 0.4)
    cy = int((0.0 - PCR[1]) / 0.4)
    assert hm[0, cy, cx] == pytest.approx(1.0, abs=1e-5)
    assert hm[1].max() == 0.0        # other classes untouched
    assert int(mask[0]) == 1 and int(mask[1]) == 0
    assert int(inds[0]) == cy * 64 + cx
