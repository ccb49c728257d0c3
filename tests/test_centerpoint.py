"""CenterPoint-pillar end-to-end: heatmap targets, focal+L1 losses, decode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.config import EDict
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


def test_centerpoint_iou_variant():
    """centerpoint_iou.yaml protocol: pillar CenterPoint + CenterHeadIoU."""
    from spsnet_tpu.zoo import tiny_pointpillar_cfg
    from tests.test_pointpillar import PCR, VOXEL, make_batch
    cfg = tiny_pointpillar_cfg()
    cfg.NAME = 'CenterPoint'
    cfg.DENSE_HEAD = EDict({
        'NAME': 'CenterHeadIoU', 'CLASS_AGNOSTIC': False,
        'CLASS_NAMES_EACH_HEAD': [['Car', 'Pedestrian', 'Cyclist']],
        'SHARED_CONV_CHANNEL': 16, 'USE_BIAS_BEFORE_NORM': True,
        'NUM_HM_CONV': 2,
        'SEPARATE_HEAD_CFG': {
            'HEAD_ORDER': ['center', 'center_z', 'dim', 'rot'],
            'HEAD_DICT': {
                'center': {'out_channels': 2, 'num_conv': 2},
                'center_z': {'out_channels': 1, 'num_conv': 2},
                'dim': {'out_channels': 3, 'num_conv': 2},
                'rot': {'out_channels': 2, 'num_conv': 2},
                'iou': {'out_channels': 1, 'num_conv': 2}}},
        'TARGET_ASSIGNER_CONFIG': {
            'FEATURE_MAP_STRIDE': 2, 'NUM_MAX_OBJS': 8,
            'GAUSSIAN_OVERLAP': 0.1, 'MIN_RADIUS': 2},
        'LOSS_CONFIG': {'LOSS_WEIGHTS': {
            'cls_weight': 1.0, 'loc_weight': 0.25, 'iou_weight': 1.0,
            'code_weights': [1.0] * 8}},
        'POST_PROCESSING': {
            'SCORE_THRESH': 0.0,
            'POST_CENTER_LIMIT_RANGE': [-61.2, -61.2, -10, 61.2, 61.2, 10],
            'MAX_OBJ_PER_SAMPLE': 16,
            'RECTIFIER': [0.68],
            'NMS_CONFIG': {'NMS_NAME': 'class_specific_nms',
                           'NMS_THRESH': 0.1, 'NMS_PRE_MAXSIZE': 16,
                           'NMS_POST_MAXSIZE': 4}},
    })
    model = build_detector(cfg, num_class=3, voxel_size=tuple(VOXEL),
                           point_cloud_range=tuple(PCR),
                           class_names=['Car', 'Pedestrian', 'Cyclist'])
    rng = np.random.default_rng(2)
    batch = make_batch(rng)
    variables = jax.jit(model.init, static_argnames='train')(
        jax.random.PRNGKey(0), batch, train=True)
    out = model.apply(variables, batch, train=False)
    # one 3-class head group -> 3 classes x 4 NMS slots
    assert out['batch_box_preds'].shape == (2, 12, 7)
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()
    o, _ = model.apply(variables, batch, train=True, mutable=['batch_stats'])
    loss, tb = model.apply(variables, o, method=model.loss)
    assert np.isfinite(float(loss))
    assert any('iou_loss' in k for k in tb)
