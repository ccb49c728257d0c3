"""Module-level goldens: IA-SSD forward/loss on synthetic frames (CPU, tiny)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.config import EDict
from spsnet_tpu.models import build_detector
from spsnet_tpu.models.detectors.detector3d import post_processing


def tiny_iassd_cfg():
    return EDict({
        'NAME': 'IASSD',
        'BACKBONE_3D': {
            'NAME': 'IASSD_Backbone',
            'SA_CONFIG': {
                'NPOINT_LIST': [[128], [64], [32], [16], [-1], [16]],
                'SAMPLE_RANGE_LIST': [[-1]] * 6,
                'SAMPLE_METHOD_LIST': [['D-FPS'], ['D-FPS'], ['ctr_aware'],
                                       ['ctr_aware'], [], []],
                'RADIUS_LIST': [[0.2, 0.8], [0.8, 1.6], [1.6, 4.8], [], [], [4.8, 6.4]],
                'NSAMPLE_LIST': [[4, 8], [4, 8], [4, 8], [], [], [4, 8]],
                'MLPS': [[[8, 8, 16], [8, 8, 16]],
                         [[16, 16, 32], [16, 16, 32]],
                         [[32, 32, 32], [32, 32, 32]],
                         [],
                         [32],
                         [[32, 32, 64], [32, 32, 64]]],
                'LAYER_TYPE': ['SA_Layer', 'SA_Layer', 'SA_Layer', 'SA_Layer',
                               'Vote_Layer', 'SA_Layer'],
                'DILATED_GROUP': [False] * 6,
                'AGGREGATION_MLPS': [[16], [32], [64], [64], [], [64]],
                'CONFIDENCE_MLPS': [[], [16], [32], [], [], []],
                'LAYER_INPUT': [0, 1, 2, 3, 4, 3],
                'CTR_INDEX': [-1, -1, -1, -1, -1, 5],
                'MAX_TRANSLATE_RANGE': [3.0, 3.0, 2.0],
            },
        },
        'POINT_HEAD': {
            'NAME': 'IASSD_Head',
            'CLS_FC': [32], 'REG_FC': [32],
            'CLASS_AGNOSTIC': False,
            'TARGET_CONFIG': {
                'INS_AWARE_ASSIGN': True,
                'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2],
                'ASSIGN_METHOD': {
                    'NAME': 'extend_gt', 'ASSIGN_TYPE': 'centers_origin',
                    'EXTRA_WIDTH': [1.0, 1.0, 1.0], 'FG_PC_IGNORE': False,
                },
                'BOX_CODER': 'PointResidual_BinOri_Coder',
                'BOX_CODER_CONFIG': {
                    'angle_bin_num': 12,
                    'use_mean_size': True,
                    'mean_size': [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73],
                                  [1.76, 0.6, 1.73]],
                },
            },
            'LOSS_CONFIG': {
                'LOSS_CLS': 'WeightedCrossEntropy',
                'LOSS_REG': 'WeightedSmoothL1Loss',
                'LOSS_INS': 'WeightedCrossEntropy',
                'SAMPLE_METHOD_LIST': [['D-FPS'], ['D-FPS'], ['ctr_aware'],
                                       ['ctr_aware'], [], []],
                'LOSS_VOTE_TYPE': 'none',
                'CORNER_LOSS_REGULARIZATION': True,
                'CENTERNESS_REGULARIZATION': True,
                'CENTERNESS_REGULARIZATION_SA': True,
                'LOSS_WEIGHTS': {
                    'ins_aware_weight': [0, 1.0, 1.0],
                    'vote_weight': 1.0, 'point_cls_weight': 1.0,
                    'point_box_weight': 1.0, 'corner_weight': 1.0,
                    'code_weights': [1.0] * 6, 'dir_weight': 0.2,
                },
            },
        },
        'POST_PROCESSING': {
            'SCORE_THRESH': 0.1,
            'NMS_CONFIG': {
                'MULTI_CLASSES_NMS': False, 'NMS_TYPE': 'nms_gpu',
                'NMS_THRESH': 0.01, 'NMS_PRE_MAXSIZE': 64,
                'NMS_POST_MAXSIZE': 16,
            },
        },
    })


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
