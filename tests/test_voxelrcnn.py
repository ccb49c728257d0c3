"""Voxel R-CNN end-to-end on the synthetic sparse grid."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.config import EDict
from spsnet_tpu.models import build_detector
from tests.test_pvrcnn import GRID_ZYX, PCR, VS, make_pv_batch


def voxelrcnn_tiny_cfg(final_zyx):
    return EDict({
        'NAME': 'VoxelRCNN',
        'VFE': {'NAME': 'MeanVFE'},
        'BACKBONE_3D': {'NAME': 'VoxelBackBone8x'},
        'MAP_TO_BEV': {'NAME': 'HeightCompression',
                       'NUM_BEV_FEATURES': int(final_zyx[0]) * 128},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone',
                        'LAYER_NUMS': [1], 'LAYER_STRIDES': [1],
                        'NUM_FILTERS': [32], 'UPSAMPLE_STRIDES': [1],
                        'NUM_UPSAMPLE_FILTERS': [32]},
        'DENSE_HEAD': {
            'NAME': 'AnchorHeadSingle', 'CLASS_AGNOSTIC': False,
            'USE_DIRECTION_CLASSIFIER': True,
            'DIR_OFFSET': 0.78539, 'DIR_LIMIT_OFFSET': 0.0, 'NUM_DIR_BINS': 2,
            'ANCHOR_GENERATOR_CONFIG': [
                {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
                 'anchor_rotations': [0, 1.57],
                 'anchor_bottom_heights': [-1.78],
                 'align_center': False, 'feature_map_stride': 8,
                 'matched_threshold': 0.6, 'unmatched_threshold': 0.45}],
            'TARGET_ASSIGNER_CONFIG': {'BOX_CODER': 'ResidualCoder'},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
                'code_weights': [1.0] * 7}},
        },
        'ROI_HEAD': {
            'NAME': 'VoxelRCNNHead', 'CLASS_AGNOSTIC': True,
            'SHARED_FC': [32, 32], 'CLS_FC': [32], 'REG_FC': [32],
            'ROI_GRID_POOL': {
                'GRID_SIZE': 3,
                'FEATURES_SOURCE': ['x_conv3', 'x_conv4'],
                'POOL_LAYERS': {
                    'x_conv3': {'MLPS': [[8, 8]], 'POOL_RADIUS': [1.2],
                                'NSAMPLE': [4]},
                    'x_conv4': {'MLPS': [[8, 8]], 'POOL_RADIUS': [2.4],
                                'NSAMPLE': [4]},
                },
            },
            'NMS_CONFIG': {
                'TRAIN': {'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16,
                          'NMS_THRESH': 0.8},
                'TEST': {'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 8,
                         'NMS_THRESH': 0.85}},
            'TARGET_CONFIG': {
                'BOX_CODER': 'ResidualCoder',
                'ROI_PER_IMAGE': 16, 'FG_RATIO': 0.5,
                'SAMPLE_ROI_BY_EACH_CLASS': True,
                'CLS_SCORE_TYPE': 'roi_iou',
                'CLS_FG_THRESH': 0.75, 'CLS_BG_THRESH': 0.25,
                'CLS_BG_THRESH_LO': 0.1, 'HARD_BG_RATIO': 0.8,
                'REG_FG_THRESH': 0.55},
            'LOSS_CONFIG': {
                'CLS_LOSS': 'BinaryCrossEntropy', 'REG_LOSS': 'smooth-l1',
                'CORNER_LOSS_REGULARIZATION': True,
                'LOSS_WEIGHTS': {'rcnn_cls_weight': 1.0,
                                 'rcnn_reg_weight': 1.0,
                                 'rcnn_corner_weight': 1.0,
                                 'code_weights': [1.0] * 7}},
        },
        'POST_PROCESSING': {'SCORE_THRESH': 0.1, 'NMS_CONFIG': {
            'MULTI_CLASSES_NMS': False, 'NMS_THRESH': 0.1,
            'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16}},
    })


def test_voxelrcnn_end2end():
    rng = np.random.default_rng(0)
    batch, final_zyx = make_pv_batch(rng)
    cfg = voxelrcnn_tiny_cfg(final_zyx)
    model = build_detector(cfg, num_class=1, voxel_size=VS,
                           point_cloud_range=PCR,
                           final_grid_zyx=tuple(int(v) for v in final_zyx))
    rngs = {'params': jax.random.PRNGKey(0),
            'roi_sampling': jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, train=True)

    out = model.apply(variables, batch, train=False)
    assert out['batch_box_preds'].shape == (2, 8, 7)
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()

    other = {k: v for k, v in variables.items() if k != 'params'}

    def compute(params):
        o, _ = model.apply({'params': params, **other}, batch, train=True,
                           mutable=['batch_stats'],
                           rngs={'roi_sampling': jax.random.PRNGKey(2)})
        loss, _ = model.apply({'params': params, **other}, o,
                              method=model.loss)
        return loss

    loss, grads = jax.value_and_grad(compute)(variables['params'])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    assert any(np.abs(np.asarray(g)).max() > 0 for g in
               jax.tree_util.tree_leaves(grads['roi_head']))


def test_secondiou_end2end():
    from tests.test_pvrcnn import make_pv_batch
    rng = np.random.default_rng(1)
    batch, final_zyx = make_pv_batch(rng)
    cfg = voxelrcnn_tiny_cfg(final_zyx)
    cfg.NAME = 'SECONDNetIoU'
    cfg.ROI_HEAD = EDict({
        'NAME': 'SECONDHead', 'CLASS_AGNOSTIC': True,
        'SHARED_FC': [32], 'IOU_FC': [32],
        'ROI_GRID_POOL': {'GRID_SIZE': 4, 'IN_CHANNEL': 32},
        'BEV_STRIDE': 8, 'IOU_WEIGHT': 0.5,
        'NMS_CONFIG': {
            'TRAIN': {'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16,
                      'NMS_THRESH': 0.8},
            'TEST': {'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 8,
                     'NMS_THRESH': 0.85}},
        'TARGET_CONFIG': {
            'BOX_CODER': 'ResidualCoder',
            'ROI_PER_IMAGE': 16, 'FG_RATIO': 0.5,
            'SAMPLE_ROI_BY_EACH_CLASS': True,
            'CLS_SCORE_TYPE': 'roi_iou',
            'CLS_FG_THRESH': 0.75, 'CLS_BG_THRESH': 0.25,
            'CLS_BG_THRESH_LO': 0.1, 'HARD_BG_RATIO': 0.8,
            'REG_FG_THRESH': 0.55},
        'LOSS_CONFIG': {'LOSS_WEIGHTS': {'rcnn_iou_weight': 1.0}},
    })
    from spsnet_tpu.models import build_detector
    from tests.test_pvrcnn import PCR, VS
    model = build_detector(cfg, num_class=1, voxel_size=VS,
                           point_cloud_range=PCR,
                           final_grid_zyx=tuple(int(v) for v in final_zyx))
    rngs = {'params': jax.random.PRNGKey(0),
            'roi_sampling': jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, train=True)
    out = model.apply(variables, batch, train=False)
    assert out['batch_box_preds'].shape == (2, 8, 7)
    # since the reference-faithful rescoring rework (second_head.py emits
    # RAW logits + iou_rescoring=True; blending happens in
    # iou_rescore_post_processing, mirroring second_net_iou.py:76-180)
    assert out['cls_preds_normalized'] is False
    assert out['iou_rescoring'] is True
    from spsnet_tpu.models.detectors.detector3d import post_processing
    dets = post_processing(
        out, EDict({'SCORE_THRESH': 0.0,
                    'NMS_CONFIG': {'SCORE_TYPE': 'iou',
                                   'NMS_THRESH': 0.7,
                                   'NMS_PRE_MAXSIZE': 64,
                                   'NMS_POST_MAXSIZE': 8}}),
        class_names=['Car'])
    assert dets['boxes'].shape == (2, 8, 7)
    assert np.all(np.asarray(dets['count']) >= 0)

    other = {k: v for k, v in variables.items() if k != 'params'}

    def compute(params):
        o, _ = model.apply({'params': params, **other}, batch, train=True,
                           mutable=['batch_stats'],
                           rngs={'roi_sampling': jax.random.PRNGKey(2)})
        loss, _ = model.apply({'params': params, **other}, o,
                              method=model.loss)
        return loss

    loss, grads = jax.value_and_grad(compute)(variables['params'])
    assert np.isfinite(float(loss))
    assert any(np.abs(np.asarray(g)).max() > 0 for g in
               jax.tree_util.tree_leaves(grads['roi_head']))
