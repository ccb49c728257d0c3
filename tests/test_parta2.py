"""PartA2 end-to-end: UNet decoder (inverse sparse conv), part head,
RoI-aware pooling refinement."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.config import EDict
from spsnet_tpu.data.processor.sparse_plan import (build_sparse_plan,
                                                   spconv_up_table,
                                                   spconv_down)
from spsnet_tpu.models import build_detector
from tests.test_pvrcnn import GRID_ZYX, PCR, VS


def test_up_table_inverts_down():
    rng = np.random.default_rng(0)
    grid = (8, 8, 8)
    coords = np.unique(np.stack(
        [rng.integers(0, g, 30) for g in grid], axis=1), axis=0)
    V = len(coords)
    valid = np.ones(V, dtype=bool)
    oc, ov, down_t, new_grid = spconv_down(
        coords, valid, grid, (2, 2, 2), (1, 1, 1), (3, 3, 3), max_out=64)
    up_t = spconv_up_table(coords, valid, grid, oc, ov, new_grid,
                           (2, 2, 2), (1, 1, 1), (3, 3, 3))
    assert up_t.shape == (V, 27)
    # duality: fine i gathers coarse j at offset k  <=>  coarse j gathered
    # fine i at the same offset in the down table
    n_out = int(ov.sum())
    pairs_down = {(int(i), int(j)) for j in range(n_out)
                  for i in down_t[j] if i != V}
    pairs_up = {(int(i), int(j)) for i in range(V)
                for j in up_t[i] if j != 64}
    assert pairs_up == pairs_down


def make_parta2_batch(rng, B=2, V=64):
    frames = []
    for _ in range(B):
        coords = np.unique(np.stack(
            [rng.integers(0, g, V) for g in GRID_ZYX], axis=1), axis=0)
        n = len(coords)
        pad = np.zeros((V, 3), dtype=np.int64)
        pad[:n] = coords
        valid = np.arange(V) < n
        plan = build_sparse_plan(pad, valid, GRID_ZYX,
                                 max_voxels_per_level=V, with_up_tables=True)
        plan['voxel_coords'] = pad
        plan['voxel_valid'] = valid
        frames.append(plan)
    batch = {}
    for key in frames[0]:
        if key == 'final_grid':
            continue
        batch[key] = jnp.asarray(np.stack([f[key] for f in frames]))
    batch['voxels'] = jnp.asarray(
        rng.normal(size=(B, V, 5, 4)).astype(np.float32))
    batch['voxel_num_points'] = jnp.asarray(np.full((B, V), 5, np.int32))
    gt = np.zeros((B, 4, 8), dtype=np.float32)
    gt[:, :2, 0] = rng.uniform(2, 10, (B, 2))
    gt[:, :2, 1] = rng.uniform(-4, 4, (B, 2))
    gt[:, :2, 2] = -1.0
    gt[:, :2, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :2, 7] = 1
    batch['gt_boxes'] = jnp.asarray(gt)
    return batch, np.asarray(frames[0]['final_grid'])


def parta2_tiny_cfg(final_zyx):
    return EDict({
        'NAME': 'PartA2Net',
        'VFE': {'NAME': 'MeanVFE'},
        'BACKBONE_3D': {'NAME': 'UNetV2'},
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
        'POINT_HEAD': {
            'NAME': 'PointIntraPartOffsetHead',
            'CLS_FC': [16], 'PART_FC': [16],
            'TARGET_CONFIG': {'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2]},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {'point_cls_weight': 1.0,
                                             'point_part_weight': 1.0}},
        },
        'ROI_HEAD': {
            'NAME': 'PartA2FCHead', 'CLASS_AGNOSTIC': True,
            'SHARED_FC': [32, 32], 'CLS_FC': [32], 'REG_FC': [32],
            'ROI_AWARE_POOL': {'POOL_SIZE': 4, 'NUM_FEATURES': 32},
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


def test_parta2_end2end():
    rng = np.random.default_rng(0)
    batch, final_zyx = make_parta2_batch(rng)
    cfg = parta2_tiny_cfg(final_zyx)
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
    for part in ('backbone_3d', 'point_head', 'roi_head'):
        assert any(np.abs(np.asarray(g)).max() > 0 for g in
                   jax.tree_util.tree_leaves(grads[part])), part


def parta2_free_tiny_cfg():
    """Anchor-free variant (reference PartA2_free.yaml): no BEV branch, the
    intra-part head predicts per-point boxes that seed the RoI head."""
    base = parta2_tiny_cfg((2,))
    return EDict({
        'NAME': 'PointRCNN',
        'VFE': {'NAME': 'MeanVFE'},
        'BACKBONE_3D': {'NAME': 'UNetV2', 'RETURN_ENCODED_TENSOR': False},
        'POINT_HEAD': {
            'NAME': 'PointIntraPartOffsetHead',
            'CLS_FC': [16], 'PART_FC': [16], 'REG_FC': [16],
            'CLASS_AGNOSTIC': False,
            'TARGET_CONFIG': {
                'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2],
                'BOX_CODER': 'PointResidualCoder',
                'BOX_CODER_CONFIG': {
                    'use_mean_size': True,
                    'mean_size': [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73],
                                  [1.76, 0.6, 1.73]]}},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'point_cls_weight': 1.0, 'point_box_weight': 1.0,
                'point_part_weight': 1.0, 'code_weights': [1.0] * 8}},
        },
        'ROI_HEAD': dict(base.ROI_HEAD, DISABLE_PART=True,
                         SEG_MASK_SCORE_THRESH=0.0),
        'POST_PROCESSING': base.POST_PROCESSING,
    })


def test_parta2_free_end2end():
    """PartA2FreeNet: forward emits proposals from the point head (no RPN);
    train step has finite loss/grads through all three submodules incl. the
    new per-point box branch."""
    rng = np.random.default_rng(1)
    batch, final_zyx = make_parta2_batch(rng)
    cfg = parta2_free_tiny_cfg()
    model = build_detector(cfg, num_class=3, voxel_size=VS,
                           point_cloud_range=PCR)
    from spsnet_tpu.models.detectors.part_a2 import PartA2FreeNet
    assert isinstance(model, PartA2FreeNet)   # dispatch on UNetV2 backbone
    rngs = {'params': jax.random.PRNGKey(0),
            'roi_sampling': jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, train=True)
    # no BEV/encoded branch and no conv_out params in this variant
    assert 'conv_out' not in variables['params']['backbone_3d']

    out = model.apply(variables, batch, train=False)
    assert out['batch_box_preds'].shape == (2, 8, 7)
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()

    other = {k: v for k, v in variables.items() if k != 'params'}

    def compute(params):
        o, _ = model.apply({'params': params, **other}, batch, train=True,
                           mutable=['batch_stats'],
                           rngs={'roi_sampling': jax.random.PRNGKey(2)})
        loss, tb = model.apply({'params': params, **other}, o,
                               method=model.loss)
        return loss, tb

    (loss, tb), grads = jax.value_and_grad(compute, has_aux=True)(
        variables['params'])
    assert np.isfinite(float(loss))
    assert 'point_box_loss' in tb
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    for part in ('backbone_3d', 'point_head', 'roi_head'):
        assert any(np.abs(np.asarray(g)).max() > 0 for g in
                   jax.tree_util.tree_leaves(grads[part])), part
    # the box branch itself learns
    assert any(np.abs(np.asarray(g)).max() > 0 for g in
               jax.tree_util.tree_leaves(grads['point_head']['box_layers']))
