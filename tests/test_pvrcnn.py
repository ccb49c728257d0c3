"""PV-RCNN end-to-end: sparse backbone + VSA keypoints + PKW + RoI-grid head."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.config import EDict
from spsnet_tpu.data.processor.sparse_plan import build_sparse_plan
from spsnet_tpu.models import build_detector

PCR = (0, -6.4, -3, 12.8, 6.4, 1)
VS = (0.8, 0.8, 0.0625)
GRID_ZYX = (64, 16, 16)


def make_pv_batch(rng, B=2, V=64, N=256):
    frames = []
    for _ in range(B):
        coords = np.unique(np.stack(
            [rng.integers(0, g, V) for g in GRID_ZYX], axis=1), axis=0)
        n = len(coords)
        pad = np.zeros((V, 3), dtype=np.int64)
        pad[:n] = coords
        valid = np.arange(V) < n
        plan = build_sparse_plan(pad, valid, GRID_ZYX,
                                 max_voxels_per_level=V)
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
    pts = np.zeros((B, N, 4), dtype=np.float32)
    pts[..., 0] = rng.uniform(0.5, 12, (B, N))
    pts[..., 1] = rng.uniform(-6, 6, (B, N))
    pts[..., 2] = rng.uniform(-2, 0.5, (B, N))
    batch['points'] = jnp.asarray(pts)
    gt = np.zeros((B, 4, 8), dtype=np.float32)
    gt[:, :2, 0] = rng.uniform(2, 10, (B, 2))
    gt[:, :2, 1] = rng.uniform(-4, 4, (B, 2))
    gt[:, :2, 2] = -1.0
    gt[:, :2, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :2, 7] = 1
    batch['gt_boxes'] = jnp.asarray(gt)
    return batch, np.asarray(frames[0]['final_grid'])


def pvrcnn_tiny_cfg(final_zyx):
    return EDict({
        'NAME': 'PVRCNN',
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
        'PFE': {
            'NAME': 'VoxelSetAbstraction',
            'NUM_KEYPOINTS': 64,
            'NUM_OUTPUT_FEATURES': 32,
            'FEATURES_SOURCE': ['bev', 'x_conv3', 'x_conv4', 'raw_points'],
            'SA_LAYER': {
                'raw_points': {'MLPS': [[8, 8], [8, 8]],
                               'POOL_RADIUS': [0.4, 0.8], 'NSAMPLE': [4, 4]},
                'x_conv3': {'DOWNSAMPLE_FACTOR': 4,
                            'MLPS': [[8, 8], [8, 8]],
                            'POOL_RADIUS': [1.2, 2.4], 'NSAMPLE': [4, 4]},
                'x_conv4': {'DOWNSAMPLE_FACTOR': 8,
                            'MLPS': [[8, 8], [8, 8]],
                            'POOL_RADIUS': [2.4, 4.8], 'NSAMPLE': [4, 4]},
            },
        },
        'POINT_HEAD': {
            'NAME': 'PointHeadSimple',
            'CLS_FC': [16],
            'CLASS_AGNOSTIC': True,
            'USE_POINT_FEATURES_BEFORE_FUSION': True,
            'TARGET_CONFIG': {'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2]},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {'point_cls_weight': 1.0}},
        },
        'ROI_HEAD': {
            'NAME': 'PVRCNNHead', 'CLASS_AGNOSTIC': True,
            'SHARED_FC': [32, 32],
            'CLS_FC': [32], 'REG_FC': [32],
            'ROI_GRID_POOL': {'GRID_SIZE': 3,
                              'MLPS': [[8, 8], [8, 8]],
                              'POOL_RADIUS': [0.8, 1.6], 'NSAMPLE': [4, 4]},
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


@pytest.fixture(scope='module')
def pv_setup():
    rng = np.random.default_rng(0)
    batch, final_zyx = make_pv_batch(rng)
    cfg = pvrcnn_tiny_cfg(final_zyx)
    model = build_detector(cfg, num_class=1, voxel_size=VS,
                           point_cloud_range=PCR,
                           final_grid_zyx=tuple(int(v) for v in final_zyx))
    rngs = {'params': jax.random.PRNGKey(0),
            'roi_sampling': jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, train=True)
    return cfg, model, variables, batch


def test_pvrcnn_eval_forward(pv_setup):
    cfg, model, variables, batch = pv_setup
    out = model.apply(variables, batch, train=False)
    assert out['batch_box_preds'].shape == (2, 8, 7)
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()


def test_pvrcnn_train_loss(pv_setup):
    cfg, model, variables, batch = pv_setup
    other = {k: v for k, v in variables.items() if k != 'params'}

    def compute(params):
        out, _ = model.apply({'params': params, **other}, batch, train=True,
                             mutable=['batch_stats'],
                             rngs={'roi_sampling': jax.random.PRNGKey(2)})
        loss, tb = model.apply({'params': params, **other}, out,
                               method=model.loss)
        return loss

    loss, grads = jax.value_and_grad(compute)(variables['params'])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    for part in ('pfe', 'roi_head', 'dense_head'):
        assert any(np.abs(np.asarray(g)).max() > 0 for g in
                   jax.tree_util.tree_leaves(grads[part])), part
