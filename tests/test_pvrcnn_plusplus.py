"""PV-RCNN++: CenterHead proposals -> SPC keypoints -> VectorPool VSA ->
VectorPool RoI grid pool (reference: detectors/pv_rcnn_plusplus.py +
waymo_models/pv_rcnn_plusplus.yaml)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.config import EDict
from spsnet_tpu.models import build_detector
from tests.test_pvrcnn import GRID_ZYX, PCR, VS, make_pv_batch


def _vp_cfg(agg_type, reduced, groups):
    cfg = {'NAME': 'VectorPoolAggregationModuleMSG',
           'NUM_GROUPS': len(groups),
           'LOCAL_AGGREGATION_TYPE': agg_type,
           'NUM_REDUCED_CHANNELS': reduced,
           'NUM_CHANNELS_OF_LOCAL_AGGREGATION': 8,
           'MSG_POST_MLPS': [16]}
    for k, (nv, r, ns) in enumerate(groups):
        cfg[f'GROUP_CFG_{k}'] = {'NUM_LOCAL_VOXEL': nv,
                                 'MAX_NEIGHBOR_DISTANCE': r,
                                 'NEIGHBOR_NSAMPLE': ns,
                                 'POST_MLPS': [8, 8]}
    return cfg


def pvrcnnpp_tiny_cfg(final_zyx):
    return EDict({
        'NAME': 'PVRCNNPlusPlus',
        'VFE': {'NAME': 'MeanVFE'},
        'BACKBONE_3D': {'NAME': 'VoxelBackBone8x'},
        'MAP_TO_BEV': {'NAME': 'HeightCompression',
                       'NUM_BEV_FEATURES': int(final_zyx[0]) * 128},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone',
                        'LAYER_NUMS': [1], 'LAYER_STRIDES': [1],
                        'NUM_FILTERS': [32], 'UPSAMPLE_STRIDES': [1],
                        'NUM_UPSAMPLE_FILTERS': [32]},
        'DENSE_HEAD': {
            'NAME': 'CenterHead', 'CLASS_AGNOSTIC': False,
            'SHARED_CONV_CHANNEL': 16,
            'TARGET_ASSIGNER_CONFIG': {
                'FEATURE_MAP_STRIDE': 8, 'NUM_MAX_OBJS': 16,
                'GAUSSIAN_OVERLAP': 0.1, 'MIN_RADIUS': 2},
            'POST_CONFIG': {'MAX_OBJ_PER_SAMPLE': 32},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'cls_weight': 1.0, 'loc_weight': 2.0,
                'code_weights': [1.0] * 8}},
        },
        'PFE': {
            'NAME': 'VoxelSetAbstraction',
            'NUM_KEYPOINTS': 64,
            'NUM_OUTPUT_FEATURES': 32,
            'SAMPLE_METHOD': 'SPC',
            'SPC_SAMPLING': {'NUM_SECTORS': 4,
                             'SAMPLE_RADIUS_WITH_ROI': 1.6},
            'FEATURES_SOURCE': ['bev', 'x_conv3', 'x_conv4', 'raw_points'],
            'SA_LAYER': {
                'raw_points': _vp_cfg('local_interpolation', 1,
                                      [([2, 2, 2], 0.4, -1),
                                       ([3, 3, 3], 0.8, -1)]),
                'x_conv3': _vp_cfg('local_interpolation', 32,
                                   [([3, 3, 3], 1.2, -1)]),
                'x_conv4': _vp_cfg('local_interpolation', 32,
                                   [([3, 3, 3], 2.4, -1)]),
            },
        },
        'POINT_HEAD': {
            'NAME': 'PointHeadSimple',
            'CLS_FC': [16],
            'CLASS_AGNOSTIC': True,
            'USE_POINT_FEATURES_BEFORE_FUSION': False,
            'TARGET_CONFIG': {'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2]},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {'point_cls_weight': 1.0}},
        },
        'ROI_HEAD': {
            'NAME': 'PVRCNNHead', 'CLASS_AGNOSTIC': True,
            'SHARED_FC': [32, 32], 'CLS_FC': [32], 'REG_FC': [32],
            'ROI_GRID_POOL': dict(
                _vp_cfg('voxel_random_choice', 16,
                        [([2, 2, 2], 0.8, 8), ([2, 2, 2], 1.6, 8)]),
                GRID_SIZE=3, IN_CHANNEL=32),
            'NMS_CONFIG': {
                'TRAIN': {'NMS_PRE_MAXSIZE': 32, 'NMS_POST_MAXSIZE': 16,
                          'NMS_THRESH': 0.8},
                'TEST': {'NMS_PRE_MAXSIZE': 32, 'NMS_POST_MAXSIZE': 8,
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
def pvpp_setup():
    rng = np.random.default_rng(0)
    batch, final_zyx = make_pv_batch(rng)
    cfg = pvrcnnpp_tiny_cfg(final_zyx)
    model = build_detector(cfg, num_class=1, voxel_size=VS,
                           point_cloud_range=PCR,
                           final_grid_zyx=tuple(int(v) for v in final_zyx))
    rngs = {'params': jax.random.PRNGKey(0),
            'roi_sampling': jax.random.PRNGKey(1)}
    variables = jax.jit(model.init, static_argnames='train')(
        rngs, batch, train=True)
    return cfg, model, variables, batch


def test_pvrcnnpp_forward(pvpp_setup):
    cfg, model, variables, batch = pvpp_setup
    out = model.apply(variables, batch, train=False)
    # heatmap is 2x2 at this tiny grid -> 4 peak proposals survive
    assert out['batch_box_preds'].shape == (2, 4, 7)
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()
    # SPC keypoints: some slots valid, invalid ones pushed to the far sentinel
    pv = np.asarray(out['point_valid'])
    pc = np.asarray(out['point_coords'])
    assert pv.any()
    if (~pv).any():
        assert (np.abs(pc[~pv]) > 1e5).all()
    assert np.abs(pc[pv]).max() < 100


def test_pvrcnnpp_loss_and_grads(pvpp_setup):
    cfg, model, variables, batch = pvpp_setup
    other = {k: v for k, v in variables.items() if k != 'params'}

    def compute(params):
        o, _ = model.apply({'params': params, **other}, batch, train=True,
                           mutable=['batch_stats'],
                           rngs={'roi_sampling': jax.random.PRNGKey(2)})
        loss, _ = model.apply({'params': params, **other}, o,
                              method=model.loss)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(compute))(variables['params'])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    for key in ['roi_head', 'pfe', 'dense_head']:
        sub = jax.tree_util.tree_leaves(grads[key])
        assert any(np.abs(np.asarray(g)).max() > 0 for g in sub), key


def test_sector_fps_quota_and_coverage():
    """Sector quotas follow the reference formula and picks stay in-mask."""
    from spsnet_tpu.models.pfe.voxel_set_abstraction import sector_fps_dense
    rng = np.random.default_rng(1)
    N, K, S = 512, 64, 4
    xyz = rng.uniform(-10, 10, (1, N, 3)).astype(np.float32)
    mask = rng.uniform(size=(1, N)) < 0.5
    idx, valid = jax.jit(
        lambda x, m: sector_fps_dense(x, m, K, S))(jnp.asarray(xyz),
                                                   jnp.asarray(mask))
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert valid.sum() > 0
    # every valid pick must come from the mask
    assert mask[0, idx[0][valid[0]]].all()
    # no duplicate picks among valid slots
    picks = idx[0][valid[0]]
    assert len(np.unique(picks)) == len(picks)


def test_roi_proximity_mask():
    from spsnet_tpu.models.pfe.voxel_set_abstraction import \
        sample_points_with_roi_mask
    pts = jnp.asarray([[[0.0, 0.0, 0.0], [50.0, 50.0, 0.0]]])
    rois = jnp.zeros((1, 3, 7)).at[0, 0].set(
        jnp.asarray([0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0]))
    m = np.asarray(sample_points_with_roi_mask(pts, rois, 1.6))
    assert bool(m[0, 0]) and not bool(m[0, 1])
    # all-padding rois -> fallback keeps point 0 only
    m2 = np.asarray(sample_points_with_roi_mask(
        pts, jnp.zeros((1, 3, 7)), 1.6))
    assert bool(m2[0, 0]) and not bool(m2[0, 1])


def test_vector_pool_interp_cells_brute_force():
    """local_interpolation cell features vs a numpy 3NN/IDW brute force."""
    from spsnet_tpu.models.model_utils.vector_pool import (
        VectorPoolAggregation, grid_offsets)
    rng = np.random.default_rng(3)
    B, N, M = 1, 64, 4
    R = 0.8
    xyz = rng.uniform(-2, 2, (B, N, 3)).astype(np.float32)
    feats = rng.normal(size=(B, N, 4)).astype(np.float32)
    new_xyz = rng.uniform(-1, 1, (B, M, 3)).astype(np.float32)

    mod = VectorPoolAggregation(
        num_local_voxel=(2, 2, 2), max_neighbor_distance=R,
        post_mlps=(8,), num_reduced_channels=4)
    offs = grid_offsets((2, 2, 2), R)
    centers = new_xyz[:, :, None, :] + offs[None, None]
    got = np.asarray(mod._interp_cells(
        jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(centers)))
    got = got.reshape(M, 8, 13)           # (r=4) + 9 xyz-enc

    for m in range(M):
        for g in range(8):
            c = centers[0, m, g]
            d2 = ((xyz[0] - c) ** 2).sum(-1)
            nn3 = np.argsort(d2, kind='stable')[:3]
            gate = d2[nn3] <= (R * 2.0) ** 2
            if not gate.any():
                np.testing.assert_allclose(got[m, g], 0.0, atol=1e-6)
                continue
            w = np.where(gate, 1.0 / (d2[nn3] + 1e-8), 0.0)
            w = w / w.sum()
            want_feat = (feats[0, nn3] * w[:, None]).sum(0)
            want_xyz = ((c - xyz[0, nn3]) * gate[:, None]).reshape(9)
            np.testing.assert_allclose(got[m, g, :4], want_feat, atol=2e-5)
            np.testing.assert_allclose(got[m, g, 4:], want_xyz, atol=2e-5)


def test_vector_pool_voxel_cells_brute_force():
    """voxel_avg_pool cell means vs numpy binning of cube-query neighbors."""
    from spsnet_tpu.models.model_utils.vector_pool import VectorPoolAggregation
    rng = np.random.default_rng(4)
    B, N, M, K = 1, 96, 3, 32
    R = 1.0
    xyz = rng.uniform(-3, 3, (B, N, 3)).astype(np.float32)
    feats = rng.normal(size=(B, N, 2)).astype(np.float32)
    new_xyz = rng.uniform(-1, 1, (B, M, 3)).astype(np.float32)
    mod = VectorPoolAggregation(
        num_local_voxel=(2, 2, 2), max_neighbor_distance=R,
        post_mlps=(8,), num_reduced_channels=2,
        local_aggregation_type='voxel_avg_pool', neighbor_nsample=K)
    got = np.asarray(mod._voxel_cells(
        jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(new_xyz)))

    for m in range(M):
        local = xyz[0] - new_xyz[0, m]
        inside = np.abs(local).max(-1) <= R
        cand = np.where(inside)[0][:K]           # first-K in index order
        cells = np.floor((local[cand] + R) / (2 * R) * 2).clip(0, 1)
        flat = (cells[:, 0] * 4 + cells[:, 1] * 2 + cells[:, 2]).astype(int)
        for g in range(8):
            sel = cand[flat == g]
            if len(sel) == 0:
                np.testing.assert_allclose(got[0, m, g], 0.0, atol=1e-6)
            else:
                want = np.concatenate([local[sel].mean(0),
                                       feats[0, sel].mean(0)])
                np.testing.assert_allclose(got[0, m, g], want, atol=2e-5)
