"""AL/MLT-SSD family end-to-end: pillar BEV + range-view dual branch with
CenterHeadIoU (reference: AL.yaml / MLT_SSD.yaml driven through PAGNet)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.config import EDict
from spsnet_tpu.data.processor.data_processor import DataProcessor
from spsnet_tpu.models import build_detector

PCR = [0, -12.8, -3, 25.6, 12.8, 1]
VOXEL = [0.8, 0.8, 4]          # -> pillar grid nx=32, ny=32


def alnet_tiny_cfg():
    return EDict({
        'NAME': 'PAGNet',       # reference drives this family through PAGNet
        'VFE': {'NAME': 'PillarVFE', 'WITH_DISTANCE': False,
                'USE_ABSLOTE_XYZ': True, 'USE_NORM': True,
                'NUM_FILTERS': [16, 16]},
        'MAP_TO_BEV': {'NAME': 'Sparse2BEV', 'NUM_BEV_FEATURES': 16},
        'BACKBONE_3D': {
            'NAME': 'AL_3D',
            'NUM_RANGE_FEATURES': 8,
            'NUM_BEV_FEATURES': 16,
            'NUM_RANGE_SEG_FEATURES': 16,
            'NUM_BEV_SEG_FEATURES': 16,
            'NUM_FUSION_FEATURES': 64,
            'SEM_CLS': 4,
            'PC_FOV': [-30.0, 10.0, -180, 180],
            'BEV_SHAPE': [32, 32],
            'RANGE_SHAPE': [8, 64],
            'POINT_CLOUD_RANGE': PCR,
        },
        'BACKBONE_2D': {'NAME': 'RB_Fusion', 'BEV_DIM': 64, 'RANGE_DIM': 32},
        'DENSE_HEAD': {
            'NAME': 'CenterHeadIoU', 'CLASS_AGNOSTIC': False,
            'CLASS_NAMES_EACH_HEAD': [['Car'], ['Pedestrian'], ['Cyclist']],
            'SHARED_CONV_CHANNEL': 16,
            'USE_BIAS_BEFORE_NORM': True,
            'NUM_HM_CONV': 2,
            'SEPARATE_HEAD_CFG': {
                'HEAD_ORDER': ['center', 'center_z', 'dim', 'rot'],
                'HEAD_DICT': {
                    'center': {'out_channels': 2, 'num_conv': 2},
                    'center_z': {'out_channels': 1, 'num_conv': 2},
                    'dim': {'out_channels': 3, 'num_conv': 2},
                    'rot': {'out_channels': 2, 'num_conv': 2},
                    'iou': {'out_channels': 1, 'num_conv': 2},
                }},
            'TARGET_ASSIGNER_CONFIG': {
                'FEATURE_MAP_STRIDE': 4, 'NUM_MAX_OBJS': 8,
                'GAUSSIAN_OVERLAP': 0.1, 'MIN_RADIUS': 2},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'cls_weight': 1.0, 'loc_weight': 0.25, 'iou_weight': 1.0,
                'code_weights': [1.0] * 8}},
            'POST_PROCESSING': {
                'SCORE_THRESH': 0.0,
                'POST_CENTER_LIMIT_RANGE': [-61.2, -61.2, -10.0,
                                            61.2, 61.2, 10.0],
                'MAX_OBJ_PER_SAMPLE': 16,
                'RECTIFIER': [0.7, 0.65, 0.53],
                'NMS_CONFIG': {'NMS_NAME': 'class_specific_nms',
                               'NMS_THRESH': 0.01,
                               'NMS_PRE_MAXSIZE': 16,
                               'NMS_POST_MAXSIZE': 4}},
        },
        'POST_PROCESSING': {'RECALL_THRESH_LIST': [0.3, 0.5, 0.7],
                            'EVAL_METRIC': 'kitti'},
    })


def make_al_batch(rng, B=2, N=512):
    proc = DataProcessor(
        [EDict({'NAME': 'transform_points_to_voxels',
                'VOXEL_SIZE': VOXEL,
                'MAX_POINTS_PER_VOXEL': 8,
                'MAX_NUMBER_OF_VOXELS': {'train': 256, 'test': 256}})],
        np.array(PCR, dtype=np.float32), training=True)
    frames, points = [], []
    for _ in range(B):
        pts = np.zeros((N, 4), dtype=np.float32)
        pts[:, 0] = rng.uniform(0.5, 25, N)
        pts[:, 1] = rng.uniform(-12, 12, N)
        pts[:, 2] = rng.uniform(-2, 0.5, N)
        pts[:, 3] = rng.uniform(0, 1, N)
        frames.append(proc.forward({'points': pts.copy()}))
        points.append(pts)
    gt = np.zeros((B, 6, 8), dtype=np.float32)
    gt[:, :3, 0] = rng.uniform(3, 22, (B, 3))
    gt[:, :3, 1] = rng.uniform(-10, 10, (B, 3))
    gt[:, :3, 2] = -1.0
    gt[:, :3, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :3, 6] = rng.uniform(-np.pi, np.pi, (B, 3))
    gt[:, :3, 7] = [1, 2, 3]
    return {
        'points': jnp.asarray(np.stack(points)),
        'voxels': jnp.asarray(np.stack([f['voxels'] for f in frames])),
        'voxel_coords': jnp.asarray(
            np.stack([f['voxel_coords'] for f in frames])),
        'voxel_num_points': jnp.asarray(
            np.stack([f['voxel_num_points'] for f in frames])),
        'voxel_valid': jnp.asarray(
            np.stack([f['voxel_valid'] for f in frames])),
        'gt_boxes': jnp.asarray(gt),
    }


@pytest.fixture(scope='module')
def al_setup():
    cfg = alnet_tiny_cfg()
    model = build_detector(cfg, num_class=3, voxel_size=tuple(VOXEL),
                           point_cloud_range=tuple(PCR),
                           class_names=['Car', 'Pedestrian', 'Cyclist'])
    rng = np.random.default_rng(0)
    batch = make_al_batch(rng)
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    variables = jax.jit(model.init, static_argnames='train')(
        rngs, batch, train=False)
    return cfg, model, variables, batch


def test_alnet_forward(al_setup):
    cfg, model, variables, batch = al_setup
    out = model.apply(variables, batch, train=False)
    # 3 single-class heads x NMS_POST_MAXSIZE=4 slots
    assert out['batch_box_preds'].shape == (2, 12, 7)
    assert out['batch_cls_preds'].shape == (2, 12, 3)
    assert out['cls_preds_normalized'] is True
    assert out['sem_pred'].shape == (2, 512, 4)
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()
    lbl = np.asarray(out['final_labels'])
    assert set(np.unique(lbl)).issubset({0, 1, 2, 3})


def test_alnet_loss_and_grads(al_setup):
    cfg, model, variables, batch = al_setup
    other = {k: v for k, v in variables.items() if k != 'params'}

    def compute(params):
        o, _ = model.apply({'params': params, **other}, batch, train=True,
                           mutable=['batch_stats'],
                           rngs={'dropout': jax.random.PRNGKey(2)})
        loss, tb = model.apply({'params': params, **other}, o,
                               method=model.loss)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(compute))(variables['params'])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # every major submodule should receive gradient
    for key in ['backbone_3d', 'dense_head', 'vfe']:
        sub = jax.tree_util.tree_leaves(grads[key])
        assert any(np.abs(np.asarray(g)).max() > 0 for g in sub), key


def test_projection_roundtrip():
    """Scatter-max then gather at cell centers returns the max feature."""
    from spsnet_tpu.models.backbones_2d import projection
    pts = jnp.asarray([[[1.0, 1.0, 0.0], [1.0, 1.0, 0.0], [9.0, 9.0, 0.0]]])
    u, v, keep = projection.bev_coords(pts, [0, 0, -3, 10, 10, 1], (10, 10))
    assert bool(keep.all())
    feats = jnp.asarray([[[1.0], [5.0], [2.0]]])
    grid = projection.p2g_max(feats, u, v, keep, (10, 10))
    assert float(grid[0, 1, 1, 0]) == 5.0        # max of the two co-located
    assert float(grid[0, 9, 9, 0]) == 2.0
    back = projection.g2p_bilinear(grid, u, v, keep)
    assert np.isfinite(np.asarray(back)).all()


def test_range_projection_fov_mask():
    from spsnet_tpu.models.backbones_2d import projection
    fov = projection.process_fov([-30.0, 10.0])
    pts = jnp.asarray([[[5.0, 0.0, -1.0],      # theta ~ -11deg: inside
                        [5.0, 0.0, 4.0]]])     # theta ~ +39deg: outside
    u, v, keep = projection.range_coords(pts, fov, (8, 64))
    assert bool(keep[0, 0]) and not bool(keep[0, 1])


def test_cpgnet_criterion_properties():
    """Dynamic-log weighting + Lovasz behave sanely on a toy problem."""
    from spsnet_tpu.utils.loss_utils import cpgnet_criterion, lovasz_softmax
    rng = np.random.default_rng(0)
    P, C = 256, 4
    target = jnp.asarray(rng.integers(0, C, P))
    # perfect predictions -> tiny loss; random -> bigger
    perfect = jax.nn.one_hot(target, C) * 20.0
    noise = jnp.asarray(rng.normal(size=(P, C)).astype(np.float32))
    l_perfect = cpgnet_criterion(perfect, target)['loss']
    l_noise = cpgnet_criterion(noise, target)['loss']
    assert float(l_perfect) < 0.01
    assert float(l_noise) > float(l_perfect) + 0.5
    # lovasz of perfect probs ~ 0
    ls = lovasz_softmax(jax.nn.softmax(perfect, -1), target)
    assert float(ls) < 1e-3
    # invalid points are ignored
    valid = jnp.zeros((P,), bool).at[:16].set(True)
    l_masked = cpgnet_criterion(noise, target, valid=valid)['loss']
    assert np.isfinite(float(l_masked))


def test_alnet_sem_task_losses(al_setup):
    """SEM_TASK-only and USE_DET_FOR_SEM loss paths with sem labels."""
    cfg, model, variables, batch = al_setup
    rng = np.random.default_rng(7)
    sem = rng.integers(0, 4, (2, 512)).astype(np.int32)
    b2 = dict(batch)
    b2['sem_labels'] = jnp.asarray(sem)
    other = {k: v for k, v in variables.items() if k != 'params'}

    from spsnet_tpu.config import EDict, StaticConfig
    for mode in ('SEM_TASK', 'USE_DET_FOR_SEM'):
        cfg2 = EDict({k: v for k, v in cfg.items()})
        cfg2.DENSE_HEAD = EDict({k: v for k, v in cfg.DENSE_HEAD.items()})
        cfg2.DENSE_HEAD[mode] = True
        from spsnet_tpu.models import build_detector
        m2 = build_detector(cfg2, num_class=3, voxel_size=(0.8, 0.8, 4),
                            point_cloud_range=tuple(
                                [0, -12.8, -3, 25.6, 12.8, 1]),
                            class_names=['Car', 'Pedestrian', 'Cyclist'])
        o, _ = m2.apply(variables, b2, train=True, mutable=['batch_stats'],
                        rngs={'dropout': jax.random.PRNGKey(3)})
        loss, tb = m2.apply(variables, o, method=m2.loss)
        assert np.isfinite(float(loss)), mode
        assert 'sem_loss' in tb, mode


def test_unet_registry_slots():
    """Registry parity: U_Net and CP_Unet are buildable BACKBONE_2D slots
    (reference backbones_2d/__init__.py:6-11), and U_Net's forward matches
    the reference topology (unets.py:46-122): 5-level [16..256] pyramid,
    same-resolution out_ch map."""
    from spsnet_tpu.models.backbones_2d import build_backbone_2d

    unet = build_backbone_2d('U_Net', out_ch=2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 3)),
                    jnp.float32)
    vars_ = unet.init(jax.random.PRNGKey(0), x, train=False)
    out = unet.apply(vars_, x, train=False)
    assert out.shape == (1, 32, 32, 2)
    # encoder pyramid widths match the reference's forced in_ch=16 quirk
    enc_ch = [vars_['params'][f'enc{i}']['conv1']['kernel'].shape[-1]
              for i in range(1, 6)]
    assert enc_ch == [16, 32, 64, 128, 256]

    cp = build_backbone_2d('CP_Unet', input_channels=8, output_channels=8)
    y = jnp.asarray(np.random.default_rng(1).normal(size=(1, 16, 16, 8)),
                    jnp.float32)
    cvars = cp.init(jax.random.PRNGKey(0), y, train=False)
    out2, feats = cp.apply(cvars, y, train=False)
    assert out2.shape == (1, 16, 16, 8)
    assert set(feats) == {'e1', 'e2', 'e3', 'd0'}
