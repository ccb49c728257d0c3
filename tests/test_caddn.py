"""CaDDN (camera-only) end-to-end on synthetic images + calib
(reference: detectors/caddn.py + CaDDN.yaml)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.config import EDict
from spsnet_tpu.models import build_detector

PCR = [2.0, -12.8, -3.0, 27.6, 12.8, 1.0]
VOXEL = [0.8, 0.8, 0.5]          # grid (X=32, Y=32, Z=8)
IMG_H, IMG_W = 64, 96


def caddn_tiny_cfg():
    return EDict({
        'NAME': 'CaDDN',
        'VFE': {
            'NAME': 'ImageVFE',
            'DOWNSAMPLE_FACTOR': 4,
            'IMAGE_SHAPE': [IMG_H, IMG_W],
            'FFN': {
                'NAME': 'DepthFFN',
                'DDN': {'NAME': 'DDNDeepLabV3', 'FEAT_CHANNELS': 16},
                'CHANNEL_REDUCE': {'in_channels': 16, 'out_channels': 8,
                                   'kernel_size': 1, 'stride': 1,
                                   'bias': False},
                'DISCRETIZE': {'mode': 'LID', 'num_bins': 16,
                               'depth_min': 2.0, 'depth_max': 27.6},
                'LOSS': {'NAME': 'DDNLoss',
                         'ARGS': {'weight': 3.0, 'alpha': 0.25, 'gamma': 2.0,
                                  'fg_weight': 13, 'bg_weight': 1}},
            },
            'F2V': {'NAME': 'FrustumToVoxel'},
        },
        'MAP_TO_BEV': {'NAME': 'Conv2DCollapse', 'NUM_BEV_FEATURES': 16,
                       'ARGS': {'kernel_size': 1, 'bias': False}},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone',
                        'LAYER_NUMS': [2], 'LAYER_STRIDES': [1],
                        'NUM_FILTERS': [16], 'UPSAMPLE_STRIDES': [1],
                        'NUM_UPSAMPLE_FILTERS': [16]},
        'DENSE_HEAD': {
            'NAME': 'AnchorHeadSingle', 'CLASS_AGNOSTIC': False,
            'USE_DIRECTION_CLASSIFIER': True,
            'DIR_OFFSET': 0.78539, 'DIR_LIMIT_OFFSET': 0.0, 'NUM_DIR_BINS': 2,
            'ANCHOR_GENERATOR_CONFIG': [
                {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
                 'anchor_rotations': [0, 1.57],
                 'anchor_bottom_heights': [-1.78],
                 'align_center': False, 'feature_map_stride': 1,
                 'matched_threshold': 0.6, 'unmatched_threshold': 0.45}],
            'TARGET_ASSIGNER_CONFIG': {'BOX_CODER': 'ResidualCoder'},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
                'code_weights': [1.0] * 7}},
        },
        'POST_PROCESSING': {'SCORE_THRESH': 0.1, 'NMS_CONFIG': {
            'MULTI_CLASSES_NMS': False, 'NMS_THRESH': 0.1,
            'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16}},
    })


def make_caddn_batch(rng, B=2):
    images = rng.uniform(0, 1, (B, IMG_H, IMG_W, 3)).astype(np.float32)
    # KITTI-style: lidar x-forward -> camera z-forward
    l2c = np.zeros((B, 4, 4), np.float32)
    l2c[:] = np.array([[0, -1, 0, 0],
                       [0, 0, -1, 0],
                       [1, 0, 0, 0],
                       [0, 0, 0, 1]], np.float32)
    c2i = np.zeros((B, 3, 4), np.float32)
    f = 40.0
    c2i[:, 0, 0] = f
    c2i[:, 1, 1] = f
    c2i[:, 0, 2] = IMG_W / 2
    c2i[:, 1, 2] = IMG_H / 2
    c2i[:, 2, 2] = 1.0
    depth = rng.uniform(2, 27, (B, IMG_H, IMG_W)).astype(np.float32)
    gt2d = np.zeros((B, 4, 4), np.float32)
    gt2d[:, :2] = [10, 10, 40, 30]
    gt = np.zeros((B, 4, 8), np.float32)
    gt[:, :2, 0] = rng.uniform(5, 25, (B, 2))
    gt[:, :2, 1] = rng.uniform(-8, 8, (B, 2))
    gt[:, :2, 2] = -1.0
    gt[:, :2, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :2, 7] = 1
    return {'images': jnp.asarray(images),
            'trans_lidar_to_cam': jnp.asarray(l2c),
            'trans_cam_to_img': jnp.asarray(c2i),
            'depth_maps': jnp.asarray(depth),
            'gt_boxes2d': jnp.asarray(gt2d),
            'gt_boxes': jnp.asarray(gt)}


@pytest.fixture(scope='module')
def caddn_setup():
    cfg = caddn_tiny_cfg()
    model = build_detector(cfg, num_class=1, voxel_size=tuple(VOXEL),
                           point_cloud_range=tuple(PCR))
    rng = np.random.default_rng(0)
    batch = make_caddn_batch(rng)
    variables = jax.jit(model.init, static_argnames='train')(
        jax.random.PRNGKey(0), batch, train=True)
    return cfg, model, variables, batch


def test_caddn_forward(caddn_setup):
    cfg, model, variables, batch = caddn_setup
    out = model.apply(variables, batch, train=False)
    boxes = np.asarray(out['batch_box_preds'])
    assert boxes.shape[0] == 2 and boxes.shape[2] == 7
    assert np.isfinite(boxes).all()
    # voxel volume must receive nonzero frustum features somewhere in front
    vox = np.asarray(out['voxel_features_3d'])
    assert vox.shape[:4] == (2, 32, 32, 8)
    assert np.abs(vox).sum() > 0


def test_caddn_loss_and_grads(caddn_setup):
    cfg, model, variables, batch = caddn_setup
    other = {k: v for k, v in variables.items() if k != 'params'}

    def compute(params):
        o, _ = model.apply({'params': params, **other}, batch, train=True,
                           mutable=['batch_stats'])
        loss, tb = model.apply({'params': params, **other}, o,
                               method=model.loss)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(compute))(variables['params'])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # the depth loss must reach the DDN backbone
    ddn_g = jax.tree_util.tree_leaves(grads['vfe']['ddn'])
    assert any(np.abs(np.asarray(g)).max() > 0 for g in ddn_g)


def test_bin_depths_modes():
    from spsnet_tpu.models.vfe.image_vfe import bin_depths
    d = jnp.asarray([2.0, 10.0, 27.0, 50.0, jnp.nan])
    for mode in ('UD', 'LID', 'SID'):
        t = np.asarray(bin_depths(d, mode, 2.0, 27.6, 16, target=True))
        assert t.dtype == np.int32
        assert t[0] == 0                 # min depth -> first bin
        assert 0 <= t[1] < 16
        assert t[3] == 16                # beyond range -> overflow class
        assert t[4] == 16                # nan -> overflow class


def test_trilinear_sample_identity():
    """Sampling exactly at voxel centers returns the stored values."""
    from spsnet_tpu.models.vfe.image_vfe import trilinear_sample
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(1, 4, 4, 4, 2)).astype(np.float32)  # (B,D,H,W,C)
    # coords normalized with grid_sample's DEFAULT align_corners=False
    # convention (the reference Sampler's): center i -> (2*i + 1)/size - 1
    xs = (2 * np.arange(4) + 1) / 4 - 1
    u, v, d = np.meshgrid(xs, xs, xs, indexing='ij')   # u=W, v=H, d=D
    coords = np.stack([u, v, d], axis=-1)[None].astype(np.float32)
    out = np.asarray(trilinear_sample(jnp.asarray(vol), jnp.asarray(coords)))
    want = np.transpose(vol[0], (2, 1, 0, 3))          # (W,H,D,C) order
    np.testing.assert_allclose(out[0], want, atol=1e-5)
    # out-of-range -> zeros
    far = np.full((1, 1, 1, 1, 3), -2.0, np.float32)
    out2 = np.asarray(trilinear_sample(jnp.asarray(vol), jnp.asarray(far)))
    assert np.abs(out2).max() == 0.0


def test_depth_processor_and_flip():
    """Host-side camera steps: depth block-mean + image flip geometry."""
    from spsnet_tpu.data.processor.data_processor import DataProcessor
    proc = DataProcessor(
        [EDict({'NAME': 'calculate_grid_size', 'VOXEL_SIZE': [0.16] * 3}),
         EDict({'NAME': 'downsample_depth_map', 'DOWNSAMPLE_FACTOR': 4})],
        np.array(PCR, dtype=np.float32), training=True)
    d = np.arange(64, dtype=np.float32).reshape(8, 8)
    out = proc.forward({'depth_maps': d.copy(), 'points': np.zeros((1, 4))})
    assert out['depth_maps'].shape == (2, 2)
    np.testing.assert_allclose(out['depth_maps'][0, 0],
                               d[:4, :4].mean(), atol=1e-5)
    assert (proc.grid_size > 0).all()

    from spsnet_tpu.data.augmentor.augmentor_utils import \
        random_image_flip_horizontal

    class _FakeCalib:
        def lidar_to_img(self, pts):
            return pts[:, :2].copy(), pts[:, 2].copy()

        def img_to_rect(self, u, v, depth_rect):
            return np.stack([u, v, depth_rect], axis=1)

        def rect_to_lidar(self, pts):
            return pts

    img = np.arange(12, dtype=np.float32).reshape(2, 2, 3)
    depth = np.arange(4, dtype=np.float32).reshape(2, 2)
    boxes = np.zeros((1, 7), np.float32)
    boxes[0, :3] = [0.5, 1.0, 5.0]
    boxes[0, 6] = 0.3
    a_img, a_depth, a_boxes = random_image_flip_horizontal(
        img, depth, boxes, _FakeCalib(), enable=True)
    np.testing.assert_allclose(a_img, img[:, ::-1])
    np.testing.assert_allclose(a_depth, depth[:, ::-1])
    assert a_boxes[0, 0] == pytest.approx(2 - 0.5)   # mirrored u
    assert a_boxes[0, 6] == pytest.approx(-0.3)
