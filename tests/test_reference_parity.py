"""Direct numerical parity against the ACTUAL reference implementation.

Round-1 verdict item 5: ``tests/reference_impls.py`` is our own re-derivation;
these tests instead import the reference's pure-Python modules from
``/root/reference`` (torch CPU, CUDA deps stubbed — see reference_loader.py)
and assert our jnp rebuilds match them on seeded random inputs. A failure
here means a rebuilt formula drifted from the reference code itself.

Covered: box coder family (``pcdet/utils/box_coder_utils.py``), the loss
library (``pcdet/utils/loss_utils.py``), the anchor generator
(``target_assigner/anchor_generator.py``), and geometry utils
(``pcdet/utils/{common_utils,box_utils}.py``).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

from tests.reference_loader import (  # noqa: E402
    load_reference_file, load_reference_pcdet)

load_reference_pcdet()

from pcdet.utils import box_coder_utils as ref_coders  # noqa: E402
from pcdet.utils import common_utils as ref_common  # noqa: E402
from pcdet.utils import box_utils as ref_box_utils  # noqa: E402
from pcdet.utils import loss_utils as ref_losses  # noqa: E402

RefAnchorGenerator = load_reference_file(
    'pcdet/models/dense_heads/target_assigner/anchor_generator.py',
    'ref_anchor_generator').AnchorGenerator

import jax.numpy as jnp  # noqa: E402

from spsnet_tpu.utils import box_coder as our_coders  # noqa: E402
from spsnet_tpu.utils import box_utils as our_box_utils  # noqa: E402
from spsnet_tpu.utils import loss_utils as our_losses  # noqa: E402
from spsnet_tpu.utils.common import rotate_points_along_z  # noqa: E402

RNG = np.random.default_rng(1234)
MEAN_SIZE = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]


def rand_boxes(n, rng=RNG):
    b = np.zeros((n, 7), dtype=np.float32)
    b[:, 0:3] = rng.uniform(-20, 20, (n, 3))
    b[:, 3:6] = rng.uniform(0.5, 5.0, (n, 3))
    b[:, 6] = rng.uniform(-np.pi + 1e-3, np.pi - 1e-3, n)
    return b


def t(x):
    return torch.from_numpy(np.asarray(x))


def close(ours, ref, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               atol=atol, rtol=rtol)


# ---------------------------------------------------------------- box coders

@pytest.mark.parametrize('sincos', [False, True])
def test_residual_coder(sincos):
    ref = ref_coders.ResidualCoder(encode_angle_by_sincos=sincos)
    ours = our_coders.ResidualCoder(encode_angle_by_sincos=sincos)
    boxes, anchors = rand_boxes(64), rand_boxes(64)
    enc_ref = ref.encode_torch(t(boxes), t(anchors))
    close(ours.encode(jnp.asarray(boxes), jnp.asarray(anchors)), enc_ref)
    dec_ref = ref.decode_torch(enc_ref, t(anchors))
    close(ours.decode(jnp.asarray(enc_ref.numpy()), jnp.asarray(anchors)),
          dec_ref)


def test_point_residual_coder():
    ref = ref_coders.PointResidualCoder(use_mean_size=True,
                                        mean_size=MEAN_SIZE)
    ours = our_coders.PointResidualCoder(use_mean_size=True,
                                         mean_size=MEAN_SIZE)
    boxes = rand_boxes(64)
    pts = RNG.uniform(-20, 20, (64, 3)).astype(np.float32)
    cls = RNG.integers(1, 4, 64)
    enc_ref = ref.encode_torch(t(boxes), t(pts), t(cls))
    close(ours.encode(jnp.asarray(boxes), jnp.asarray(pts), jnp.asarray(cls)),
          enc_ref)
    dec_ref = ref.decode_torch(enc_ref, t(pts), t(cls))
    close(ours.decode(jnp.asarray(enc_ref.numpy()), jnp.asarray(pts),
                      jnp.asarray(cls)), dec_ref, atol=1e-4)


def test_point_residual_binori_coder():
    ref = ref_coders.PointResidual_BinOri_Coder(use_mean_size=True,
                                                mean_size=MEAN_SIZE)
    ours = our_coders.PointResidualBinOriCoder(use_mean_size=True,
                                               mean_size=MEAN_SIZE)
    assert ours.code_size == ref.code_size == 30
    boxes = rand_boxes(128)
    pts = RNG.uniform(-20, 20, (128, 3)).astype(np.float32)
    cls = RNG.integers(1, 4, 128)
    enc_ref = ref.encode_torch(t(boxes), t(pts), t(cls))
    close(ours.encode(jnp.asarray(boxes), jnp.asarray(pts), jnp.asarray(cls)),
          enc_ref, atol=1e-4)
    # decode consumes (N, 6 + 2*bins) prediction tensors
    preds = RNG.normal(0, 1, (128, 30)).astype(np.float32)
    dec_ref = ref.decode_torch(t(preds), t(pts), t(cls))
    close(ours.decode(jnp.asarray(preds), jnp.asarray(pts), jnp.asarray(cls)),
          dec_ref, atol=1e-4)


def test_point_bin_residual_coder():
    ref = ref_coders.PointBinResidualCoder(use_mean_size=True,
                                           mean_size=MEAN_SIZE)
    ours = our_coders.PointBinResidualCoder(use_mean_size=True,
                                            mean_size=MEAN_SIZE)
    boxes = rand_boxes(64)
    pts = RNG.uniform(-20, 20, (64, 3)).astype(np.float32)
    cls = RNG.integers(1, 4, 64)
    enc_ref = ref.encode_torch(t(boxes), t(pts), t(cls))
    close(ours.encode(jnp.asarray(boxes), jnp.asarray(pts), jnp.asarray(cls)),
          enc_ref, atol=1e-4)
    preds = RNG.normal(0, 1, (64, ours.code_size)).astype(np.float32)
    dec_ref = ref.decode_torch(t(preds), t(pts), t(cls))
    close(ours.decode(jnp.asarray(preds), jnp.asarray(pts), jnp.asarray(cls)),
          dec_ref, atol=1e-4)


def test_previous_residual_decoders():
    anchors = rand_boxes(64)
    enc = RNG.normal(0, 0.3, (64, 7)).astype(np.float32)
    close(our_coders.PreviousResidualDecoder.decode(
        jnp.asarray(enc), jnp.asarray(anchors)),
        ref_coders.PreviousResidualDecoder.decode_torch(t(enc), t(anchors)),
        atol=1e-4)
    close(our_coders.PreviousResidualRoIDecoder.decode(
        jnp.asarray(enc), jnp.asarray(anchors)),
        ref_coders.PreviousResidualRoIDecoder.decode_torch(t(enc), t(anchors)),
        atol=1e-4)


# -------------------------------------------------------------------- losses

def test_sigmoid_focal_loss():
    logits = RNG.normal(0, 2, (4, 100, 3)).astype(np.float32)
    targets = (RNG.uniform(size=(4, 100, 3)) < 0.2).astype(np.float32)
    weights = RNG.uniform(0, 1, (4, 100)).astype(np.float32)
    ref = ref_losses.SigmoidFocalClassificationLoss(gamma=2.0, alpha=0.25)
    ref_out = ref(t(logits), t(targets), t(weights))
    close(our_losses.sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights)),
        ref_out)


def test_weighted_smooth_l1():
    preds = RNG.normal(0, 1, (4, 50, 7)).astype(np.float32)
    targets = RNG.normal(0, 1, (4, 50, 7)).astype(np.float32)
    targets[0, :5, 2] = np.nan  # nan-target masking path
    weights = RNG.uniform(0, 1, (4, 50)).astype(np.float32)
    code_w = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0]
    ref = ref_losses.WeightedSmoothL1Loss(beta=1.0 / 9.0, code_weights=code_w)
    ref_out = ref(t(preds), t(targets), t(weights))
    close(our_losses.weighted_smooth_l1(
        jnp.asarray(preds), jnp.asarray(targets), jnp.asarray(weights),
        code_weights=code_w), ref_out)


def test_weighted_l1():
    preds = RNG.normal(0, 1, (4, 50, 7)).astype(np.float32)
    targets = RNG.normal(0, 1, (4, 50, 7)).astype(np.float32)
    weights = RNG.uniform(0, 1, (4, 50)).astype(np.float32)
    # code_weights=None crashes the reference itself (self.code_weights is
    # only assigned when not None); shipped configs always pass it
    code_w = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0]
    ref = ref_losses.WeightedL1Loss(code_weights=code_w)
    ref_out = ref(t(preds), t(targets), t(weights))
    close(our_losses.weighted_l1(
        jnp.asarray(preds), jnp.asarray(targets), jnp.asarray(weights),
        code_weights=code_w), ref_out)


def test_weighted_classification_loss():
    """WeightedClassificationLoss = sigmoid CE (used by IA-SSD cls)."""
    logits = RNG.normal(0, 2, (4, 60, 4)).astype(np.float32)
    targets = (RNG.uniform(size=(4, 60, 4)) < 0.3).astype(np.float32)
    weights = RNG.uniform(0, 1, (4, 60)).astype(np.float32)
    ref = ref_losses.WeightedClassificationLoss()
    ref_out = ref(t(logits), t(targets), t(weights), reduction='none')
    close(our_losses.weighted_sigmoid_ce(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights)),
        ref_out)


def test_weighted_cross_entropy_loss():
    logits = RNG.normal(0, 2, (4, 60, 4)).astype(np.float32)
    cls_idx = RNG.integers(0, 4, (4, 60))
    targets = np.eye(4, dtype=np.float32)[cls_idx]
    weights = RNG.uniform(0, 1, (4, 60)).astype(np.float32)
    ref = ref_losses.WeightedCrossEntropyLoss()
    ref_out = ref(t(logits), t(targets), t(weights))
    close(our_losses.weighted_softmax_ce(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights)),
        ref_out, atol=1e-5)


def test_corner_loss_lidar():
    pred = rand_boxes(80)
    gt = pred + RNG.normal(0, 0.1, pred.shape).astype(np.float32)
    ref_out = ref_losses.get_corner_loss_lidar(t(pred), t(gt))
    close(our_losses.get_corner_loss_lidar(jnp.asarray(pred),
                                           jnp.asarray(gt)),
          ref_out, atol=1e-4)


# ---------------------------------------------------------- anchor generator

@pytest.mark.parametrize('align_center', [False, True])
def test_anchor_generator(align_center):
    """Our generate_anchors must bit-match the reference AnchorGenerator
    (grid placement, align_center branch, z bottom->center shift)."""
    from spsnet_tpu.models.dense_heads.anchor_head import generate_anchors
    pcr = [0.0, -39.68, -3.0, 69.12, 39.68, 1.0]
    grid_size = [432, 496]      # full voxel grid; stride 2 -> 216x248 map
    stride = 2
    cfgs = [
        {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
         'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.78],
         'align_center': align_center, 'feature_map_stride': stride,
         'matched_threshold': 0.6, 'unmatched_threshold': 0.45},
        {'class_name': 'Pedestrian', 'anchor_sizes': [[0.8, 0.6, 1.73]],
         'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-0.6],
         'align_center': align_center, 'feature_map_stride': stride,
         'matched_threshold': 0.5, 'unmatched_threshold': 0.35},
    ]
    fmap = [grid_size[0] // stride, grid_size[1] // stride]
    ref_gen = RefAnchorGenerator(pcr, cfgs)
    ref_anchors, ref_num_per_loc = ref_gen.generate_anchors(
        [fmap for _ in cfgs])

    ours, cls_ids, m_thr, u_thr = generate_anchors(
        cfgs, grid_size, pcr, stride)
    # ours: (ny, nx, A, 7) with A ordered class -> size -> rot.
    # ref per class: (nz=1, ny, nx, Ns, Nr, 7)
    a = 0
    for ci, ref_a in enumerate(ref_anchors):
        ref_a = ref_a.numpy()[0]                       # (ny, nx, Ns, Nr, 7)
        ns, nr = ref_a.shape[2], ref_a.shape[3]
        for si in range(ns):
            for ri in range(nr):
                np.testing.assert_allclose(
                    np.asarray(ours[:, :, a]), ref_a[:, :, si, ri],
                    atol=1e-5,
                    err_msg=f'class {ci} size {si} rot {ri} '
                            f'(align_center={align_center})')
                assert cls_ids[a] == ci + 1
                a += 1
    assert a == ours.shape[2]


# ------------------------------------------------------------------ geometry

def test_rotate_points_along_z():
    pts = RNG.normal(0, 5, (4, 100, 3)).astype(np.float32)
    ang = RNG.uniform(-np.pi, np.pi, 4).astype(np.float32)
    ref_out = ref_common.rotate_points_along_z(t(pts), t(ang))
    close(rotate_points_along_z(jnp.asarray(pts), jnp.asarray(ang)), ref_out,
          atol=1e-5)


def test_boxes_to_corners_3d():
    boxes = rand_boxes(32)
    ref_out = ref_box_utils.boxes_to_corners_3d(t(boxes))
    close(our_box_utils.boxes_to_corners_3d(jnp.asarray(boxes)), ref_out,
          atol=1e-4)


def test_enlarge_box3d():
    boxes = rand_boxes(32)
    extra = [0.2, 0.2, 0.2]
    ref_out = ref_box_utils.enlarge_box3d(t(boxes), extra)
    close(our_box_utils.enlarge_box3d(jnp.asarray(boxes), tuple(extra)),
          ref_out, atol=1e-6)


# ------------------------------------------------ calibration + pred-dict leg

def _calib_dict(rng):
    P2 = np.array([[720.0, 0.0, 620.0, 44.9],
                   [0.0, 720.0, 187.0, 0.2],
                   [0.0, 0.0, 1.0, 0.003]], dtype=np.float32)
    th = rng.normal(0, 0.01)
    R0 = np.array([[np.cos(th), np.sin(th), 0.0],
                   [-np.sin(th), np.cos(th), 0.0],
                   [0.0, 0.0, 1.0]], dtype=np.float32)
    V2C = np.array([[0.0, -1.0, 0.0, 0.002],
                    [0.0, 0.0, -1.0, -0.08],
                    [1.0, 0.0, 0.0, -0.27]], dtype=np.float32)
    return {'P2': P2, 'P3': P2.copy(), 'R0': R0, 'Tr_velo2cam': V2C}


def _both_calibs():
    """Same calib dict through OUR Calibration and the reference's."""
    import importlib
    from spsnet_tpu.data.kitti.calibration import Calibration as OurCalib
    ref_mod = importlib.import_module('pcdet.utils.calibration_kitti')
    rng = np.random.default_rng(11)
    d = _calib_dict(rng)
    return OurCalib(dict(d)), ref_mod.Calibration(dict(d)), rng


def test_calibration_transforms_match_reference():
    """lidar_to_rect / rect_to_lidar / rect_to_img / img_to_rect parity
    (``pcdet/utils/calibration_kitti.py:50-105``)."""
    ours_c, ref_c, rng = _both_calibs()
    pts = np.stack([rng.uniform(2, 70, 256), rng.uniform(-30, 30, 256),
                    rng.uniform(-2.5, 1.0, 256)], 1).astype(np.float32)
    ref_rect = ref_c.lidar_to_rect(pts)
    np.testing.assert_allclose(ours_c.lidar_to_rect(pts), ref_rect, atol=1e-4)
    np.testing.assert_allclose(ours_c.rect_to_lidar(ref_rect),
                               ref_c.rect_to_lidar(ref_rect), atol=1e-4)
    oi, od = ours_c.rect_to_img(ref_rect)
    ri, rd = ref_c.rect_to_img(ref_rect)
    np.testing.assert_allclose(oi, ri, atol=1e-3)
    np.testing.assert_allclose(od, rd, atol=1e-4)
    u = rng.uniform(0, 1200, 64).astype(np.float32)
    v = rng.uniform(0, 370, 64).astype(np.float32)
    dep = rng.uniform(2, 70, 64).astype(np.float32)
    np.testing.assert_allclose(ours_c.img_to_rect(u, v, dep),
                               ref_c.img_to_rect(u, v, dep), atol=1e-4)


def test_box_conversions_match_reference():
    """The full prediction-dict conversion leg (`generate_prediction_dicts`,
    ``kitti_dataset.py:276-351``): lidar boxes -> camera boxes -> image
    bboxes, and camera -> lidar for gt loading
    (``pcdet/utils/box_utils.py:92-118,161-247``)."""
    from spsnet_tpu.data.kitti import kitti_utils
    ours_c, ref_c, rng = _both_calibs()
    n = 48
    lidar = np.zeros((n, 7), dtype=np.float32)
    lidar[:, 0] = rng.uniform(2, 68, n)
    lidar[:, 1] = rng.uniform(-30, 30, n)
    lidar[:, 2] = rng.uniform(-2, 0.5, n)
    lidar[:, 3] = rng.uniform(3.2, 4.6, n)   # dx
    lidar[:, 4] = rng.uniform(1.4, 1.9, n)   # dy
    lidar[:, 5] = rng.uniform(1.3, 1.8, n)   # dz
    lidar[:, 6] = rng.uniform(-np.pi, np.pi, n)

    ref_cam = ref_box_utils.boxes3d_lidar_to_kitti_camera(lidar, ref_c)
    our_cam = kitti_utils.boxes3d_lidar_to_kitti_camera(lidar, ours_c)
    np.testing.assert_allclose(our_cam, ref_cam, atol=1e-4)

    img_shape = (375, 1242)
    ref_img = ref_box_utils.boxes3d_kitti_camera_to_imageboxes(
        ref_cam.copy(), ref_c, image_shape=img_shape)
    our_img = kitti_utils.boxes3d_kitti_camera_to_imageboxes(
        our_cam.copy(), ours_c, image_shape=img_shape)
    np.testing.assert_allclose(our_img, ref_img, atol=1e-2)  # pixel coords

    ref_back = ref_box_utils.boxes3d_kitti_camera_to_lidar(ref_cam, ref_c)
    our_back = kitti_utils.boxes3d_kitti_camera_to_lidar(our_cam, ours_c)
    np.testing.assert_allclose(our_back, ref_back, atol=1e-4)
    np.testing.assert_allclose(our_back, lidar, atol=1e-3)  # roundtrip

    ref_corners = ref_box_utils.boxes3d_to_corners3d_kitti_camera(ref_cam)
    our_corners = kitti_utils.boxes3d_to_corners3d_kitti_camera(our_cam)
    np.testing.assert_allclose(our_corners, ref_corners, atol=1e-3)


# ------------------------------------------- stochastic processor stages

def _load_ref_data_processor():
    """Reference DataProcessor. The ``pcdet.datasets`` __init__ chain pulls
    skimage.io / CUDA ops, so the parent packages get bare __path__ stubs
    (the reference_loader pattern) and only the leaf module executes;
    skimage.transform is stubbed if absent (only downsample_depth_map
    touches it, not under test)."""
    import importlib
    import sys
    import types
    try:
        from skimage import transform  # noqa: F401
    except ImportError:
        sk = sys.modules.setdefault('skimage', types.ModuleType('skimage'))
        tr = types.ModuleType('skimage.transform')
        sk.transform = tr
        sys.modules.setdefault('skimage.transform', tr)
    _stub_ref_datasets_pkgs()
    return importlib.import_module(
        'pcdet.datasets.processor.data_processor')


def _stub_ref_datasets_pkgs():
    """Bare __path__ stubs for the reference's pcdet.datasets package tree
    so leaf modules import without the __init__ chains (skimage.io, CUDA
    ops, dataset registries)."""
    import sys
    import types
    from tests.reference_loader import REFERENCE_ROOT
    for pkg, path in [
        ('pcdet.datasets', f'{REFERENCE_ROOT}/pcdet/datasets'),
        ('pcdet.datasets.processor',
         f'{REFERENCE_ROOT}/pcdet/datasets/processor'),
        ('pcdet.datasets.augmentor',
         f'{REFERENCE_ROOT}/pcdet/datasets/augmentor'),
    ]:
        mod = sys.modules.setdefault(pkg, types.ModuleType(pkg))
        mod.__path__ = [path]


def _scan_frame(rng, n=60000):
    pts = np.zeros((n, 4), dtype=np.float32)
    pts[:, 0] = rng.uniform(-5, 75, n)
    pts[:, 1] = rng.uniform(-45, 45, n)
    pts[:, 2] = rng.uniform(-2.5, 1.5, n)
    pts[:, 3] = rng.uniform(0, 1, n)
    return pts


def test_processor_stochastic_stages_match_reference():
    """mask -> sample_points(16384) -> shuffle under the SAME legacy
    np.random seed must produce bit-identical points on both sides: proves
    our rebuild consumes the RNG stream in the reference's exact call order
    (``data_processor.py:78-115,218-253``) — the property that makes
    epoch-level data streams reproducible across the two frameworks."""
    from types import SimpleNamespace
    from spsnet_tpu.data.processor.data_processor import DataProcessor
    ref_mod = _load_ref_data_processor()

    pcr = np.array([0, -40, -3, 70.4, 40, 1], dtype=np.float32)
    ours_p = DataProcessor([], pcr, training=True, num_point_features=4)
    ref_p = ref_mod.DataProcessor([], pcr, training=True,
                                  num_point_features=4)

    class _Cfg(SimpleNamespace):
        def get(self, k, d=None):
            return getattr(self, k, d)

    rng = np.random.default_rng(3)
    base = _scan_frame(rng)

    def run(proc):
        dd = {'points': base.copy(),
              'sem_labels': np.arange(len(base), dtype=np.int32)}
        np.random.seed(1234)
        dd = proc.mask_points_and_boxes_outside_range(
            dd, _Cfg(REMOVE_OUTSIDE_BOXES=False))
        dd = proc.sample_points(dd, _Cfg(NUM_POINTS={'train': 16384}))
        dd = proc.shuffle_points(dd, _Cfg(SHUFFLE_ENABLED={'train': True}))
        return dd

    ours_d, ref_d = run(ours_p), run(ref_p)
    assert ours_d['points'].shape == (16384, 4)
    np.testing.assert_array_equal(ours_d['points'], ref_d['points'])
    np.testing.assert_array_equal(ours_d['sem_labels'], ref_d['sem_labels'])

    # sparse frame: fewer points than NUM_POINTS exercises the pad branch
    sparse = base[:3000]

    def run_sparse(proc):
        dd = {'points': sparse.copy()}
        np.random.seed(99)
        return proc.sample_points(dd, _Cfg(NUM_POINTS={'train': 4096}))

    np.testing.assert_array_equal(run_sparse(ours_p)['points'],
                                  run_sparse(ref_p)['points'])


# ---------------------------------------------- world augmentation queue

def test_world_augmentor_matches_reference():
    """random_world_flip -> rotation -> scaling under one np.random seed:
    same draws in the same order (asserted via identical post-chain RNG
    state) and matching outputs (1e-4: the reference rotates points through
    torch float32 matmul, ours through numpy). Covers the fork's
    ENABLE_PROB parameterization (``data_augmentor.py:81-121``)."""
    import importlib
    _stub_ref_datasets_pkgs()
    ref_aug_utils = importlib.import_module(
        'pcdet.datasets.augmentor.augmentor_utils')
    from spsnet_tpu.data.augmentor import augmentor_utils as our_aug_utils

    rng = np.random.default_rng(5)
    n = 4096
    pts = np.zeros((n, 4), dtype=np.float32)
    pts[:, 0] = rng.uniform(0, 70, n)
    pts[:, 1] = rng.uniform(-40, 40, n)
    pts[:, 2] = rng.uniform(-2.5, 1.0, n)
    boxes = np.zeros((9, 7), dtype=np.float32)
    boxes[:, 0] = rng.uniform(5, 60, 9)
    boxes[:, 1] = rng.uniform(-20, 20, 9)
    boxes[:, 2] = rng.uniform(-1.5, 0, 9)
    boxes[:, 3:6] = rng.uniform(0.5, 4.5, (9, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 9)

    for seed, ep_flip, ep_rot, ep_scale in [
            (0, 0.5, 1.0, 1.0), (1, 1.0, 0.35, 0.35), (2, 0.2, 0.8, 0.6)]:
        def chain(flip, rot, scale, b, p):
            np.random.seed(seed)
            b, p = flip(b.copy(), p.copy(), enable_prob=ep_flip)
            b, p = rot(b, p, [-0.785, 0.785], enable_prob=ep_rot)
            b, p = scale(b, p, [0.9, 1.1], enable_prob=ep_scale)
            probe = np.random.uniform()      # RNG-stream alignment witness
            return b, p, probe

        rb, rp, rprobe = chain(ref_aug_utils.random_flip_along_x,
                               ref_aug_utils.global_rotation,
                               ref_aug_utils.global_scaling, boxes, pts)
        ob, op, oprobe = chain(our_aug_utils.random_flip_along_x,
                               our_aug_utils.global_rotation,
                               our_aug_utils.global_scaling, boxes, pts)
        assert oprobe == rprobe, (seed, 'RNG stream diverged')
        np.testing.assert_allclose(op, np.asarray(rp), atol=1e-4)
        np.testing.assert_allclose(ob, np.asarray(rb), atol=1e-4)


# ------------------------------------------------------- label parsing

def test_object3d_label_parsing_matches_reference():
    """KITTI label-line parsing and difficulty binning
    (``pcdet/utils/object3d_kitti.py``) vs our ``kitti_utils.Object3d``:
    the data-entry leg of info generation must agree field-for-field."""
    ref_obj3d = load_reference_file('pcdet/utils/object3d_kitti.py',
                                    'ref_object3d_kitti')
    from spsnet_tpu.data.kitti.kitti_utils import Object3d

    rng = np.random.default_rng(17)
    lines = []
    names = ['Car', 'Pedestrian', 'Cyclist', 'Van', 'DontCare', 'Misc']
    for i in range(24):
        nm = names[int(rng.integers(0, len(names)))]
        trunc = float(rng.uniform(0, 0.6))
        occ = int(rng.integers(0, 4))
        alpha = float(rng.uniform(-np.pi, np.pi))
        x1, y1 = float(rng.uniform(0, 1100)), float(rng.uniform(0, 200))
        x2, y2 = x1 + float(rng.uniform(10, 160)), \
            y1 + float(rng.uniform(10, 90))
        h, w, l = (float(rng.uniform(1.2, 2.0)), float(rng.uniform(1.4, 2.0)),
                   float(rng.uniform(3.0, 4.8)))
        loc = rng.uniform(-10, 60, 3)
        ry = float(rng.uniform(-np.pi, np.pi))
        lines.append(f'{nm} {trunc:.2f} {occ} {alpha:.2f} '
                     f'{x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} '
                     f'{h:.2f} {w:.2f} {l:.2f} '
                     f'{loc[0]:.2f} {loc[1]:.2f} {loc[2]:.2f} {ry:.2f}')

    for line in lines:
        r = ref_obj3d.Object3d(line)
        o = Object3d(line)
        assert o.cls_type == r.cls_type
        assert o.truncation == r.truncation
        assert o.occlusion == r.occlusion
        assert o.alpha == r.alpha
        np.testing.assert_array_equal(o.box2d, r.box2d)
        assert (o.h, o.w, o.l) == (r.h, r.w, r.l)
        np.testing.assert_array_equal(o.loc, r.loc)
        assert o.ry == r.ry
        assert o.score == r.score
        assert o.level == r.level, line
        assert o.level_str == r.level_str


def test_point_feature_encoder_matches_reference():
    """Feature selection + the filter_sweeps branch vs the reference
    (``processor/point_feature_encoder.py``)."""
    import importlib
    from types import SimpleNamespace
    _stub_ref_datasets_pkgs()
    ref_mod = importlib.import_module(
        'pcdet.datasets.processor.point_feature_encoder')
    from spsnet_tpu.data.processor.point_feature_encoder import (
        PointFeatureEncoder)

    class _Cfg(SimpleNamespace):
        def get(self, k, d=None):
            return getattr(self, k, d)

    cfg = _Cfg(encoding_type='absolute_coordinates_encoding',
               used_feature_list=['x', 'y', 'z', 'intensity', 'timestamp'],
               src_feature_list=['x', 'y', 'z', 'intensity', 'timestamp'],
               filter_sweeps=True, max_sweeps=3)
    rng = np.random.default_rng(21)
    pts = np.zeros((2048, 5), dtype=np.float32)
    pts[:, :4] = rng.uniform(-1, 1, (2048, 4))
    pts[:, 4] = rng.choice([0.0, 0.05, 0.1, 0.15, 0.2], 2048)

    ours = PointFeatureEncoder(cfg)
    ref = ref_mod.PointFeatureEncoder(cfg)
    od = ours.forward({'points': pts.copy()})
    rd = ref.forward({'points': pts.copy()})
    np.testing.assert_array_equal(od['points'], rd['points'])
    assert od['use_lead_xyz'] == rd['use_lead_xyz']
    assert ours.num_point_features == ref.num_point_features == 5


def test_put_boxes_on_road_planes_matches_reference():
    """Road-plane snap math vs the reference's own staticmethod
    (``database_sampler.py:137-154``)."""
    import importlib
    _stub_ref_datasets_pkgs()
    ref_ds = importlib.import_module(
        'pcdet.datasets.augmentor.database_sampler')
    from spsnet_tpu.data.augmentor.database_sampler import DataBaseSampler

    ours_c, ref_c, rng = _both_calibs()
    boxes = np.zeros((12, 7), dtype=np.float64)
    boxes[:, 0] = rng.uniform(5, 60, 12)
    boxes[:, 1] = rng.uniform(-20, 20, 12)
    boxes[:, 2] = rng.uniform(-1.4, -0.4, 12)
    boxes[:, 3:6] = rng.uniform(0.5, 4.5, (12, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 12)
    plane = np.array([0.02, -0.999, 0.01, 1.65])
    plane = plane / np.linalg.norm(plane[:3])

    rb, rmv = ref_ds.DataBaseSampler.put_boxes_on_road_planes(
        boxes.copy(), plane, ref_c)
    ob, omv = DataBaseSampler.put_boxes_on_road_planes(
        boxes.copy(), plane, ours_c)
    np.testing.assert_allclose(ob, np.asarray(rb), atol=1e-4)
    np.testing.assert_allclose(omv, np.asarray(rmv), atol=1e-4)
    # snapped bottoms sit on the plane (rect frame): residual ~0
    center_cam = ours_c.lidar_to_rect(ob[:, 0:3].astype(np.float32))
    bottom_cam_y = ours_c.lidar_to_rect(
        np.stack([ob[:, 0], ob[:, 1], ob[:, 2] - ob[:, 5] / 2],
                 1).astype(np.float32))[:, 1]
    a, b, c, d = plane
    plane_y = (-d - a * center_cam[:, 0] - c * center_cam[:, 2]) / b
    np.testing.assert_allclose(bottom_cam_y, plane_y, atol=1e-2)


def test_local_augs_match_reference():
    """Per-box local translation / rotation / scaling / frustum dropout and
    per-axis world translation under one np.random seed vs the reference
    (``augmentor_utils.py:199-546``): identical RNG streams (post-chain
    probe) and matching outputs. Pins the 1e-1 in-box MARGIN, inclusive
    bounds, and the axis-outer/box-inner loop order of
    ``random_local_translation_along_*``."""
    import importlib
    _stub_ref_datasets_pkgs()
    ref_au = importlib.import_module(
        'pcdet.datasets.augmentor.augmentor_utils')
    from spsnet_tpu.data.augmentor import augmentor_utils as our_au

    rng = np.random.default_rng(9)
    n = 6000
    pts = np.zeros((n, 4), dtype=np.float64)
    pts[:, 0] = rng.uniform(0, 70, n)
    pts[:, 1] = rng.uniform(-40, 40, n)
    pts[:, 2] = rng.uniform(-2.5, 1.0, n)
    boxes = np.zeros((7, 7), dtype=np.float64)
    boxes[:, 0] = np.linspace(8, 60, 7)
    boxes[:, 1] = rng.uniform(-20, 20, 7)
    boxes[:, 2] = rng.uniform(-1.5, 0, 7)
    boxes[:, 3:6] = rng.uniform(1.0, 4.5, (7, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 7)
    # drop some points inside the boxes so the masks are non-trivial
    for b in boxes:
        m = int(rng.integers(40, 120))
        local = rng.uniform(-0.5, 0.5, (m, 3)) * b[3:6]
        c, s = np.cos(b[6]), np.sin(b[6])
        world = np.stack([local[:, 0] * c - local[:, 1] * s + b[0],
                          local[:, 0] * s + local[:, 1] * c + b[1],
                          local[:, 2] + b[2]], 1)
        pts[rng.integers(0, n, m), :3] = world

    def run_ref(seed):
        np.random.seed(seed)
        b, p = boxes.copy(), pts.copy()
        for ax in ['x', 'y', 'z']:
            b, p = getattr(ref_au, f'random_translation_along_{ax}')(b, p, 0.2)
        for ax in ['x', 'y', 'z']:
            b, p = getattr(ref_au,
                           f'random_local_translation_along_{ax}')(
                b, p, [0.95, 1.05])
        b, p = ref_au.local_rotation(b, p, [-0.157, 0.157])
        b, p = ref_au.local_scaling(b, p, [0.9, 1.1])
        b, p = ref_au.global_frustum_dropout_top(b, p, [0.0, 0.2])
        b, p = ref_au.local_frustum_dropout_top(b, p, [0.0, 0.2])
        return b, p, np.random.uniform()

    def run_ours(seed):
        np.random.seed(seed)
        b, p = our_au.random_world_translation(boxes.copy(), pts.copy(), 0.2)
        b, p = our_au.random_local_translation(b, p, [0.95, 1.05])
        b, p = our_au.random_local_rotation(b, p, [-0.157, 0.157])
        b, p = our_au.random_local_scaling(b, p, [0.9, 1.1])
        b, p = our_au.global_frustum_dropout(b, p, [0.0, 0.2], 'top')
        b, p = our_au.local_frustum_dropout(b, p, [0.0, 0.2], 'top')
        return b, p, np.random.uniform()

    for seed in (0, 5, 2024):
        rb, rp, rprobe = run_ref(seed)
        ob, op, oprobe = run_ours(seed)
        assert oprobe == rprobe, (seed, 'RNG stream diverged')
        assert op.shape == rp.shape, seed
        np.testing.assert_allclose(ob, np.asarray(rb), atol=1e-9)
        # points tolerate f32 rounding: the reference's local_rotation goes
        # through torch float32 rotate_points_along_z, ours stays float64
        np.testing.assert_allclose(op, np.asarray(rp), atol=1e-4)


def test_pyramid_augs_match_reference():
    """SE-SSD pyramid dropout -> sparsify -> swap chain under one seed vs
    the reference (``augmentor_utils.py:569-758``): identical RNG streams
    and point sets. The reference's hull test goes through scipy Delaunay;
    ours is a direct frustum test — membership must still agree on
    non-degenerate data, which this asserts implicitly through the counts
    that gate every RNG draw."""
    import importlib
    _stub_ref_datasets_pkgs()
    ref_au = importlib.import_module(
        'pcdet.datasets.augmentor.augmentor_utils')
    from spsnet_tpu.data.augmentor import pyramid_augs as our_pa

    rng = np.random.default_rng(13)
    boxes = np.zeros((6, 7), dtype=np.float64)
    boxes[:, 0] = np.linspace(8, 55, 6)
    boxes[:, 1] = rng.uniform(-15, 15, 6)
    boxes[:, 2] = rng.uniform(-1.2, -0.5, 6)
    boxes[:, 3:6] = rng.uniform(1.5, 4.0, (6, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 6)
    # dense in-box clusters so frustums hold > SPARSIFY_MAX_NUM points
    pts = []
    for b in boxes:
        m = 400
        local = rng.uniform(-0.45, 0.45, (m, 3)) * b[3:6]
        c, s = np.cos(b[6]), np.sin(b[6])
        world = np.stack([local[:, 0] * c - local[:, 1] * s + b[0],
                          local[:, 0] * s + local[:, 1] * c + b[1],
                          local[:, 2] + b[2]], 1)
        pts.append(np.concatenate(
            [world, rng.uniform(0, 1, (m, 1))], axis=1))
    pts.append(np.concatenate(
        [rng.uniform(-5, 70, (4000, 3)), rng.uniform(0, 1, (4000, 1))], 1))
    pts = np.concatenate(pts, axis=0)

    def chain(mod, seed):
        np.random.seed(seed)
        b, p = boxes.copy(), pts.copy()
        b, p, pyr = mod.local_pyramid_dropout(b, p, 0.35)
        b, p, pyr = mod.local_pyramid_sparsify(b, p, 0.5, 40, pyr)
        b, p = mod.local_pyramid_swap(b, p, 0.5, 40, pyr)
        return b, p, np.random.uniform()

    def row_sorted(a):
        return a[np.lexsort(a.T[::-1])]

    for seed in (1, 8, 77):
        rb, rp, rprobe = chain(ref_au, seed)
        ob, op, oprobe = chain(our_pa, seed)
        assert oprobe == rprobe, (seed, 'RNG stream diverged')
        np.testing.assert_array_equal(ob, rb)
        assert op.shape == rp.shape, seed
        # 1e-5: the swap's ratio/recover remap evaluates the same formulas
        # in a different association order (verified stage-by-stage: drop
        # and sparsify are bit-exact; swap differs by <4e-6)
        np.testing.assert_allclose(row_sorted(op), row_sorted(np.asarray(rp)),
                                   atol=1e-5)


def test_center_head_targets_match_reference():
    """CenterPoint gaussian heatmap targets vs the reference's own
    ``assign_target_of_single_head`` (``center_head.py:103-157``) run
    unbound on CPU torch. Caught a real quirk: the reference's third
    gaussian_radius root divides by 2, not 2*a3 (CornerNet lineage)."""
    import importlib
    import sys
    import types
    from tests.reference_loader import REFERENCE_ROOT
    for pkg, path in [
        ('pcdet.models', f'{REFERENCE_ROOT}/pcdet/models'),
        ('pcdet.models.dense_heads',
         f'{REFERENCE_ROOT}/pcdet/models/dense_heads'),
        ('pcdet.models.model_utils',
         f'{REFERENCE_ROOT}/pcdet/models/model_utils'),
    ]:
        mod = sys.modules.setdefault(pkg, types.ModuleType(pkg))
        mod.__path__ = [path]
    ref_ch = importlib.import_module('pcdet.models.dense_heads.center_head')

    from spsnet_tpu.models.dense_heads.center_head import (
        assign_center_targets)

    pcr = np.array([0, -40.0, -3, 70.4, 40.0, 1], dtype=np.float32)
    voxel = [0.05, 0.05, 0.1]
    W, H, stride = 176, 200, 8
    rng = np.random.default_rng(31)
    T = 12
    gt = np.zeros((T, 8), dtype=np.float32)
    gt[:, 0] = rng.uniform(2, 68, T)
    gt[:, 1] = rng.uniform(-38, 38, T)
    gt[:, 2] = rng.uniform(-1.5, 0, T)
    gt[:, 3:6] = rng.uniform(0.5, 4.5, (T, 3))
    gt[:, 6] = rng.uniform(-np.pi, np.pi, T)
    gt[:, 7] = rng.integers(1, 4, T)
    gt[8:] = 0.0   # zero padding rows, as collate produces

    class _Duck:
        point_cloud_range = torch.tensor(pcr)
        voxel_size = voxel

    rhm, rboxes, rinds, rmask = ref_ch.CenterHead.assign_target_of_single_head(
        _Duck(), 3, torch.tensor(gt), [W, H], stride,
        num_max_objs=24, gaussian_overlap=0.1, min_radius=2)

    ohm, oboxes, oinds, omask, _ = assign_center_targets(
        jnp.asarray(gt), 3, (W, H), stride, voxel, pcr,
        num_max_objs=24, gaussian_overlap=0.1, min_radius=2)

    np.testing.assert_array_equal(np.asarray(omask)[:T],
                                  rmask.numpy()[:T])
    m = rmask.numpy().astype(bool)
    np.testing.assert_array_equal(np.asarray(oinds)[m], rinds.numpy()[m])
    np.testing.assert_allclose(np.asarray(oboxes)[m], rboxes.numpy()[m],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ohm), rhm.numpy(), atol=1e-5)


def test_anchor_target_assignment_matches_reference():
    """Full anchor target assignment (labels / reg targets / reg weights)
    vs the reference's AxisAlignedTargetAssigner run on CPU torch with its
    own AnchorGenerator + ResidualCoder (``axis_aligned_target_assigner.py``):
    per-class matched/unmatched thresholds, force-matching of each gt's
    best anchor (incl. the zero-overlap sentinel), and encode parity."""
    import importlib
    import sys
    import types
    from tests.reference_loader import REFERENCE_ROOT
    for pkg, path in [
        ('pcdet.models', f'{REFERENCE_ROOT}/pcdet/models'),
        ('pcdet.models.dense_heads',
         f'{REFERENCE_ROOT}/pcdet/models/dense_heads'),
        ('pcdet.models.dense_heads.target_assigner',
         f'{REFERENCE_ROOT}/pcdet/models/dense_heads/target_assigner'),
    ]:
        mod = sys.modules.setdefault(pkg, types.ModuleType(pkg))
        mod.__path__ = [path]
    ref_assigner_mod = importlib.import_module(
        'pcdet.models.dense_heads.target_assigner.'
        'axis_aligned_target_assigner')
    from spsnet_tpu.models.dense_heads.anchor_head import (
        assign_anchor_targets, generate_anchors)
    from spsnet_tpu.utils import box_coder as our_coders

    class _AttrDict(dict):
        __getattr__ = dict.__getitem__

        def get(self, k, d=None):
            return super().get(k, d)

    pcr = [0.0, -39.68, -3.0, 69.12, 39.68, 1.0]
    grid_size = [176, 200]        # small grid: stride 2 -> 88x100 map
    stride = 2
    agc = [
        {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
         'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.78],
         'align_center': False, 'feature_map_stride': stride,
         'matched_threshold': 0.6, 'unmatched_threshold': 0.45},
        {'class_name': 'Pedestrian', 'anchor_sizes': [[0.8, 0.6, 1.73]],
         'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-0.6],
         'align_center': False, 'feature_map_stride': stride,
         'matched_threshold': 0.5, 'unmatched_threshold': 0.35},
        {'class_name': 'Cyclist', 'anchor_sizes': [[1.76, 0.6, 1.73]],
         'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-0.6],
         'align_center': False, 'feature_map_stride': stride,
         'matched_threshold': 0.5, 'unmatched_threshold': 0.35},
    ]
    class_names = ['Car', 'Pedestrian', 'Cyclist']
    model_cfg = _AttrDict(
        ANCHOR_GENERATOR_CONFIG=agc,
        TARGET_ASSIGNER_CONFIG=_AttrDict(
            POS_FRACTION=-1.0, SAMPLE_SIZE=512,
            NORM_BY_NUM_EXAMPLES=False, MATCH_HEIGHT=False,
            BOX_CODER='ResidualCoder'),
    )
    model_cfg['use_multihead'] = False

    ref_coder = ref_coders.ResidualCoder()
    ref_assigner = ref_assigner_mod.AxisAlignedTargetAssigner(
        model_cfg, class_names, box_coder=ref_coder, match_height=False)

    fmap = [grid_size[0] // stride, grid_size[1] // stride]
    ref_gen = RefAnchorGenerator(pcr, agc)
    ref_anchors, _ = ref_gen.generate_anchors([fmap for _ in agc])

    # frames: normal gts, a gt overlapping nothing strongly, zero-padding
    rng = np.random.default_rng(23)
    B, T = 2, 10
    gt = np.zeros((B, T, 8), dtype=np.float32)
    sizes = {1: [3.9, 1.6, 1.56], 2: [0.8, 0.6, 1.73], 3: [1.76, 0.6, 1.73]}
    for b in range(B):
        n = 6 if b == 0 else 4
        cls = rng.integers(1, 4, n)
        for i, c in enumerate(cls):
            gt[b, i, 0] = rng.uniform(2, 66)
            gt[b, i, 1] = rng.uniform(-38, 38)
            gt[b, i, 2] = rng.uniform(-1.2, -0.6)
            gt[b, i, 3:6] = np.asarray(sizes[int(c)]) * rng.uniform(0.9, 1.1)
            gt[b, i, 6] = rng.choice([0.0, 1.57]) + rng.normal(0, 0.15)
            gt[b, i, 7] = c

    ref_out = ref_assigner.assign_targets(
        [a.float() for a in ref_anchors], torch.tensor(gt))

    anchors, cls_ids, mthr, uthr = generate_anchors(agc, grid_size, pcr,
                                                    stride)
    flat = jnp.asarray(anchors).reshape(-1, 7)
    our_coder = our_coders.build_box_coder('ResidualCoder')
    labels_all, regs_all, w_all = [], [], []
    for b in range(B):
        lab, reg, w, _ = assign_anchor_targets(
            flat, jnp.asarray(np.tile(cls_ids, fmap[1] * fmap[0])),
            jnp.asarray(np.tile(mthr, fmap[1] * fmap[0])),
            jnp.asarray(np.tile(uthr, fmap[1] * fmap[0])),
            jnp.asarray(gt[b]), our_coder, 3)
        labels_all.append(np.asarray(lab))
        regs_all.append(np.asarray(reg))
        w_all.append(np.asarray(w))

    np.testing.assert_array_equal(np.stack(labels_all),
                                  ref_out['box_cls_labels'].numpy())
    np.testing.assert_allclose(np.stack(w_all),
                               ref_out['reg_weights'].numpy(), atol=0)
    np.testing.assert_allclose(np.stack(regs_all),
                               ref_out['box_reg_targets'].numpy(), atol=1e-4)


def test_iassd_target_assignment_matches_reference():
    """The flagship's in-jit point-to-box target assignment
    (``target_assign.assign_targets_iassd``) vs the reference's own
    ``IASSD_Head.assign_stack_targets_IASSD`` (``IASSD_head.py:124-236``)
    run duck-typed on CPU torch, its CUDA points_in_boxes_gpu patched with
    a torch wrapper over our bit-parity-tested first-hit kernel. Covers
    all three shipped variants: set_ignore_flag, use_ex_gt_assign, and
    use_ex_gt_assign + fg_pc_ignore."""
    import importlib
    import sys
    import types
    from tests.reference_loader import REFERENCE_ROOT
    for pkg, path in [
        ('pcdet.models', f'{REFERENCE_ROOT}/pcdet/models'),
        ('pcdet.models.dense_heads',
         f'{REFERENCE_ROOT}/pcdet/models/dense_heads'),
        ('pcdet.models.model_utils',
         f'{REFERENCE_ROOT}/pcdet/models/model_utils'),
    ]:
        mod = sys.modules.setdefault(pkg, types.ModuleType(pkg))
        mod.__path__ = [path]
    ref_head_mod = importlib.import_module(
        'pcdet.models.dense_heads.point_head_template') and \
        importlib.import_module('pcdet.models.dense_heads.IASSD_head')

    from spsnet_tpu.data.processor.data_processor import points_first_box_np
    from spsnet_tpu.models.dense_heads.target_assign import (
        assign_targets_iassd)
    from spsnet_tpu.utils import box_coder as our_coders
    from spsnet_tpu.utils import box_utils as our_box_utils

    def _pib_gpu(points_t, boxes_t):
        # (1, N, 3) x (1, T, 7) -> (1, N) first-hit idx or -1, like the
        # CUDA kernel (same 1e-5 margin family as our native twin)
        out = points_first_box_np(points_t[0].numpy(), boxes_t[0].numpy())
        return torch.from_numpy(out[None]).long()

    import pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils as ref_pib
    ref_pib.points_in_boxes_gpu = _pib_gpu

    mean_size = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]
    ref_coder = ref_coders.PointResidual_BinOri_Coder(
        code_size=30, use_mean_size=True, mean_size=mean_size)
    our_coder = our_coders.build_box_coder(
        'PointResidual_BinOri_Coder', angle_bin_num=12,
        use_mean_size=True, mean_size=mean_size)

    class _Duck:
        num_class = 3
        box_coder = ref_coder

    RefHead = sys.modules['pcdet.models.dense_heads.IASSD_head'].IASSD_Head

    rng = np.random.default_rng(3)
    B, M, T = 2, 600, 9
    pts = np.zeros((B, M, 3), dtype=np.float32)
    pts[..., 0] = rng.uniform(0, 70, (B, M))
    pts[..., 1] = rng.uniform(-40, 40, (B, M))
    pts[..., 2] = rng.uniform(-2.5, 1, (B, M))
    gt = np.zeros((B, T, 8), dtype=np.float32)
    for b in range(B):
        n = 6 if b == 0 else 4
        gt[b, :n, 0] = rng.uniform(5, 60, n)
        gt[b, :n, 1] = rng.uniform(-25, 25, n)
        gt[b, :n, 2] = rng.uniform(-1.2, -0.5, n)
        gt[b, :n, 3:6] = rng.uniform(1.0, 4.5, (n, 3))
        gt[b, :n, 6] = rng.uniform(-np.pi, np.pi, n)
        gt[b, :n, 7] = rng.integers(1, 4, n)
        # drop clusters inside the boxes so fg sets are non-trivial
        for i in range(n):
            m = 25
            local = rng.uniform(-0.45, 0.45, (m, 3)) * gt[b, i, 3:6]
            c, s = np.cos(gt[b, i, 6]), np.sin(gt[b, i, 6])
            world = np.stack([
                local[:, 0] * c - local[:, 1] * s + gt[b, i, 0],
                local[:, 0] * s + local[:, 1] * c + gt[b, i, 1],
                local[:, 2] + gt[b, i, 2]], 1)
            pts[b, rng.integers(0, M, m)] = world

    stacked = np.concatenate([
        np.concatenate([np.full((M, 1), b, np.float32), pts[b]], axis=1)
        for b in range(B)], axis=0)
    ext = np.asarray(our_box_utils.enlarge_box3d(
        jnp.asarray(gt), [1.0, 1.0, 1.0]))

    for mode in ('ignore', 'ex_gt', 'ex_gt_fg_ignore'):
        kw_ref = dict(set_ignore_flag=False, use_ex_gt_assign=False,
                      fg_pc_ignore=False, ret_box_labels=True)
        kw_our = dict(set_ignore_flag=False, use_ex_gt_assign=False,
                      fg_pc_ignore=False, ret_box_labels=True)
        if mode == 'ignore':
            kw_ref['set_ignore_flag'] = kw_our['set_ignore_flag'] = True
        else:
            kw_ref['use_ex_gt_assign'] = kw_our['use_ex_gt_assign'] = True
            if mode == 'ex_gt_fg_ignore':
                kw_ref['fg_pc_ignore'] = kw_our['fg_pc_ignore'] = True

        ref_t = RefHead.assign_stack_targets_IASSD(
            _Duck(), torch.tensor(stacked), torch.tensor(gt),
            extend_gt_boxes=torch.tensor(ext), **kw_ref)
        our_t = assign_targets_iassd(
            jnp.asarray(pts), jnp.asarray(gt), jnp.asarray(ext),
            box_coder=our_coder, num_class=3, **kw_our)

        our_cls = np.asarray(our_t.cls_labels).reshape(-1)
        np.testing.assert_array_equal(
            our_cls, ref_t['point_cls_labels'].numpy(), err_msg=mode)
        np.testing.assert_array_equal(
            np.asarray(our_t.box_idxs).reshape(-1),
            ref_t['box_idxs_labels'].numpy(), err_msg=mode)
        fg = our_cls > 0
        np.testing.assert_allclose(
            np.asarray(our_t.gt_box_of_points).reshape(-1, 8)[fg],
            ref_t['gt_box_of_points'].numpy()[fg], atol=1e-6, err_msg=mode)
        our_bl = np.asarray(our_t.box_labels)
        our_bl = our_bl.reshape(-1, our_bl.shape[-1])
        assert our_bl.shape == tuple(ref_t['point_box_labels'].shape), mode
        np.testing.assert_allclose(
            our_bl[fg], ref_t['point_box_labels'].numpy()[fg],
            atol=1e-4, err_msg=mode)


def test_part_labels_match_reference():
    """PartA2's intra-object part locations vs the reference's generic
    ``assign_stack_targets(ret_part_labels=True)``
    (``point_head_template.py:49-129``) duck-run on CPU torch."""
    import importlib
    import sys
    import types
    from tests.reference_loader import REFERENCE_ROOT
    for pkg, path in [
        ('pcdet.models', f'{REFERENCE_ROOT}/pcdet/models'),
        ('pcdet.models.dense_heads',
         f'{REFERENCE_ROOT}/pcdet/models/dense_heads'),
        ('pcdet.models.model_utils',
         f'{REFERENCE_ROOT}/pcdet/models/model_utils'),
    ]:
        mod = sys.modules.setdefault(pkg, types.ModuleType(pkg))
        mod.__path__ = [path]
    ref_tmpl = importlib.import_module(
        'pcdet.models.dense_heads.point_head_template')

    from spsnet_tpu.data.processor.data_processor import points_first_box_np
    import pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils as ref_pib

    def _pib_gpu(points_t, boxes_t):
        out = points_first_box_np(points_t[0].numpy(), boxes_t[0].numpy())
        return torch.from_numpy(out[None]).long()

    ref_pib.points_in_boxes_gpu = _pib_gpu

    from spsnet_tpu.models.dense_heads.point_intra_part_head import (
        intra_part_targets)
    from spsnet_tpu.utils import box_utils as our_box_utils

    rng = np.random.default_rng(41)
    B, M, T = 2, 500, 6
    pts = np.zeros((B, M, 3), dtype=np.float32)
    pts[..., 0] = rng.uniform(0, 70, (B, M))
    pts[..., 1] = rng.uniform(-40, 40, (B, M))
    pts[..., 2] = rng.uniform(-2.5, 1, (B, M))
    gt = np.zeros((B, T, 8), dtype=np.float32)
    for b in range(B):
        n = 5
        gt[b, :n, 0] = rng.uniform(5, 60, n)
        gt[b, :n, 1] = rng.uniform(-25, 25, n)
        gt[b, :n, 2] = rng.uniform(-1.2, -0.5, n)
        gt[b, :n, 3:6] = rng.uniform(1.5, 4.5, (n, 3))
        gt[b, :n, 6] = rng.uniform(-np.pi, np.pi, n)
        gt[b, :n, 7] = rng.integers(1, 4, n)
        for i in range(n):
            k = 30
            local = rng.uniform(-0.45, 0.45, (k, 3)) * gt[b, i, 3:6]
            c, s = np.cos(gt[b, i, 6]), np.sin(gt[b, i, 6])
            world = np.stack([
                local[:, 0] * c - local[:, 1] * s + gt[b, i, 0],
                local[:, 0] * s + local[:, 1] * c + gt[b, i, 1],
                local[:, 2] + gt[b, i, 2]], 1)
            pts[b, rng.integers(0, M, k)] = world

    class _Duck:
        num_class = 3

    stacked = np.concatenate([
        np.concatenate([np.full((M, 1), b, np.float32), pts[b]], axis=1)
        for b in range(B)], axis=0)
    ext = np.asarray(our_box_utils.enlarge_box3d(
        jnp.asarray(gt), [0.2, 0.2, 0.2]))
    ref_t = ref_tmpl.PointHeadTemplate.assign_stack_targets(
        _Duck(), torch.tensor(stacked), torch.tensor(gt),
        extend_gt_boxes=torch.tensor(ext),
        set_ignore_flag=True, ret_part_labels=True)

    fg, part = intra_part_targets(jnp.asarray(pts), jnp.asarray(gt))
    ref_part = ref_t['point_part_labels'].numpy()
    our_part = np.asarray(part).reshape(-1, 3)
    fg_np = np.asarray(fg).reshape(-1)
    # reference zeroes non-fg rows too (buffer init)
    np.testing.assert_array_equal(
        fg_np, (ref_t['point_cls_labels'].numpy() > 0))
    np.testing.assert_allclose(our_part[fg_np], ref_part[fg_np], atol=1e-5)
