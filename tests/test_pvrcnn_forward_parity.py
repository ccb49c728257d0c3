"""Composed PV-RCNN two-stage forward parity vs the reference's own torch
modules (``voxel_set_abstraction.py`` -> ``base_bev_backbone.py`` ->
``anchor_head_single.py`` -> ``point_head_simple.py`` -> ``pvrcnn_head.py``).

The spconv backbone cannot execute on CPU, so BOTH models consume the SAME
synthetic intermediates (raw points, per-level sparse voxel features, BEV
map) and the comparison isolates everything downstream: keypoint FPS, the
VSA stack-SA aggregation (incl. empty-ball zeroing), BEV bilinear
interpolation, the anchor RPN decode, keypoint segmentation scores, the
proposal NMS, RoI-grid pooling, and the RCNN refine/decode.

The reference's stack CUDA wrappers are patched with twins implementing the
CUDA kernels' documented semantics (``ball_query_gpu.cu``: first-k in index
order, first-hit pad, -1 empty mask; ``iou3d_nms_utils.nms_gpu``: greedy
rotated-BEV-IoU over score order).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from spsnet_tpu.config import EDict, cfg_from_yaml_file
from spsnet_tpu.models.detectors import build_detector_from_cfg
from spsnet_tpu.utils import checkpoint_import as ci
from tests.reference_impls import fps_ref, nms_ref

REPO = '/root/repo'


def _load_cfg():
    cfg = EDict()
    cfg_from_yaml_file(f'{REPO}/tools/cfgs/kitti_models/pv_rcnn.yaml', cfg)
    # activation-size knobs only (parameter shapes untouched) — applied to
    # BOTH models identically
    cfg.MODEL.PFE.NUM_KEYPOINTS = 64
    for phase in ('TRAIN', 'TEST'):
        cfg.MODEL.ROI_HEAD.NMS_CONFIG[phase].NMS_PRE_MAXSIZE = 64
        cfg.MODEL.ROI_HEAD.NMS_CONFIG[phase].NMS_POST_MAXSIZE = 8
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = 16
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = 8
    return cfg


def _patch_stack_ops():
    """Patch the reference's stack pointnet2 + iou3d python wrappers with
    CPU twins (module-attribute patch: call sites resolve at call time)."""
    import importlib
    pu = importlib.import_module(
        'pcdet.ops.pointnet2.pointnet2_stack.pointnet2_utils')

    def t_ball_query(radius, nsample, xyz, xyz_batch_cnt, new_xyz,
                     new_xyz_batch_cnt):
        x = xyz.detach().numpy()
        nx = new_xyz.detach().numpy()
        xc = xyz_batch_cnt.detach().numpy().astype(int)
        nc = new_xyz_batch_cnt.detach().numpy().astype(int)
        M = len(nx)
        idx = np.zeros((M, nsample), np.int32)
        empty = np.zeros(M, bool)
        r2 = float(radius) ** 2
        xo = mo = 0
        for b in range(len(xc)):
            xs = x[xo:xo + xc[b]]
            for i in range(nc[b]):
                d = xs - nx[mo + i]
                h = np.flatnonzero(
                    d[:, 0] ** 2 + d[:, 1] ** 2 + d[:, 2] ** 2 < r2)
                if h.size == 0:
                    empty[mo + i] = True
                    continue
                take = h[:nsample]
                idx[mo + i, :] = take[0]
                idx[mo + i, :take.size] = take
            xo += xc[b]
            mo += nc[b]
        return (torch.from_numpy(idx), torch.from_numpy(empty))

    def t_grouping(features, features_batch_cnt, idx, idx_batch_cnt):
        f = features.detach().numpy()
        fc = features_batch_cnt.detach().numpy().astype(int)
        ic = idx_batch_cnt.detach().numpy().astype(int)
        ii = idx.detach().numpy().astype(np.int64)
        rows = []
        fo = io = 0
        for b in range(len(fc)):
            rows.append(f[fo + ii[io:io + ic[b]]])       # (Mb, ns, C)
            fo += fc[b]
            io += ic[b]
        out = np.concatenate(rows, axis=0)               # (M, ns, C)
        return torch.from_numpy(
            np.ascontiguousarray(out.transpose(0, 2, 1)))  # (M, C, ns)

    def t_fps(xyz, npoint):
        return torch.from_numpy(
            fps_ref(xyz.detach().numpy(), npoint).astype(np.int32))

    pu.ball_query = t_ball_query
    pu.grouping_operation = t_grouping
    pu.farthest_point_sample = t_fps

    nms_mod = importlib.import_module('pcdet.ops.iou3d_nms.iou3d_nms_utils')

    def t_nms_gpu(boxes, scores, thresh, pre_maxsize=None, **kw):
        b = boxes.detach().numpy()
        s = scores.detach().numpy()
        if pre_maxsize is not None and len(s) > pre_maxsize:
            top = np.argsort(-s, kind='stable')[:pre_maxsize]
            keep = top[nms_ref(b[top], s[top], thresh)]
        else:
            keep = nms_ref(b, s, thresh)
        return torch.from_numpy(np.asarray(keep, np.int64)), None

    nms_mod.nms_gpu = t_nms_gpu


def _synthetic_intermediates(seed=0):
    """One frame of synthetic post-backbone state on the full KITTI
    geometry (pcr [0,-40,-3,70.4,40,1], voxel [.05,.05,.1], BEV stride 8)."""
    rng = np.random.default_rng(seed)
    N = 256
    pts = np.zeros((N, 4), np.float32)
    pts[:, 0] = rng.uniform(1, 69, N)
    pts[:, 1] = rng.uniform(-39, 39, N)
    pts[:, 2] = rng.uniform(-2.5, 0.5, N)
    pts[:, 3] = rng.uniform(0, 1, N)

    level_grids = {'x_conv1': (41, 1600, 1408), 'x_conv2': (21, 800, 704),
                   'x_conv3': (11, 400, 352), 'x_conv4': (6, 200, 176)}
    chans = {'x_conv1': 16, 'x_conv2': 32, 'x_conv3': 64, 'x_conv4': 64}
    levels = {}
    for name, g in level_grids.items():
        M = 48
        coords = np.unique(np.stack(
            [rng.integers(0, gd, M) for gd in g], axis=1), axis=0)
        feats = rng.normal(size=(len(coords), chans[name])).astype(np.float32)
        levels[name] = (coords.astype(np.int64), feats)

    bev = rng.normal(size=(1, 200, 176, 256)).astype(np.float32)  # NHWC
    return pts, levels, bev


class _FakeSparseTensor:
    def __init__(self, indices, features):
        self.indices = indices
        self.features = features


def test_pvrcnn_two_stage_forward_parity():
    from tests.reference_loader import build_reference_detector

    cfg = _load_cfg()
    # the reference init draws from torch's GLOBAL rng: without a seed the
    # weights depend on which tests ran before, and near-tied proposals can
    # flip the NMS'd roi set between ours and the reference (observed as an
    # order-dependent one-roi mismatch in the full suite)
    torch.manual_seed(0)
    ref = build_reference_detector('pv_rcnn', 'PVRCNN', _load_cfg().MODEL)
    ref = ref.eval()
    _patch_stack_ops()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.weight.copy_(torch.rand_like(m.weight) + 0.5)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    params, stats, unmapped = ci.convert_reference_state_dict(
        ref.state_dict())
    assert not unmapped

    pts, levels, bev = _synthetic_intermediates()

    # ---- reference: manual module chain on the synthetic state ----
    bd = {
        'batch_size': 1,
        'points': torch.from_numpy(np.concatenate(
            [np.zeros((len(pts), 1), np.float32), pts], axis=1)),
        'multi_scale_3d_features': {
            name: _FakeSparseTensor(
                torch.from_numpy(np.concatenate(
                    [np.zeros((len(c), 1), np.int64), c], axis=1).astype(
                        np.int32)),
                torch.from_numpy(f))
            for name, (c, f) in levels.items()},
        'spatial_features': torch.from_numpy(
            np.ascontiguousarray(bev.transpose(0, 3, 1, 2))),
        'spatial_features_stride': 8,
    }
    with torch.no_grad():
        bd = ref.pfe(bd)
        bd = ref.backbone_2d(bd)
        bd = ref.dense_head(bd)
        bd = ref.point_head(bd)
        bd = ref.roi_head(bd)
    ref_boxes = bd['batch_box_preds'][0].numpy()        # (R, 7)
    ref_cls = bd['batch_cls_preds'][0].numpy().reshape(-1)
    ref_rois = bd['rois'][0].numpy()

    # ---- ours: bound submodule chain on the same state ----
    model = build_detector_from_cfg(cfg)
    coord_keys = {'x_conv1': 'voxel_coords', 'x_conv2': 'down2_coords',
                  'x_conv3': 'down3_coords', 'x_conv4': 'down4_coords'}
    batch = {
        'points': jnp.asarray(pts)[None],
        'spatial_features': jnp.asarray(bev),
        'multi_scale_3d_features': {
            name: jnp.asarray(f)[None] for name, (c, f) in levels.items()},
    }
    for name, (c, f) in levels.items():
        batch[coord_keys[name]] = jnp.asarray(c)[None]
        batch[coord_keys[name].replace('coords', 'valid')] = \
            jnp.ones((1, len(c)), bool)

    def chain(m, b):
        out = dict(b)
        out = m.backbone_2d(out, train=False)
        out = m.dense_head(out, train=False)
        out = m.pfe(out, train=False)
        out = m.point_head(out, train=False)
        out = m.roi_head(out, train=False)
        return out

    variables = model.init(jax.random.PRNGKey(0), batch, method=chain)
    # only the chain's modules exist in this variables tree — drop the
    # reference's vfe/backbone_3d weights before merging
    keep = set(variables['params'].keys())
    params = {k: v for k, v in params.items() if k in keep}
    stats = {k: v for k, v in stats.items() if k in keep}
    merged = ci.merge_into_variables(variables, params, stats,
                                     strict_shapes=True)
    out = model.apply(merged, batch, method=chain)

    # --- keypoint features after VSA fusion: the irregular-op-heavy core
    our_kp = np.asarray(out['point_features'][0])
    ref_kp = bd['point_features'].numpy()
    assert our_kp.shape == ref_kp.shape
    kp_scale = np.abs(ref_kp).max() + 1e-9
    assert np.abs(our_kp - ref_kp).max() / kp_scale < 2e-3, \
        np.abs(our_kp - ref_kp).max() / kp_scale

    # --- keypoint segmentation scores
    our_seg = np.asarray(out['point_cls_scores'][0])
    ref_seg = bd['point_cls_scores'].numpy().reshape(-1)
    assert np.abs(our_seg - ref_seg).max() < 1e-3

    # --- proposals after NMS (sorted sets; counts may differ by padding)
    our_rois = np.asarray(out['roi_head_ret']['rois'][0])
    n = min(len(ref_rois), len(our_rois))
    np.testing.assert_allclose(our_rois[:n, :7], ref_rois[:n, :7],
                               atol=1e-3)

    # --- final refined boxes + rcnn scores
    our_boxes = np.asarray(out['batch_box_preds'][0])
    our_cls = np.asarray(out['batch_cls_preds'][0]).reshape(-1)
    n = min(len(ref_boxes), len(our_boxes))
    box_scale = np.abs(ref_boxes[:n, :6]).max() + 1e-9
    assert np.abs(our_boxes[:n, :6] - ref_boxes[:n, :6]).max() / box_scale \
        < 2e-3
    ang = np.abs(np.angle(np.exp(
        1j * (our_boxes[:n, 6] - ref_boxes[:n, 6]))))
    assert ang.max() < 2e-3
    assert np.abs(our_cls[:n] - ref_cls[:n]).max() < 2e-3
