"""Composed PointRCNN two-stage forward parity vs the reference's own torch
modules (``detectors/PointRCNN.py``: PointNet2MSG backbone -> PointHeadBox
-> proposal NMS -> RoIPointPool3d -> PointRCNNHead refine).

The whole pre-NMS path is the batch pointnet2 family, so the reference runs
on CPU with the same numpy spec twins the IASSD parity test uses, extended
with three_nn / three_interpolate (the FP decoder) and a RoIPointPool3d
twin implementing the CUDA kernel's semantics
(``roipoint_pool3d_kernel.cu``: per-roi first-k points inside the
POOL_EXTRA_WIDTH-enlarged box in index order, cyclic duplication padding,
zero + empty-flag when none).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from spsnet_tpu.config import EDict, cfg_from_yaml_file
from spsnet_tpu.models import build_detector
from tests.reference_impls import three_nn_ref
from spsnet_tpu.utils import checkpoint_import as ci

REPO = '/root/repo'


def _make_pool_twin():
    class RoIPointPool3d(torch.nn.Module):
        def __init__(self, num_sampled_points=512, pool_extra_width=1.0):
            super().__init__()
            self.num_sampled_points = int(num_sampled_points)
            self.pool_extra_width = pool_extra_width

        def forward(self, points, point_features, boxes3d):
            """points (B,N,3), feats (B,N,C), boxes (B,M,7) ->
            pooled (B,M,S,3+C), empty (B,M). check_pt_in_box3d semantics:
            center-based box, z inclusive at dz/2, xy with 1e-5 margin."""
            pts = points.detach().numpy()
            fts = point_features.detach().numpy()
            box = boxes3d.detach().numpy().copy()
            ew = np.asarray(self.pool_extra_width, np.float32).reshape(-1)
            ew = np.pad(ew, (0, 3 - len(ew)), mode='edge')
            box[..., 3:6] += 2 * ew                  # enlarge_box3d
            B, M = box.shape[:2]
            S = self.num_sampled_points
            src = np.concatenate([pts, fts], axis=-1)
            pooled = np.zeros((B, M, S, src.shape[-1]), np.float32)
            empty = np.zeros((B, M), np.int32)
            for b in range(B):
                sh = pts[b][None, :, :2] - box[b][:, None, :2]  # (M, N, 2)
                rz = box[b][:, 6]
                ca = np.cos(-rz)[:, None]
                sa = np.sin(-rz)[:, None]
                lx = sh[..., 0] * ca - sh[..., 1] * sa
                ly = sh[..., 0] * sa + sh[..., 1] * ca
                zin = np.abs(pts[b][None, :, 2] - box[b][:, None, 2]) <= \
                    box[b][:, None, 5] / 2.0
                inside = zin & \
                    (np.abs(lx) < box[b][:, None, 3] / 2.0 + 1e-5) & \
                    (np.abs(ly) < box[b][:, None, 4] / 2.0 + 1e-5)
                for m in range(M):
                    h = np.flatnonzero(inside[m])[:S]
                    if h.size == 0:
                        empty[b, m] = 1
                        continue
                    sl = h[np.arange(S) % h.size]    # cyclic duplication
                    pooled[b, m] = src[b][sl]
            return torch.from_numpy(pooled), torch.from_numpy(empty)

    return RoIPointPool3d


def _patch_fp_and_pool_pre():
    """Install the RoIPointPool3d twin onto the stub module (needed at
    detector CONSTRUCTION time)."""
    import importlib
    rp = importlib.import_module(
        'pcdet.ops.roipoint_pool3d.roipoint_pool3d_utils')
    rp.RoIPointPool3d = _make_pool_twin()


def _patch_fp_and_pool():
    """three_nn / three_interpolate twins + the RoIPointPool3d twin."""
    import importlib
    pu = importlib.import_module(
        'pcdet.ops.pointnet2.pointnet2_batch.pointnet2_utils')

    class _ThreeNN(torch.autograd.Function):
        @staticmethod
        def forward(ctx, unknown, known):
            d, i = three_nn_ref(unknown.detach().numpy(),
                                known.detach().numpy())
            return (torch.from_numpy(np.sqrt(d).astype(np.float32)),
                    torch.from_numpy(i.astype(np.int32)))

    class _ThreeInterpolate(torch.autograd.Function):
        @staticmethod
        def forward(ctx, features, idx, weight):
            f = features.detach().numpy()              # (B, C, M)
            i = idx.detach().numpy().astype(np.int64)  # (B, N, 3)
            w = weight.detach().numpy()                # (B, N, 3)
            B = f.shape[0]
            out = np.stack([
                (f[b][:, i[b]] * w[b][None]).sum(-1) for b in range(B)])
            return torch.from_numpy(out.astype(np.float32))

    pu.three_nn = _ThreeNN.apply
    pu.three_interpolate = _ThreeInterpolate.apply

    rp = importlib.import_module(
        'pcdet.ops.roipoint_pool3d.roipoint_pool3d_utils')

    rp.RoIPointPool3d = _make_pool_twin()


def _load_cfg():
    cfg = EDict()
    cfg_from_yaml_file(f'{REPO}/tools/cfgs/kitti_models/pointrcnn.yaml', cfg)
    for phase in ('TRAIN', 'TEST'):
        cfg.MODEL.ROI_HEAD.NMS_CONFIG[phase].NMS_PRE_MAXSIZE = 64
        cfg.MODEL.ROI_HEAD.NMS_CONFIG[phase].NMS_POST_MAXSIZE = 8
    return cfg


def _scene(seed=0, n=2048):
    rng = np.random.default_rng(seed)
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(1, 69, n)
    pts[:, 1] = rng.uniform(-38, 38, n)
    pts[:, 2] = rng.uniform(-2.5, 0.5, n)
    pts[:, 3] = rng.uniform(0, 1, n)
    # a few dense clusters so stage-2 pooling has content
    for k, (cx, cy) in enumerate([(10, 2), (20, -5), (35, 8)]):
        sl = slice(k * 200, (k + 1) * 200)
        pts[sl, 0] = cx + rng.uniform(-1.5, 1.5, 200)
        pts[sl, 1] = cy + rng.uniform(-0.8, 0.8, 200)
        pts[sl, 2] = rng.uniform(-1.5, 0.2, 200)
    return pts


def test_pointrcnn_forward_parity_vs_reference():
    from tests.reference_loader import build_reference_detector
    from tests.test_reference_forward_parity import _patch_reference_cuda_ops
    from tests.test_pvrcnn_forward_parity import _patch_stack_ops

    torch.manual_seed(0)
    cfg = _load_cfg()
    # the roipoint twin must exist BEFORE construction (the head
    # instantiates RoIPointPool3d in __init__); load pcdet via a throwaway
    # build of another detector first, then patch, then build
    from tests.reference_loader import load_reference_pcdet, _stub
    load_reference_pcdet()
    _stub('pcdet.ops.roipoint_pool3d.roipoint_pool3d_utils')
    _patch_fp_and_pool_pre()
    ref = build_reference_detector('point_rcnn', 'PointRCNN',
                                   _load_cfg().MODEL)
    ref = ref.eval()
    _patch_reference_cuda_ops()
    _patch_stack_ops()                        # nms twin
    _patch_fp_and_pool()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.weight.copy_(torch.rand_like(m.weight) + 0.5)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    params, stats, unmapped = ci.convert_reference_state_dict(
        ref.state_dict())
    assert not unmapped, unmapped[:8]

    pts = _scene()
    bd = {'batch_size': 1,
          'points': torch.from_numpy(np.concatenate(
              [np.zeros((len(pts), 1), np.float32), pts], axis=1))}
    with torch.no_grad():
        for mod in ref.module_list:
            bd = mod(bd)
    ref_boxes = bd['batch_box_preds'][0].numpy()
    ref_cls = bd['batch_cls_preds'][0].numpy().reshape(-1)

    model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES))
    batch = {'points': jnp.asarray(pts)[None]}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    merged = ci.merge_into_variables(variables, params, stats,
                                     strict_shapes=True)
    out = model.apply(merged, batch, train=False)
    our_boxes = np.asarray(out['batch_box_preds'][0])
    our_cls = np.asarray(out['batch_cls_preds'][0]).reshape(-1)

    # every reference refined box must have an our-side twin (our output is
    # PADDED to NMS_POST slots and near-tied proposal scores can reorder,
    # so positional pairing is not usable)
    assert len(ref_boxes) >= 3            # non-vacuous
    for i in range(len(ref_boxes)):
        d = np.abs(our_boxes[:, :6] - ref_boxes[i, :6]).max(axis=1)
        ang = np.abs(np.angle(np.exp(
            1j * (our_boxes[:, 6] - ref_boxes[i, 6]))))
        j = int(np.argmin(d + ang))
        assert d[j] < 0.01 and ang[j] < 0.01, (i, d[j], ang[j])
        assert abs(our_cls[j] - ref_cls[i]) < 2e-3, (i, our_cls[j],
                                                     ref_cls[i])
