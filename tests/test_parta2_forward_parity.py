"""Composed PartA2 forward parity vs the reference's own torch modules
(``base_bev_backbone.py`` -> ``anchor_head_single.py`` ->
``point_intra_part_head.py`` -> ``partA2_head.py``).

The UNet spconv backbone cannot execute on CPU, so BOTH models consume the
SAME synthetic intermediates (BEV map + per-voxel decoder features/coords)
and the comparison isolates everything downstream: the anchor RPN decode,
proposal NMS, the intra-part head's sigmoid outputs, RoI-aware voxel
pooling (avg part / max rpn, SEG_MASK_SCORE_THRESH zeroing), the
conv_part/conv_rpn SUBMANIFOLD stacks — executed on the reference side by
the dense-conv twin in ``reference_loader._install_param_spconv`` and on
ours by ``SubMConvBlock``'s masked dense convs — and the shared/cls/reg FC
refinement.

``RoIAwarePool3d`` is patched with a numpy twin of the CUDA kernel
(``roiaware_pool3d_kernel.cu:23-120``: check_pt_in_box3d with MARGIN=1e-5,
inclusive z, local-frame binning ``int((local+d/2)/res)`` clamped); rotated
NMS reuses the PV-RCNN test's twin.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from spsnet_tpu.config import EDict, cfg_from_yaml_file
from spsnet_tpu.models.detectors import build_detector_from_cfg
from spsnet_tpu.utils import checkpoint_import as ci
from tests.test_pvrcnn_forward_parity import _patch_stack_ops

REPO = '/root/repo'


def _load_cfg():
    cfg = EDict()
    cfg_from_yaml_file(f'{REPO}/tools/cfgs/kitti_models/PartA2.yaml', cfg)
    # activation-size knobs only, applied to BOTH models identically
    for phase in ('TRAIN', 'TEST'):
        cfg.MODEL.ROI_HEAD.NMS_CONFIG[phase].NMS_PRE_MAXSIZE = 64
        cfg.MODEL.ROI_HEAD.NMS_CONFIG[phase].NMS_POST_MAXSIZE = 8
    return cfg


def _patch_roiaware_pool():
    """Install a numpy RoIAwarePool3d twin on the stubbed CUDA module
    (must run BEFORE the detector is built — __init__ instantiates it)."""
    import importlib
    ra = importlib.import_module(
        'pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils')

    def t_forward(self, rois, pts, pts_feature, pool_method='max'):
        G = self.out_size
        gx, gy, gz = (G, G, G) if isinstance(G, int) else tuple(G)
        b = rois.detach().numpy()
        p = pts.detach().numpy()
        f = pts_feature.detach().numpy()
        R, C = len(b), f.shape[1]
        out = np.zeros((R, gx, gy, gz, C), np.float32)
        cnt = np.zeros((R, gx, gy, gz), np.int64)
        for r in range(R):
            cx, cy, cz, dx, dy, dz, rz = b[r, :7]
            shift = p - b[r, 0:3]
            cosa, sina = np.cos(-rz), np.sin(-rz)
            lx = shift[:, 0] * cosa - shift[:, 1] * sina
            ly = shift[:, 0] * sina + shift[:, 1] * cosa
            lz = shift[:, 2]
            m = 1e-5                              # CUDA kernel MARGIN
            inside = ((np.abs(lz) <= dz / 2.0)
                      & (np.abs(lx) < dx / 2.0 + m)
                      & (np.abs(ly) < dy / 2.0 + m))
            ix = np.clip(((lx + dx / 2) / (dx / gx)).astype(np.int64),
                         0, gx - 1)
            iy = np.clip(((ly + dy / 2) / (dy / gy)).astype(np.int64),
                         0, gy - 1)
            iz = np.clip(((lz + dz / 2) / (dz / gz)).astype(np.int64),
                         0, gz - 1)
            for i in np.flatnonzero(inside):
                if pool_method == 'max':
                    sl = out[r, ix[i], iy[i], iz[i]]
                    if cnt[r, ix[i], iy[i], iz[i]] == 0:
                        out[r, ix[i], iy[i], iz[i]] = f[i]
                    else:
                        np.maximum(sl, f[i], out=sl)
                else:
                    out[r, ix[i], iy[i], iz[i]] += f[i]
                cnt[r, ix[i], iy[i], iz[i]] += 1
        if pool_method == 'avg':
            nz = cnt > 0
            out[nz] /= cnt[nz][..., None]
        return torch.from_numpy(out)

    class RoIAwarePool3d(torch.nn.Module):
        def __init__(self, out_size, max_pts_each_voxel=128):
            super().__init__()
            self.out_size = out_size
            self.max_pts_each_voxel = max_pts_each_voxel

        forward = t_forward

    ra.RoIAwarePool3d = RoIAwarePool3d


def _synthetic_intermediates(seed=0, V=192):
    rng = np.random.default_rng(seed)
    centers = np.zeros((V, 3), np.float32)
    centers[:, 0] = rng.uniform(1, 69, V)
    centers[:, 1] = rng.uniform(-39, 39, V)
    centers[:, 2] = rng.uniform(-2.5, 0.5, V)
    feats = rng.normal(size=(V, 16)).astype(np.float32)   # UNet decoder out
    bev = rng.normal(size=(1, 200, 176, 256)).astype(np.float32)   # NHWC
    return centers, feats, bev


@pytest.mark.slow
def test_parta2_forward_parity():
    from tests.reference_loader import build_reference_detector

    from tests.reference_loader import load_reference_pcdet

    cfg = _load_cfg()
    torch.manual_seed(0)   # ref init uses torch's global rng
    load_reference_pcdet()
    _patch_roiaware_pool()      # before build: __init__ instantiates it
    ref = build_reference_detector('PartA2_net', 'PartA2Net',
                                   _load_cfg().MODEL).eval()
    _patch_stack_ops()
    with torch.no_grad():                     # non-identity BN everywhere
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.weight.copy_(torch.rand_like(m.weight) + 0.5)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)

    # the whole PartA2 state dict maps — incl. the UNet UR-block decoder
    params, stats, unmapped = ci.convert_reference_state_dict(
        ref.state_dict())
    assert not unmapped, unmapped

    centers, feats, bev = _synthetic_intermediates()

    # ---- reference: manual module chain on the synthetic state ----
    V = len(centers)
    bd = {
        'batch_size': 1,
        'spatial_features': torch.from_numpy(
            np.ascontiguousarray(bev.transpose(0, 3, 1, 2))),
        'spatial_features_stride': 8,
        'point_features': torch.from_numpy(feats),
        'point_coords': torch.from_numpy(np.concatenate(
            [np.zeros((V, 1), np.float32), centers], axis=1)),
    }
    with torch.no_grad():
        bd = ref.backbone_2d(bd)
        bd = ref.dense_head(bd)
        bd = ref.point_head(bd)
        bd = ref.roi_head(bd)
    ref_rois = bd['rois'][0].numpy()
    ref_boxes = bd['batch_box_preds'][0].numpy()
    ref_cls = bd['batch_cls_preds'][0].numpy().reshape(-1)
    ref_score = bd['point_cls_scores'].numpy().reshape(-1)
    ref_part = bd['point_part_offset'].numpy()

    # ---- ours: bound submodule chain on the same state ----
    model = build_detector_from_cfg(cfg)
    batch = {
        'spatial_features': jnp.asarray(bev),
        'point_features': jnp.asarray(feats)[None],
        'voxel_centers': jnp.asarray(centers)[None],
        'voxel_valid': jnp.ones((1, V), bool),
    }

    def chain(m, b):
        out = dict(b)
        out = m.backbone_2d(out, train=False)
        out = m.dense_head(out, train=False)
        out = m.point_head(out, train=False)
        out = m.roi_head(out, train=False)
        return out

    variables = model.init(jax.random.PRNGKey(0), batch, method=chain)
    keep = set(variables['params'].keys())
    params = {k: v for k, v in params.items() if k in keep}
    stats = {k: v for k, v in stats.items() if k in keep}
    merged = ci.merge_into_variables(variables, params, stats,
                                     strict_shapes=True)
    out = model.apply(merged, batch, method=chain)

    # --- intra-part head outputs
    our_pf = np.asarray(out['point_part_features'][0])   # (V, 4)
    np.testing.assert_allclose(our_pf[:, 3], ref_score, atol=1e-4)
    np.testing.assert_allclose(our_pf[:, 0:3], ref_part, atol=1e-4)

    # --- proposals after NMS
    our_rois = np.asarray(out['roi_head_ret']['rois'][0])
    n = min(len(ref_rois), len(our_rois))
    assert n > 0
    np.testing.assert_allclose(our_rois[:n, :7], ref_rois[:n, :7], atol=1e-3)

    # --- final refined boxes + rcnn scores (the submanifold RCNN path)
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
