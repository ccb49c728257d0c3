"""Composed VoxelRCNN two-stage forward parity vs the reference's own torch
modules (``base_bev_backbone.py`` -> ``anchor_head_single.py`` ->
``voxelrcnn_head.py`` incl. ``NeighborVoxelSAModuleMSG``,
``voxel_pool_modules.py:8-130``).

Like the PV-RCNN parity test, the spconv backbone cannot execute on CPU, so
BOTH models consume the SAME synthetic intermediates (per-level sparse voxel
features + BEV map) and the comparison isolates everything downstream: the
RPN decode, proposal NMS, the voxel-query RoI-grid pooling (mlp_in/mlp_pos
ADD fusion, empty-ball zeroing, mlp_out after the slot max-pool), the
shared/cls/reg FC stacks and the RCNN refine/decode.

The reference's ``voxel_query`` CUDA op is patched with a numpy twin of the
kernel (``voxel_query_gpu.cu:11-89``: lexicographic (dz, dy, dx) window
scan over the voxel hash, strictly-greater radius rejection, first-hit
fill-then-overwrite padding, idx[0] = -1 empty marker); stack grouping and
rotated NMS reuse the PV-RCNN test's twins. Our head realizes the same
neighborhoods as a radius query over voxel-center clouds — the shipped
QUERY_RANGES window strictly contains the radius ball (r = 4 voxel
pitches), so sets agree whenever a ball does not overflow NSAMPLE; the
fixture keeps voxels sparse enough that none does.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from spsnet_tpu.config import EDict, cfg_from_yaml_file
from spsnet_tpu.models.detectors import build_detector_from_cfg
from spsnet_tpu.utils import checkpoint_import as ci
from tests.test_pvrcnn_forward_parity import (_FakeSparseTensor,
                                              _patch_stack_ops)

REPO = '/root/repo'


def _load_cfg():
    cfg = EDict()
    cfg_from_yaml_file(f'{REPO}/tools/cfgs/kitti_models/voxel_rcnn_car.yaml',
                       cfg)
    # activation-size knobs only, applied to BOTH models identically.
    # GRID_SIZE shrinks the query count (param shapes change consistently
    # on both sides — weights are imported, not pretrained).
    cfg.MODEL.ROI_GRID_POOL = cfg.MODEL.ROI_HEAD.ROI_GRID_POOL
    cfg.MODEL.ROI_HEAD.ROI_GRID_POOL.GRID_SIZE = 3
    for phase in ('TRAIN', 'TEST'):
        cfg.MODEL.ROI_HEAD.NMS_CONFIG[phase].NMS_PRE_MAXSIZE = 64
        cfg.MODEL.ROI_HEAD.NMS_CONFIG[phase].NMS_POST_MAXSIZE = 8
    return cfg


def _patch_voxel_query():
    """numpy twin of ``voxel_query_kernel_stack`` semantics."""
    import importlib
    vq = importlib.import_module(
        'pcdet.ops.pointnet2.pointnet2_stack.voxel_query_utils')

    def t_voxel_query(max_range, radius, nsample, xyz, new_xyz, new_coords,
                      point_indices):
        zr, yr, xr = (int(v) for v in max_range)
        x = xyz.detach().numpy()
        nx = new_xyz.detach().numpy()
        nc = new_coords.detach().numpy().astype(np.int64)
        v2p = point_indices.detach().numpy()
        _, Z, Y, X = v2p.shape
        M = len(nc)
        offs = np.stack(np.meshgrid(
            np.arange(-zr, zr + 1), np.arange(-yr, yr + 1),
            np.arange(-xr, xr + 1), indexing='ij'), axis=-1).reshape(-1, 3)
        r2 = float(radius) ** 2
        idx = np.zeros((M, nsample), np.int32)
        for m in range(M):
            b, cz, cy, cx = nc[m]
            c = offs + np.array([cz, cy, cx])
            ok = ((c[:, 0] >= 0) & (c[:, 0] < Z) & (c[:, 1] >= 0)
                  & (c[:, 1] < Y) & (c[:, 2] >= 0) & (c[:, 2] < X))
            cand = v2p[b, c[ok, 0], c[ok, 1], c[ok, 2]]
            cand = cand[cand >= 0]
            if cand.size:
                d = x[cand] - nx[m]
                # kernel keeps d2 <= r2 (skips only `dist2 > radius2`)
                cand = cand[(d * d).sum(-1) <= r2]
            if cand.size == 0:
                idx[m, 0] = -1
                continue
            take = cand[:nsample].astype(np.int32)
            idx[m, :] = take[0]
            idx[m, :take.size] = take
        empty = idx[:, 0] == -1
        idx[empty] = 0
        return torch.from_numpy(idx), torch.from_numpy(empty)

    vq.voxel_query = t_voxel_query


class _FakeSparseTensorV(_FakeSparseTensor):
    """adds the fields ``generate_voxel2pinds`` reads."""

    def __init__(self, indices, features, spatial_shape, batch_size=1):
        super().__init__(indices, features)
        self.spatial_shape = list(spatial_shape)
        self.batch_size = batch_size


def _synthetic_intermediates(seed=0):
    """Synthetic post-backbone state on the voxel_rcnn_car geometry
    (pcr [0,-40,-3,70.4,40,1], voxel [.05,.05,.1], BEV stride 8). Voxels
    are kept sparse (48/level over the full grid) so no query ball
    overflows NSAMPLE=16 — set-equality regime for the two query styles."""
    rng = np.random.default_rng(seed)
    level_grids = {'x_conv2': (21, 800, 704), 'x_conv3': (11, 400, 352),
                   'x_conv4': (6, 200, 176)}
    chans = {'x_conv2': 32, 'x_conv3': 64, 'x_conv4': 64}
    levels = {}
    for name, g in level_grids.items():
        M = 48
        coords = np.unique(np.stack(
            [rng.integers(0, gd, M) for gd in g], axis=1), axis=0)
        feats = rng.normal(size=(len(coords), chans[name])).astype(np.float32)
        levels[name] = (coords.astype(np.int64), feats, g)
    bev = rng.normal(size=(1, 200, 176, 256)).astype(np.float32)   # NHWC
    return levels, bev


@pytest.mark.slow
def test_voxelrcnn_two_stage_forward_parity():
    from tests.reference_loader import build_reference_detector

    cfg = _load_cfg()
    torch.manual_seed(0)   # ref init uses torch's global rng
    ref = build_reference_detector('voxel_rcnn', 'VoxelRCNN',
                                   _load_cfg().MODEL,
                                   class_names=('Car',)).eval()
    _patch_stack_ops()
    _patch_voxel_query()
    with torch.no_grad():                     # non-identity BN everywhere
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.weight.copy_(torch.rand_like(m.weight) + 0.5)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)

    params, stats, unmapped = ci.convert_reference_state_dict(
        ref.state_dict())
    assert not unmapped, unmapped

    levels, bev = _synthetic_intermediates()

    # ---- reference: manual module chain on the synthetic state ----
    bd = {
        'batch_size': 1,
        'multi_scale_3d_features': {
            name: _FakeSparseTensorV(
                torch.from_numpy(np.concatenate(
                    [np.zeros((len(c), 1), np.int64), c], axis=1).astype(
                        np.int32)),
                torch.from_numpy(f), g)
            for name, (c, f, g) in levels.items()},
        'multi_scale_3d_strides': {'x_conv1': 1, 'x_conv2': 2,
                                   'x_conv3': 4, 'x_conv4': 8},
        'spatial_features': torch.from_numpy(
            np.ascontiguousarray(bev.transpose(0, 3, 1, 2))),
        'spatial_features_stride': 8,
    }
    with torch.no_grad():
        bd = ref.backbone_2d(bd)
        bd = ref.dense_head(bd)
        bd = ref.roi_head(bd)
    ref_boxes = bd['batch_box_preds'][0].numpy()
    ref_cls = bd['batch_cls_preds'][0].numpy().reshape(-1)
    ref_rois = bd['rois'][0].numpy()

    # ---- ours: bound submodule chain on the same state ----
    model = build_detector_from_cfg(cfg)
    coord_keys = {'x_conv2': 'down2_coords', 'x_conv3': 'down3_coords',
                  'x_conv4': 'down4_coords'}
    batch = {
        'spatial_features': jnp.asarray(bev),
        'multi_scale_3d_features': {
            name: jnp.asarray(f)[None] for name, (c, f, g) in levels.items()},
    }
    for name, (c, f, g) in levels.items():
        batch[coord_keys[name]] = jnp.asarray(c)[None]
        batch[coord_keys[name].replace('coords', 'valid')] = \
            jnp.ones((1, len(c)), bool)

    def chain(m, b):
        out = dict(b)
        out = m.backbone_2d(out, train=False)
        out = m.dense_head(out, train=False)
        out = m.roi_head(out, train=False)
        return out

    variables = model.init(jax.random.PRNGKey(0), batch, method=chain)
    keep = set(variables['params'].keys())
    params = {k: v for k, v in params.items() if k in keep}
    stats = {k: v for k, v in stats.items() if k in keep}
    merged = ci.merge_into_variables(variables, params, stats,
                                     strict_shapes=True)
    out = model.apply(merged, batch, method=chain)

    # --- proposals after NMS
    our_rois = np.asarray(out['roi_head_ret']['rois'][0])
    n = min(len(ref_rois), len(our_rois))
    np.testing.assert_allclose(our_rois[:n, :7], ref_rois[:n, :7], atol=1e-3)

    # --- final refined boxes + rcnn scores (the voxel-query pool path)
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
