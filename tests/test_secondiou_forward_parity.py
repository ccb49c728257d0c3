"""Composed SECOND-IoU forward parity vs the reference's own torch modules
(``base_bev_backbone.py`` -> ``anchor_head_single.py`` ->
``second_head.py`` -> ``second_net_iou.py:post_processing``).

The spconv backbone cannot execute on CPU, so BOTH models consume the SAME
synthetic BEV map and the comparison isolates everything downstream: the
anchor RPN decode, proposal NMS ordered by raw logits, the affine_grid +
grid_sample RoI BEV pooling (legacy size-1 theta normalization,
align_corners=False, zero padding), the shared/iou FC stacks, and — the
part unique to this detector — the IoU-rescoring post-processing with every
``SCORE_TYPE`` route (iou / cls / weighted_iou_cls / num_pts_iou_cls /
score_by_class, ``second_net_iou.py:76-180``).

``points_in_boxes_cpu`` (the num_pts route) is patched with a numpy twin of
``check_pt_in_box3d_cpu`` (``roiaware_pool3d.cpp:128-141``: inclusive z
test, MARGIN=1e-2 xy test, a point counts in EVERY containing box); rotated
NMS reuses the PV-RCNN test's twin.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from spsnet_tpu.config import EDict, cfg_from_yaml_file
from spsnet_tpu.models.detectors import build_detector_from_cfg
from spsnet_tpu.models.detectors.detector3d import post_processing
from spsnet_tpu.utils import checkpoint_import as ci
from tests.test_pvrcnn_forward_parity import _patch_stack_ops

REPO = '/root/repo'


def _load_cfg():
    cfg = EDict()
    cfg_from_yaml_file(f'{REPO}/tools/cfgs/kitti_models/second_iou.yaml', cfg)
    # activation-size knobs only, applied to BOTH models identically
    for phase in ('TRAIN', 'TEST'):
        cfg.MODEL.ROI_HEAD.NMS_CONFIG[phase].NMS_PRE_MAXSIZE = 64
        cfg.MODEL.ROI_HEAD.NMS_CONFIG[phase].NMS_POST_MAXSIZE = 16
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = 16
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = 8
    return cfg


def _patch_points_in_boxes_cpu():
    import importlib
    ra = importlib.import_module(
        'pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils')

    def t_points_in_boxes_cpu(points, boxes):
        p = points.detach().numpy()          # (N, 3)
        b = boxes.detach().numpy()           # (T, 7)
        shift = p[None, :, :] - b[:, None, 0:3]          # (T, N, 3)
        cosa = np.cos(-b[:, 6])[:, None]
        sina = np.sin(-b[:, 6])[:, None]
        lx = shift[..., 0] * cosa - shift[..., 1] * sina
        ly = shift[..., 0] * sina + shift[..., 1] * cosa
        m = 1e-2                                          # CPU MARGIN
        inside = ((np.abs(shift[..., 2]) <= b[:, None, 5] / 2.0)
                  & (np.abs(lx) < b[:, None, 3] / 2.0 + m)
                  & (np.abs(ly) < b[:, None, 4] / 2.0 + m))
        return torch.from_numpy(inside.astype(np.int32))

    ra.points_in_boxes_cpu = t_points_in_boxes_cpu


def _dataset_cfg():
    """The slice of dataset_cfg ``SECONDHead.roi_grid_pool`` reads
    (``second_head.py:68-73``)."""
    ds = EDict()
    ds.POINT_CLOUD_RANGE = [0, -40, -3, 70.4, 40, 1]
    proc = EDict()
    proc.NAME = 'transform_points_to_voxels'
    proc.VOXEL_SIZE = [0.05, 0.05, 0.1]
    ds.DATA_PROCESSOR = [proc]
    return ds


def _synthetic_points(rng, boxes, n_free=96, n_inbox=64):
    """Points with a guaranteed population inside the proposal boxes so the
    num_pts route exercises all three alpha branches."""
    pts = np.zeros((n_free + n_inbox, 3), np.float32)
    pts[:n_free, 0] = rng.uniform(1, 69, n_free)
    pts[:n_free, 1] = rng.uniform(-39, 39, n_free)
    pts[:n_free, 2] = rng.uniform(-2.5, 0.5, n_free)
    k = max(len(boxes), 1)
    for i in range(n_inbox):
        b = boxes[i % k]
        local = rng.uniform(-0.4, 0.4, 3) * b[3:6]
        c, s = np.cos(b[6]), np.sin(b[6])
        pts[n_free + i, 0] = b[0] + local[0] * c - local[1] * s
        pts[n_free + i, 1] = b[1] + local[0] * s + local[1] * c
        pts[n_free + i, 2] = b[2] + local[2]
    return pts


def _ref_post(ref, bd, post_cfg):
    """Run the reference's SECONDNetIoU.post_processing under a given
    POST_PROCESSING cfg (restores the original afterwards)."""
    saved = ref.model_cfg.POST_PROCESSING
    ref.model_cfg.POST_PROCESSING = post_cfg
    try:
        with torch.no_grad():
            pred_dicts, _ = ref.post_processing(dict(bd))
    finally:
        ref.model_cfg.POST_PROCESSING = saved
    return pred_dicts[0]


def _compare_dets(ref_pred, our_dets, atol=2e-3):
    n_ref = len(ref_pred['pred_boxes'])
    n_our = int(np.asarray(our_dets['count'][0]))
    assert n_our == n_ref, (n_our, n_ref)
    if n_ref == 0:
        return
    rb = ref_pred['pred_boxes'].numpy()
    ob = np.asarray(our_dets['boxes'][0][:n_ref])
    np.testing.assert_allclose(ob[:, :6], rb[:, :6], atol=atol)
    ang = np.abs(np.angle(np.exp(1j * (ob[:, 6] - rb[:, 6]))))
    assert ang.max() < atol
    np.testing.assert_allclose(
        np.asarray(our_dets['scores'][0][:n_ref]),
        ref_pred['pred_scores'].numpy(), atol=atol)
    np.testing.assert_array_equal(
        np.asarray(our_dets['labels'][0][:n_ref]),
        ref_pred['pred_labels'].numpy())
    np.testing.assert_allclose(
        np.asarray(our_dets['cls_scores'][0][:n_ref]),
        ref_pred['pred_cls_scores'].numpy(), atol=atol)
    np.testing.assert_allclose(
        np.asarray(our_dets['iou_scores'][0][:n_ref]),
        ref_pred['pred_iou_scores'].numpy(), atol=atol)


@pytest.mark.slow
def test_secondiou_forward_parity():
    from tests.reference_loader import build_reference_detector

    cfg = _load_cfg()
    torch.manual_seed(0)   # ref init uses torch's global rng
    ref = build_reference_detector('second_net_iou', 'SECONDNetIoU',
                                   _load_cfg().MODEL).eval()
    _patch_stack_ops()
    _patch_points_in_boxes_cpu()
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

    rng = np.random.default_rng(0)
    bev = rng.normal(size=(1, 200, 176, 256)).astype(np.float32)   # NHWC

    # ---- reference: manual module chain on the synthetic BEV state ----
    bd = {
        'batch_size': 1,
        'dataset_cfg': _dataset_cfg(),
        'spatial_features': torch.from_numpy(
            np.ascontiguousarray(bev.transpose(0, 3, 1, 2))),
        'spatial_features_stride': 8,
    }
    with torch.no_grad():
        bd = ref.backbone_2d(bd)
        bd = ref.dense_head(bd)
        bd = ref.roi_head(bd)
    ref_rois = bd['rois'][0].numpy()
    ref_iou = bd['batch_cls_preds'][0].numpy().reshape(-1)
    ref_roi_scores = bd['roi_scores'][0].numpy()
    assert bd['has_class_labels']          # 3-class RPN -> roi_labels used
    pts = _synthetic_points(rng, ref_rois)
    bd['points'] = torch.from_numpy(np.concatenate(
        [np.zeros((len(pts), 1), np.float32), pts], axis=1))

    # ---- ours: bound submodule chain on the same state ----
    model = build_detector_from_cfg(cfg)
    batch = {'spatial_features': jnp.asarray(bev)}

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

    # --- proposals after logit-ordered NMS (batch_box_preds == rois)
    our_rois = np.asarray(out['batch_box_preds'][0])
    n = min(len(ref_rois), len(our_rois))
    assert n > 0
    np.testing.assert_allclose(our_rois[:n, :7], ref_rois[:n, :7], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out['batch_roi_scores'][0][:n]),
                               ref_roi_scores[:n], atol=1e-3)

    # --- the IoU logits after affine-grid pooling + FC stacks
    our_iou = np.asarray(out['batch_cls_preds'][0]).reshape(-1)
    assert np.abs(our_iou[:n] - ref_iou[:n]).max() < 2e-3, \
        np.abs(our_iou[:n] - ref_iou[:n]).max()
    assert out['iou_rescoring'] and out['has_class_labels']

    # --- every SCORE_TYPE route through the rescoring post-processing
    out['points'] = jnp.asarray(pts)[None]
    class_names = list(cfg.CLASS_NAMES)

    def post_variant(**nms_overrides):
        pc = EDict()
        for k, v in cfg.MODEL.POST_PROCESSING.items():
            pc[k] = v
        nc = EDict()
        for k, v in cfg.MODEL.POST_PROCESSING.NMS_CONFIG.items():
            nc[k] = v
        for k, v in nms_overrides.items():
            nc[k] = v
        pc.NMS_CONFIG = nc
        return pc

    variants = [post_variant()]                              # default: iou
    variants.append(post_variant(SCORE_TYPE='cls'))
    w = EDict(); w.iou = 0.7; w.cls = 0.3
    variants.append(post_variant(SCORE_TYPE='weighted_iou_cls',
                                 SCORE_WEIGHTS=w))
    th = EDict(); th.cls = 4; th.iou = 20
    variants.append(post_variant(SCORE_TYPE='num_pts_iou_cls',
                                 SCORE_THRESH=th))
    by_cls = {'Car': 'iou', 'Pedestrian': 'cls', 'Cyclist': 'iou'}
    variants.append(post_variant(SCORE_TYPE='score_by_class',
                                 SCORE_BY_CLASS=by_cls))

    for pc in variants:
        ref_pred = _ref_post(ref, bd, pc)
        our_dets = post_processing(dict(out), pc, class_names=class_names)
        _compare_dets(ref_pred, our_dets)


@pytest.mark.slow
def test_score_by_class_unique_label_quirk():
    """``set_nms_score_by_class`` (second_net_iou.py:59-73) loops only over
    the COUNT of unique label values — labels above that count keep
    nms_score 0 (e.g. surviving labels {1,3}: class-3 boxes are zeroed and
    score-thresholded away), and zero-padded roi slots inflate the count by
    one. Our port replicates this exactly; verified against the reference's
    own post_processing on crafted label patterns."""
    from tests.reference_loader import build_reference_detector

    cfg = _load_cfg()
    torch.manual_seed(0)
    ref = build_reference_detector('second_net_iou', 'SECONDNetIoU',
                                   _load_cfg().MODEL).eval()
    _patch_stack_ops()

    pc = EDict()
    for k, v in cfg.MODEL.POST_PROCESSING.items():
        pc[k] = v
    nc = EDict()
    for k, v in cfg.MODEL.POST_PROCESSING.NMS_CONFIG.items():
        nc[k] = v
    nc.SCORE_TYPE = 'score_by_class'
    nc.SCORE_BY_CLASS = {'Car': 'iou', 'Pedestrian': 'cls', 'Cyclist': 'iou'}
    pc.NMS_CONFIG = nc

    rng = np.random.default_rng(3)
    R = 12
    boxes = np.zeros((R, 7), np.float32)
    boxes[:, 0] = rng.uniform(5, 60, R)
    boxes[:, 1] = rng.uniform(-30, 30, R)
    boxes[:, 2] = rng.uniform(-1.5, 0.0, R)
    boxes[:, 3:6] = rng.uniform(1.0, 4.0, (R, 3)).astype(np.float32)
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, R)
    iou_logits = rng.normal(size=(R, 1)).astype(np.float32) + 1.0
    roi_scores = rng.normal(size=(R,)).astype(np.float32) + 1.0

    patterns = [
        [1, 3],        # class 2 absent, no padding -> class-3 boxes zeroed
        [0, 1, 3],     # padding slot inflates n_unique -> class 3 routed
        [2, 3],        # n_unique=2 -> class-3 boxes zeroed, class 2 routed
        [1, 2, 3],     # contiguous: plain per-class routing
    ]
    for pat in patterns:
        labels = np.asarray([pat[i % len(pat)] for i in range(R)], np.int64)
        bd = {
            'batch_size': 1,
            'batch_cls_preds': torch.from_numpy(iou_logits[None]),
            'batch_box_preds': torch.from_numpy(boxes[None]),
            'roi_scores': torch.from_numpy(roi_scores[None]),
            'roi_labels': torch.from_numpy(labels[None]),
            'cls_preds_normalized': False,
            'has_class_labels': True,
        }
        ref_pred = _ref_post(ref, bd, pc)
        out = {
            'batch_cls_preds': jnp.asarray(iou_logits)[None],
            'batch_box_preds': jnp.asarray(boxes)[None],
            'batch_roi_scores': jnp.asarray(roi_scores)[None],
            'batch_roi_labels': jnp.asarray(labels.astype(np.int32))[None],
            'cls_preds_normalized': False,
            'has_class_labels': True,
            'iou_rescoring': True,
        }
        our_dets = post_processing(out, pc,
                                   class_names=list(cfg.CLASS_NAMES))
        _compare_dets(ref_pred, our_dets)
