"""Composed CenterPoint (nuScenes CBGS pillar config) forward parity vs the
reference's own torch modules: BaseBEVBackbone -> multi-group CenterHead
with the velocity branch -> per-head decode -> class-agnostic NMS.

Both sides consume the SAME synthetic BEV features (the dynamic pillar VFE
needs torch_scatter, absent on CPU — and the comparison target is the
decode protocol, which AVE/NDS on nuScenes depend on). Pins:
- the upstream decode (``centernet_utils.decode_bbox_from_heatmap``): top
  MAX_OBJ_PER_SAMPLE over (pixel, class), dim.exp, atan2 rot, velocity
  gather, post-center-range + score threshold masks, class_agnostic_nms;
- the CenterHead-family checkpoint import (shared_conv + per-group
  SeparateHead stacks with nested Sequential keys).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from spsnet_tpu.config import EDict, cfg_from_yaml_file
from spsnet_tpu.models.detectors import build_detector_from_cfg
from spsnet_tpu.utils import checkpoint_import as ci

REPO = '/root/repo'


def _load_cfg():
    cfg = EDict()
    cfg_from_yaml_file(
        f'{REPO}/tools/cfgs/nuscenes_models/cbgs_dyn_pp_centerpoint.yaml',
        cfg)
    # activation knob, applied to BOTH sides: keep only well-separated
    # peaks so the candidate set isn't an fp32-chaotic near-tie band
    # (the head's decode reads DENSE_HEAD.POST_PROCESSING)
    cfg.MODEL.DENSE_HEAD.POST_PROCESSING.SCORE_THRESH = 0.3
    return cfg


def _nusc_dataset(class_names):
    from tests.reference_loader import _fake_dataset
    ds = _fake_dataset(class_names, 5)
    ds.point_cloud_range = np.array([-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
                                    np.float32)
    ds.voxel_size = [0.2, 0.2, 8.0]
    ds.grid_size = np.array([512, 512, 1])
    return ds


def test_centerpoint_decode_forward_parity():
    from tests.reference_loader import build_reference_detector
    from tests.test_pvrcnn_forward_parity import _patch_stack_ops

    torch.manual_seed(1)   # seeds 0/3 give 0/2 dets; 1 gives ~200
    cfg = _load_cfg()
    ref = build_reference_detector(
        'centerpoint', 'CenterPoint', _load_cfg().MODEL,
        class_names=list(cfg.CLASS_NAMES), num_point_features=5,
        dataset=_nusc_dataset(list(cfg.CLASS_NAMES))).eval()
    _patch_stack_ops()                       # provides the nms_gpu twin
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.weight.copy_(torch.rand_like(m.weight) + 0.5)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    with torch.no_grad():
        # hm's default -2.19 bias puts sigmoid right AT the 0.1 score
        # threshold, and random 3x3 convs give a logit spread of only
        # ~0.06 — every pixel a near-tie, candidate sets fp32-chaotic.
        # Widen the logit spread and lower the floor so peaks are sparse
        # and well separated (score range ~[0.16, 0.82]).
        for head in ref.dense_head.heads_list:
            head.hm[-1].weight.mul_(40.0)
            head.hm[-1].bias.fill_(-3.5)
    state = {k: v for k, v in ref.state_dict().items()
             if not k.startswith('vfe.')}     # dyn-VFE stays out of scope
    params, stats, unmapped = ci.convert_reference_state_dict(state)
    assert not unmapped, unmapped[:5]

    rng = np.random.default_rng(3)
    C_bev = int(cfg.MODEL.MAP_TO_BEV.NUM_BEV_FEATURES)
    H = W = 128                              # activation-size knob (the
    # head map must hold >= MAX_OBJ_PER_SAMPLE=500 entries per class)
    bev = rng.normal(size=(1, H, W, C_bev)).astype(np.float32)

    bd = {'batch_size': 1,
          'spatial_features': torch.from_numpy(
              np.ascontiguousarray(bev.transpose(0, 3, 1, 2)))}
    with torch.no_grad():
        bd = ref.backbone_2d(bd)
        bd = ref.dense_head(bd)
    ref_final = bd['final_box_dicts'][0]
    ref_boxes = ref_final['pred_boxes'].numpy()          # (N, 9) with vel
    ref_scores = ref_final['pred_scores'].numpy()
    ref_labels = ref_final['pred_labels'].numpy()

    model = build_detector_from_cfg(cfg)
    batch = {'spatial_features': jnp.asarray(bev)}

    def chain(m, b):
        out = dict(b)
        out = m.backbone_2d(out, train=False)
        out = m.dense_head(out, train=False)
        return out

    variables = model.init(jax.random.PRNGKey(0), batch, method=chain)
    keep = set(variables['params'].keys())
    params = {k: v for k, v in params.items() if k in keep}
    stats = {k: v for k, v in stats.items() if k in keep}
    merged = ci.merge_into_variables(variables, params, stats,
                                     strict_shapes=True)
    out = model.apply(merged, batch, method=chain)

    valid = np.asarray(out['final_valid'][0])
    our_boxes = np.asarray(out['final_boxes'][0])[valid]
    our_scores = np.asarray(out['final_scores'][0])[valid]
    our_labels = np.asarray(out['final_labels'][0])[valid]

    # With hundreds of random peaks, single NMS keep/suppress flips at
    # fp32-tied IoU boundaries are expected (the 40x hm scale amplifies
    # torch-vs-XLA conv accumulation noise). Compare as matched SETS plus
    # a strict score-sorted head.
    assert len(ref_scores) > 50                   # non-vacuous regime
    assert abs(len(our_scores) - len(ref_scores)) <= \
        max(2, len(ref_scores) // 25), (len(our_scores), len(ref_scores))

    def match_rate(a_boxes, a_scores, a_labels, b_boxes, b_scores, b_labels):
        matched = 0
        for i in range(len(a_boxes)):
            d = np.linalg.norm(b_boxes[:, :3] - a_boxes[i, :3], axis=-1)
            ok = (d < 0.5) & (b_labels == a_labels[i]) & \
                (np.abs(b_scores - a_scores[i]) < 3e-3)
            matched += bool(ok.any())
        return matched / max(len(a_boxes), 1)

    # both sides emit 1-based global class ids (verified identical
    # histograms; the reference's own eval consumes them as 1-based)
    assert match_rate(our_boxes, our_scores, our_labels,
                      ref_boxes, ref_scores, ref_labels) > 0.98
    assert match_rate(ref_boxes, ref_scores, ref_labels,
                      our_boxes, our_scores, our_labels) > 0.98

    # strict per-detection check on our top 50: every one must have a ref
    # twin agreeing on ALL 9 box dims (incl. velocity), score, and label
    # (positional sort-pairing is not usable: near-tied scores reorder)
    oo = np.argsort(-our_scores, kind='stable')[:50]
    for i in oo:
        d = np.abs(ref_boxes - our_boxes[i]).max(axis=1)
        j = int(np.argmin(d))
        assert d[j] < 0.02, (i, d[j])            # meters / rad / m/s
        assert abs(ref_scores[j] - our_scores[i]) < 2e-3
        assert ref_labels[j] == our_labels[i]
    assert our_boxes.shape[1] == 9               # velocity decoded
