"""WHOLE-LOSS parity for the flagship: our `iassd_head_loss` vs the
reference's own `IASSD_Head.get_loss` (instantiated on CPU torch, CUDA
points-in-boxes patched with our bit-parity first-hit kernel).

Both sides consume the SAME synthetic forward outputs and gt boxes; targets
are assigned by each side's own assignment path (already cross-verified in
test_reference_parity). A matching total loss pins the entire training
objective — vote loss, SA instance loss with centerness masking, center cls
loss, bin-orientation box loss (incl. the reference's mean-times-sum
quirk), and corner loss — so gradients agree up to autodiff.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

from tests.reference_loader import (  # noqa: E402
    REFERENCE_ROOT, load_reference_pcdet)

load_reference_pcdet()

import importlib  # noqa: E402
import sys  # noqa: E402
import types  # noqa: E402

for _pkg, _path in [
    ('pcdet.models', f'{REFERENCE_ROOT}/pcdet/models'),
    ('pcdet.models.dense_heads', f'{REFERENCE_ROOT}/pcdet/models/dense_heads'),
    ('pcdet.models.model_utils', f'{REFERENCE_ROOT}/pcdet/models/model_utils'),
]:
    _mod = sys.modules.setdefault(_pkg, types.ModuleType(_pkg))
    _mod.__path__ = [_path]

ref_head_mod = importlib.import_module('pcdet.models.dense_heads.IASSD_head')

import jax.numpy as jnp  # noqa: E402

from spsnet_tpu.config import EDict  # noqa: E402
from spsnet_tpu.data.processor.data_processor import (  # noqa: E402
    points_first_box_np)
from spsnet_tpu.models.dense_heads import target_assign  # noqa: E402
from spsnet_tpu.models.dense_heads.iassd_head import iassd_head_loss  # noqa: E402
from spsnet_tpu.utils import box_coder as our_coders  # noqa: E402
from spsnet_tpu.utils import box_utils as our_box_utils  # noqa: E402


def _pib_gpu(points_t, boxes_t):
    out = points_first_box_np(points_t[0].numpy(), boxes_t[0].numpy())
    return torch.from_numpy(out[None]).long()


MEAN_SIZE = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]
SAMPLE_METHODS = [['D-FPS'], ['D-FPS'], ['ctr_aware'], ['D-FPS']]


def _head_cfg(vote_type='none'):
    return EDict({
        'CLS_FC': [16], 'REG_FC': [16],
        'CLASS_AGNOSTIC': False,
        'TARGET_CONFIG': {
            'INS_AWARE_ASSIGN': True,
            'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2],
            'BOX_CODER': 'PointResidual_BinOri_Coder',
            'BOX_CODER_CONFIG': {
                'angle_bin_num': 12, 'use_mean_size': True,
                'mean_size': MEAN_SIZE,
            },
            'ASSIGN_METHOD': {
                'NAME': 'extend_gt', 'ASSIGN_TYPE': 'centers_origin',
                'EXTRA_WIDTH': [1.0, 1.0, 1.0], 'FG_PC_IGNORE': False,
            },
        },
        'LOSS_CONFIG': {
            'LOSS_CLS': 'WeightedCrossEntropy',
            'LOSS_REG': 'WeightedSmoothL1Loss',
            'LOSS_INS': 'WeightedCrossEntropy',
            'SAMPLE_METHOD_LIST': SAMPLE_METHODS,
            'LOSS_VOTE_TYPE': vote_type,
            'CORNER_LOSS_REGULARIZATION': True,
            'CENTERNESS_REGULARIZATION': True,
            'CENTERNESS_REGULARIZATION_SA': True,
            'IOU3D_REGULARIZATION': False,
            'LOSS_WEIGHTS': {
                'ins_aware_weight': [0, 1.0, 1.0],
                'vote_weight': 1.0, 'point_cls_weight': 1.0,
                'point_box_weight': 1.0, 'corner_weight': 1.0,
                'code_weights': [1.0] * 6, 'dir_weight': 0.2,
            },
        },
    })


def _fixture(rng, B=2, M=400, levels=(200, 100)):
    """Scene points with in-box clusters at three resolutions + gt boxes."""
    T = 8
    gt = np.zeros((B, T, 8), dtype=np.float32)
    sizes = np.asarray(MEAN_SIZE, np.float32)
    for b in range(B):
        n = 6 if b == 0 else 4
        cls = rng.integers(1, 4, n)
        gt[b, :n, 0] = rng.uniform(5, 60, n)
        gt[b, :n, 1] = rng.uniform(-25, 25, n)
        gt[b, :n, 2] = rng.uniform(-1.2, -0.5, n)
        gt[b, :n, 3:6] = sizes[cls - 1] * rng.uniform(0.9, 1.1, (n, 3))
        gt[b, :n, 6] = rng.uniform(-np.pi, np.pi, n)
        gt[b, :n, 7] = cls

    def cloud(m):
        pts = np.zeros((B, m, 3), dtype=np.float32)
        pts[..., 0] = rng.uniform(0, 70, (B, m))
        pts[..., 1] = rng.uniform(-40, 40, (B, m))
        pts[..., 2] = rng.uniform(-2.5, 1, (B, m))
        for b in range(B):
            for i in range(T):
                if gt[b, i, 3] <= 0:
                    continue
                k = max(4, m // 40)
                local = rng.uniform(-0.45, 0.45, (k, 3)) * gt[b, i, 3:6]
                c, s = np.cos(gt[b, i, 6]), np.sin(gt[b, i, 6])
                world = np.stack([
                    local[:, 0] * c - local[:, 1] * s + gt[b, i, 0],
                    local[:, 0] * s + local[:, 1] * c + gt[b, i, 1],
                    local[:, 2] + gt[b, i, 2]], 1)
                pts[b, rng.integers(0, m, k)] = world
        return pts

    centers_origin = cloud(M)
    ctr_offsets = rng.normal(0, 0.3, (B, M, 3)).astype(np.float32)
    centers = centers_origin + ctr_offsets
    # encoder levels 1..3; sa_ins_preds[i] sits on encoder_coords[i+1]
    # (layer i's confidence logits are computed on its OUTPUT points)
    enc1, enc2, enc3 = cloud(levels[0]), cloud(levels[1]), cloud(levels[0])
    preds1 = rng.normal(0, 1, (B, levels[1], 4)).astype(np.float32)  # on enc2
    preds2 = rng.normal(0, 1, (B, levels[0], 4)).astype(np.float32)  # on enc3
    cls_preds = rng.normal(0, 1, (B, M, 3)).astype(np.float32)
    box_preds = rng.normal(0, 1, (B, M, 30)).astype(np.float32)
    return (gt, centers, centers_origin, ctr_offsets, enc1, enc2, enc3,
            preds1, preds2, cls_preds, box_preds)


def _stack(a):
    """(B, M, C) -> (B*M, 1+C) with leading bs column (reference layout)."""
    B, M = a.shape[:2]
    bs = np.repeat(np.arange(B, dtype=np.float32), M)[:, None]
    return np.concatenate([bs, a.reshape(B * M, -1)], axis=1)


@pytest.mark.parametrize('vote_type', ['none', 'ver1', 'ver2'])
def test_iassd_total_loss_matches_reference(vote_type):
    import pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils as ref_pib
    ref_pib.points_in_boxes_gpu = _pib_gpu

    rng = np.random.default_rng(11)
    (gt, centers, centers_origin, ctr_offsets, enc1, enc2, enc3,
     preds1, preds2, cls_preds, box_preds) = _fixture(rng)
    B, M = centers.shape[:2]
    cfg = _head_cfg(vote_type)

    # ---- reference side: instantiate the real head, drive assign+loss ----
    head = ref_head_mod.IASSD_Head(num_class=3, input_channels=16,
                                   model_cfg=cfg,
                                   predict_boxes_when_training=True)
    head.train()
    t = torch.tensor
    input_dict = {
        'batch_size': B,
        'gt_boxes': t(gt),
        'centers': t(_stack(centers)),
        'centers_origin': t(_stack(centers_origin)),
        'ctr_offsets': t(_stack(ctr_offsets)),
        'sa_ins_preds': [[], t(preds1), t(preds2), []],
        'encoder_coords': [t(_stack(centers)).view(B, M, 4),
                           t(_stack(enc1)).view(B, enc1.shape[1], 4),
                           t(_stack(enc2)).view(B, enc2.shape[1], 4),
                           t(_stack(enc3)).view(B, enc3.shape[1], 4)],
    }
    targets = head.assign_targets(input_dict)
    ret = {
        'center_cls_preds': t(cls_preds.reshape(-1, 3)),
        'center_box_preds': t(box_preds.reshape(-1, 30)),
        'ctr_offsets': input_dict['ctr_offsets'],
        'centers': input_dict['centers'],
        'centers_origin': input_dict['centers_origin'],
        'sa_ins_preds': input_dict['sa_ins_preds'],
    }
    ret.update(targets)
    point_cls, point_box = head.generate_predicted_boxes(
        points=input_dict['centers'][:, 1:4],
        point_cls_preds=ret['center_cls_preds'],
        point_box_preds=ret['center_box_preds'])
    ret['point_box_preds'] = point_box
    head.forward_ret_dict = ret
    ref_loss, ref_tb = head.get_loss()

    # ---- our side: dense assignment + pure-jnp loss on the same inputs ----
    our_coder = our_coders.build_box_coder(
        'PointResidual_BinOri_Coder', angle_bin_num=12,
        use_mean_size=True, mean_size=MEAN_SIZE)
    gt_j = jnp.asarray(gt)
    ext_main = our_box_utils.enlarge_box3d(gt_j, [0.2, 0.2, 0.2])
    ct = target_assign.assign_targets_iassd(
        jnp.asarray(centers), gt_j, ext_main,
        set_ignore_flag=True, ret_box_labels=True,
        box_coder=our_coder, num_class=3)
    ext_05 = our_box_utils.enlarge_box3d(gt_j, [0.5, 0.5, 0.5])
    # mirror our head's assign: sa_targets[i] from encoder_xyz[i+1];
    # entry 0 pairs with enc1 but preds[0] is None so it's unused
    sa_targets = []
    for i, xyz in enumerate([enc1, enc2, enc3]):
        sa_targets.append(target_assign.assign_targets_iassd(
            jnp.asarray(xyz), gt_j, ext_05,
            set_ignore_flag=(i == 0), use_ex_gt_assign=(i != 0),
            box_coder=our_coder, num_class=3))
    sa_targets.append(None)
    ext_vote = our_box_utils.enlarge_box3d(gt_j, [1.0, 1.0, 1.0])
    cot = target_assign.assign_targets_iassd(
        jnp.asarray(centers_origin), gt_j, ext_vote,
        set_ignore_flag=True, use_ex_gt_assign=True, fg_pc_ignore=False,
        ret_box_labels=True, box_coder=our_coder, num_class=3)

    pred_classes = jnp.argmax(jnp.asarray(cls_preds), axis=-1) + 1
    point_box_preds = our_coder.decode(
        jnp.asarray(box_preds), jnp.asarray(centers),
        pred_classes=pred_classes)

    our_ret = {
        'center_cls_preds': jnp.asarray(cls_preds),
        'center_box_preds': jnp.asarray(box_preds),
        'ctr_offsets': jnp.asarray(ctr_offsets),
        'centers': jnp.asarray(centers),
        'centers_origin': jnp.asarray(centers_origin),
        'sa_ins_preds': [None, jnp.asarray(preds1[..., 1:]),
                         jnp.asarray(preds2[..., 1:]), None],
        'encoder_xyz': [jnp.asarray(centers), jnp.asarray(enc1),
                        jnp.asarray(enc2), jnp.asarray(enc3)],
        'center_targets': ct,
        'sa_targets': sa_targets,
        'center_origin_targets': cot,
        'point_box_preds': point_box_preds,
    }
    our_loss, our_tb = iassd_head_loss(
        our_ret, cfg.LOSS_CONFIG, num_class=3, box_coder=our_coder,
        sa_centerness_mask=True, sample_method_list=SAMPLE_METHODS)

    # per-component comparison first (better failure localization)
    for ref_k, our_k in [('center_loss_cls', 'center_loss_cls'),
                         ('center_loss_box', 'center_loss_box'),
                         ('corner_loss_reg', 'corner_loss_reg'),
                         ('sa_loss_ins', 'sa_loss_ins')]:
        assert float(our_tb[our_k]) == pytest.approx(
            float(ref_tb[ref_k]), rel=2e-4, abs=1e-5), (ref_k, ref_tb)
    assert float(our_loss) == pytest.approx(float(ref_loss),
                                            rel=2e-4, abs=1e-5)


def test_mlt_ssd_total_loss_matches_reference():
    """SPSNet's head (MLT_SSD_Head: IASSD_Head with the SA centerness mask
    commented out — verified byte-twin diff) vs our sa_centerness_mask=False
    flag, same harness as above."""
    mlt_mod = importlib.import_module('pcdet.models.dense_heads.MLT_SSD_head')
    import pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils as ref_pib
    ref_pib.points_in_boxes_gpu = _pib_gpu

    rng = np.random.default_rng(12)
    (gt, centers, centers_origin, ctr_offsets, enc1, enc2, enc3,
     preds1, preds2, cls_preds, box_preds) = _fixture(rng)
    B, M = centers.shape[:2]
    cfg = _head_cfg('none')

    head = mlt_mod.MLT_SSD_Head(num_class=3, input_channels=16,
                                model_cfg=cfg,
                                predict_boxes_when_training=True)
    head.train()
    t = torch.tensor
    input_dict = {
        'batch_size': B,
        'gt_boxes': t(gt),
        'centers': t(_stack(centers)),
        'centers_origin': t(_stack(centers_origin)),
        'ctr_offsets': t(_stack(ctr_offsets)),
        'sa_ins_preds': [[], t(preds1), t(preds2), []],
        'encoder_coords': [t(_stack(centers)).view(B, M, 4),
                           t(_stack(enc1)).view(B, enc1.shape[1], 4),
                           t(_stack(enc2)).view(B, enc2.shape[1], 4),
                           t(_stack(enc3)).view(B, enc3.shape[1], 4)],
    }
    targets = head.assign_targets(input_dict)
    ret = {
        'center_cls_preds': t(cls_preds.reshape(-1, 3)),
        'center_box_preds': t(box_preds.reshape(-1, 30)),
        'ctr_offsets': input_dict['ctr_offsets'],
        'centers': input_dict['centers'],
        'centers_origin': input_dict['centers_origin'],
        'sa_ins_preds': input_dict['sa_ins_preds'],
    }
    ret.update(targets)
    _, point_box = head.generate_predicted_boxes(
        points=input_dict['centers'][:, 1:4],
        point_cls_preds=ret['center_cls_preds'],
        point_box_preds=ret['center_box_preds'])
    ret['point_box_preds'] = point_box
    head.forward_ret_dict = ret
    ref_loss, _ = head.get_loss()

    our_coder = our_coders.build_box_coder(
        'PointResidual_BinOri_Coder', angle_bin_num=12,
        use_mean_size=True, mean_size=MEAN_SIZE)
    gt_j = jnp.asarray(gt)
    ct = target_assign.assign_targets_iassd(
        jnp.asarray(centers), gt_j,
        our_box_utils.enlarge_box3d(gt_j, [0.2, 0.2, 0.2]),
        set_ignore_flag=True, ret_box_labels=True,
        box_coder=our_coder, num_class=3)
    ext_05 = our_box_utils.enlarge_box3d(gt_j, [0.5, 0.5, 0.5])
    sa_targets = []
    for i, xyz in enumerate([enc1, enc2, enc3]):
        sa_targets.append(target_assign.assign_targets_iassd(
            jnp.asarray(xyz), gt_j, ext_05,
            set_ignore_flag=(i == 0), use_ex_gt_assign=(i != 0),
            box_coder=our_coder, num_class=3))
    sa_targets.append(None)
    cot = target_assign.assign_targets_iassd(
        jnp.asarray(centers_origin), gt_j,
        our_box_utils.enlarge_box3d(gt_j, [1.0, 1.0, 1.0]),
        set_ignore_flag=True, use_ex_gt_assign=True, fg_pc_ignore=False,
        ret_box_labels=True, box_coder=our_coder, num_class=3)
    pred_classes = jnp.argmax(jnp.asarray(cls_preds), axis=-1) + 1
    our_ret = {
        'center_cls_preds': jnp.asarray(cls_preds),
        'center_box_preds': jnp.asarray(box_preds),
        'ctr_offsets': jnp.asarray(ctr_offsets),
        'centers': jnp.asarray(centers),
        'centers_origin': jnp.asarray(centers_origin),
        'sa_ins_preds': [None, jnp.asarray(preds1[..., 1:]),
                         jnp.asarray(preds2[..., 1:]), None],
        'encoder_xyz': [jnp.asarray(centers), jnp.asarray(enc1),
                        jnp.asarray(enc2), jnp.asarray(enc3)],
        'center_targets': ct,
        'sa_targets': sa_targets,
        'center_origin_targets': cot,
        'point_box_preds': our_coder.decode(
            jnp.asarray(box_preds), jnp.asarray(centers),
            pred_classes=pred_classes),
    }
    our_loss, _ = iassd_head_loss(
        our_ret, cfg.LOSS_CONFIG, num_class=3, box_coder=our_coder,
        sa_centerness_mask=False, sample_method_list=SAMPLE_METHODS)
    assert float(our_loss) == pytest.approx(float(ref_loss),
                                            rel=2e-4, abs=1e-5)


def test_anchor_head_rpn_loss_matches_reference():
    """AnchorHeadTemplate get_loss (focal cls + sin-difference smooth-L1 +
    direction CE, ``anchor_head_template.py:101-223``) vs our
    anchor_head_loss on identical targets/preds — the SECOND/PointPillars
    family training objective."""
    ref_tmpl_mod = importlib.import_module(
        'pcdet.models.dense_heads.anchor_head_template')
    from spsnet_tpu.models.dense_heads.anchor_head import (
        anchor_head_loss, assign_anchor_targets, generate_anchors)
    from spsnet_tpu.utils import box_coder as our_coders

    class _AttrDict(dict):
        __getattr__ = dict.__getitem__

        def get(self, k, d=None):
            return super().get(k, d)

    pcr = [0.0, -39.68, -3.0, 69.12, 39.68, 1.0]
    grid_size = [176, 200, 40]
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
    model_cfg = _AttrDict(
        ANCHOR_GENERATOR_CONFIG=agc,
        TARGET_ASSIGNER_CONFIG=_AttrDict(
            NAME='AxisAlignedTargetAssigner',
            POS_FRACTION=-1.0, SAMPLE_SIZE=512,
            NORM_BY_NUM_EXAMPLES=False, MATCH_HEIGHT=False,
            BOX_CODER='ResidualCoder'),
        LOSS_CONFIG=_AttrDict(LOSS_WEIGHTS={
            'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
            'code_weights': [1.0] * 7}),
        USE_DIRECTION_CLASSIFIER=True,
        DIR_OFFSET=0.78539, DIR_LIMIT_OFFSET=0.0, NUM_DIR_BINS=2,
        USE_MULTIHEAD=False,
    )
    class_names = ['Car', 'Pedestrian', 'Cyclist']
    head = ref_tmpl_mod.AnchorHeadTemplate(
        model_cfg=model_cfg, num_class=3, class_names=class_names,
        grid_size=np.array(grid_size), point_cloud_range=np.array(pcr),
        predict_boxes_when_training=False)

    rng = np.random.default_rng(29)
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

    # real heads (AnchorHeadSingle.__init__) collapse the per-class list
    head.num_anchors_per_location = sum(head.num_anchors_per_location)
    targets = head.assign_targets(torch.tensor(gt))
    N = targets['box_cls_labels'].shape[1]
    cls_preds = rng.normal(0, 1, (B, N, 3)).astype(np.float32)
    box_preds = rng.normal(0, 1, (B, N, 7)).astype(np.float32)
    dir_preds = rng.normal(0, 1, (B, N, 2)).astype(np.float32)
    # the reference reshapes box_preds from map layout (B, HW, A*code):
    A = head.num_anchors_per_location
    head.forward_ret_dict = {
        'cls_preds': torch.tensor(cls_preds),
        'box_preds': torch.tensor(box_preds.reshape(B, N // A, A * 7)),
        'dir_cls_preds': torch.tensor(dir_preds),
        **targets,
    }
    ref_loss, ref_tb = head.get_loss()

    fmap = [grid_size[0] // stride, grid_size[1] // stride]
    anchors, cls_ids, mthr, uthr = generate_anchors(
        agc, grid_size[:2], pcr, stride)
    flat = jnp.asarray(anchors).reshape(-1, 7)
    our_coder = our_coders.build_box_coder('ResidualCoder')
    labels, regs, ws = [], [], []
    for b in range(B):
        lab, reg, w, _ = assign_anchor_targets(
            flat, jnp.asarray(np.tile(cls_ids, fmap[0] * fmap[1])),
            jnp.asarray(np.tile(mthr, fmap[0] * fmap[1])),
            jnp.asarray(np.tile(uthr, fmap[0] * fmap[1])),
            jnp.asarray(gt[b]), our_coder, 3)
        labels.append(lab)
        regs.append(reg)
        ws.append(w)
    ret = {
        'box_cls_labels': jnp.stack(labels),
        'box_reg_targets': jnp.stack(regs),
        'reg_weights': jnp.stack(ws),
        'cls_preds': jnp.asarray(cls_preds),
        'box_preds': jnp.asarray(box_preds),
        'dir_preds': jnp.asarray(dir_preds),
        'anchors': flat,
    }
    our_loss, our_tb = anchor_head_loss(
        ret, model_cfg.LOSS_CONFIG, num_class=3, box_coder=our_coder,
        num_dir_bins=2, dir_offset=0.78539)

    for k in ('rpn_loss_cls', 'rpn_loss_loc', 'rpn_loss_dir'):
        assert float(our_tb[k]) == pytest.approx(float(ref_tb[k]),
                                                 rel=2e-4, abs=1e-6), k
    assert float(our_loss) == pytest.approx(float(ref_loss),
                                            rel=2e-4, abs=1e-6)


def test_point_head_simple_loss_matches_reference():
    """PV-RCNN keypoint segmentation loss (focal cls normalized by
    positives, ``point_head_template.py:131-155``) vs our
    point_head_simple_loss on identical labels/preds."""
    ref_tmpl = importlib.import_module(
        'pcdet.models.dense_heads.point_head_template')
    from pcdet.utils import loss_utils as ref_losses
    from spsnet_tpu.models.dense_heads.point_head_simple import (
        point_head_simple_loss)
    from spsnet_tpu.models.dense_heads.target_assign import PointTargets

    rng = np.random.default_rng(77)
    N = 3000
    labels = rng.choice([-1, 0, 0, 0, 1, 2, 3], N).astype(np.int32)
    preds = rng.normal(0, 1, (N, 3)).astype(np.float32)

    class _Duck:
        num_class = 3
        cls_loss_func = ref_losses.SigmoidFocalClassificationLoss(
            alpha=0.25, gamma=2.0)
        model_cfg = EDict({'LOSS_CONFIG': {
            'LOSS_WEIGHTS': {'point_cls_weight': 1.0}}})
        forward_ret_dict = {
            'point_cls_labels': torch.tensor(labels).long(),
            'point_cls_preds': torch.tensor(preds),
        }

    ref_loss, ref_tb = ref_tmpl.PointHeadTemplate.get_cls_layer_loss(_Duck())

    t = PointTargets(cls_labels=jnp.asarray(labels)[None],
                     box_idxs=jnp.zeros((1, N), jnp.int32),
                     gt_box_of_points=jnp.zeros((1, N, 8)),
                     fg_mask=jnp.asarray(labels > 0)[None])
    our_loss, _ = point_head_simple_loss(
        {'targets': t, 'point_cls_preds': jnp.asarray(preds)[None]},
        EDict({'LOSS_WEIGHTS': {'point_cls_weight': 1.0}}))
    assert float(our_loss) == pytest.approx(float(ref_loss), rel=1e-5)


def test_center_head_loss_matches_reference():
    """CenterPoint loss (cornernet focal heatmap + masked L1 at inds,
    ``center_head.py:225-252`` + ``loss_utils.py:552-680``) vs our
    center_head_loss on identical preds/targets."""
    ref_ch_mod = importlib.import_module(
        'pcdet.models.dense_heads.center_head')
    from spsnet_tpu.models.dense_heads.center_head import (
        assign_center_targets, center_head_loss)

    pcr = np.array([0, -40.0, -3, 70.4, 40.0, 1], dtype=np.float32)
    voxel = [0.05, 0.05, 0.1]
    W, H, stride = 88, 100, 8
    rng = np.random.default_rng(51)
    B, T, K = 2, 8, 24
    gt = np.zeros((B, T, 8), dtype=np.float32)
    for b in range(B):
        n = 6 if b == 0 else 4
        gt[b, :n, 0] = rng.uniform(2, 68, n)
        gt[b, :n, 1] = rng.uniform(-38, 38, n)
        gt[b, :n, 2] = rng.uniform(-1.5, 0, n)
        gt[b, :n, 3:6] = rng.uniform(0.5, 4.5, (n, 3))
        gt[b, :n, 6] = rng.uniform(-np.pi, np.pi, n)
        gt[b, :n, 7] = rng.integers(1, 4, n)

    # preds in channel-last (ours) / channel-first (reference)
    hm = rng.normal(0, 1, (B, H, W, 3)).astype(np.float32)
    center = rng.normal(0, 1, (B, H, W, 2)).astype(np.float32)
    center_z = rng.normal(0, 1, (B, H, W, 1)).astype(np.float32)
    dim = rng.normal(0, 1, (B, H, W, 3)).astype(np.float32)
    rot = rng.normal(0, 1, (B, H, W, 2)).astype(np.float32)

    # both sides' targets from OUR assign (cross-verified vs the
    # reference's assign_target_of_single_head in test_reference_parity)
    hm_t, boxes_t, inds_t, mask_t = [], [], [], []
    for b in range(B):
        h, bx, ind, m, _ = assign_center_targets(
            jnp.asarray(gt[b]), 3, (W, H), stride, voxel, pcr,
            num_max_objs=K, gaussian_overlap=0.1, min_radius=2)
        hm_t.append(np.asarray(h))
        boxes_t.append(np.asarray(bx))
        inds_t.append(np.asarray(ind))
        mask_t.append(np.asarray(m))
    hm_t, boxes_t = np.stack(hm_t), np.stack(boxes_t)
    inds_t, mask_t = np.stack(inds_t), np.stack(mask_t)

    class _AttrDict(dict):
        __getattr__ = dict.__getitem__

        def get(self, k, d=None):
            return super().get(k, d)

    lw = {'cls_weight': 1.0, 'loc_weight': 2.0, 'code_weights': [1.0] * 8}

    class _Duck:
        from pcdet.utils import loss_utils as _rl
        hm_loss_func = _rl.FocalLossCenterNet()
        reg_loss_func = _rl.RegLossCenterNet()
        model_cfg = _AttrDict(LOSS_CONFIG=_AttrDict(LOSS_WEIGHTS=lw))
        separate_head_cfg = _AttrDict(
            HEAD_ORDER=['center', 'center_z', 'dim', 'rot'])
        sigmoid = ref_ch_mod.CenterHead.sigmoid
        forward_ret_dict = {
            'pred_dicts': [{
                'hm': torch.tensor(hm.transpose(0, 3, 1, 2)),
                'center': torch.tensor(center.transpose(0, 3, 1, 2)),
                'center_z': torch.tensor(center_z.transpose(0, 3, 1, 2)),
                'dim': torch.tensor(dim.transpose(0, 3, 1, 2)),
                'rot': torch.tensor(rot.transpose(0, 3, 1, 2)),
            }],
            'target_dicts': {
                'heatmaps': [torch.tensor(hm_t)],
                'target_boxes': [torch.tensor(boxes_t)],
                'inds': [torch.tensor(inds_t).long()],
                'masks': [torch.tensor(mask_t)],
            },
        }

    ref_loss, ref_tb = ref_ch_mod.CenterHead.get_loss(_Duck())

    ret = {
        'heatmap': jnp.asarray(hm), 'center': jnp.asarray(center),
        'center_z': jnp.asarray(center_z), 'dim': jnp.asarray(dim),
        'rot': jnp.asarray(rot),
        'heatmap_target': jnp.asarray(hm_t),
        'box_targets': jnp.asarray(boxes_t),
        'inds': jnp.asarray(inds_t), 'masks': jnp.asarray(mask_t),
    }
    our_loss, our_tb = center_head_loss(
        ret, _AttrDict(LOSS_WEIGHTS=lw))
    assert float(our_tb['hm_loss']) == pytest.approx(
        float(ref_tb['hm_loss_head_0']), rel=1e-4)
    assert float(our_tb['loc_loss']) == pytest.approx(
        float(ref_tb['loc_loss_head_0']), rel=1e-3)
    assert float(our_loss) == pytest.approx(float(ref_loss), rel=1e-3)


def test_roi_head_loss_matches_reference():
    """Two-stage RoI loss (BCE cls + canonical smooth-L1 reg + corner,
    ``roi_head_template.py:136-232``) vs our pointrcnn_head_loss on
    identical sampled-roi targets and predictions."""
    ref_roi_mod_pkgs = [
        ('pcdet.models.roi_heads', f'{REFERENCE_ROOT}/pcdet/models/roi_heads'),
    ]
    for pkg, path in ref_roi_mod_pkgs:
        mod = sys.modules.setdefault(pkg, types.ModuleType(pkg))
        mod.__path__ = [path]
    ref_roi = importlib.import_module(
        'pcdet.models.roi_heads.roi_head_template')
    from pcdet.utils import loss_utils as ref_losses
    from spsnet_tpu.models.roi_heads.pointrcnn_head import (
        pointrcnn_head_loss)
    from spsnet_tpu.models.roi_heads.roi_utils import RoiTargets
    from spsnet_tpu.utils import box_coder as our_coders
    from spsnet_tpu.utils.common import rotate_points_along_z

    rng = np.random.default_rng(61)
    B, R = 2, 32
    rois = np.zeros((B, R, 7), dtype=np.float32)
    rois[..., 0] = rng.uniform(5, 60, (B, R))
    rois[..., 1] = rng.uniform(-25, 25, (B, R))
    rois[..., 2] = rng.uniform(-1.2, -0.5, (B, R))
    rois[..., 3:6] = rng.uniform(1.0, 4.5, (B, R, 3))
    rois[..., 6] = rng.uniform(-np.pi, np.pi, (B, R))
    # global gt near each roi; canonical gt derived consistently
    gt_src = rois.copy()
    gt_src[..., 0:3] += rng.normal(0, 0.3, (B, R, 3)).astype(np.float32)
    gt_src[..., 3:6] *= rng.uniform(0.9, 1.1, (B, R, 3)).astype(np.float32)
    gt_src[..., 6] += rng.normal(0, 0.2, (B, R)).astype(np.float32)
    local_xyz = np.stack([
        np.asarray(rotate_points_along_z(
            jnp.asarray((gt_src[b, :, 0:3] - rois[b, :, 0:3])[:, None, :]),
            jnp.asarray(-rois[b, :, 6])))[:, 0, :]
        for b in range(B)])
    gt_ct = gt_src.copy()
    gt_ct[..., 0:3] = local_xyz
    gt_ct[..., 6] = gt_src[..., 6] - rois[..., 6]
    gt8 = np.concatenate([gt_ct, np.ones((B, R, 1), np.float32)], axis=-1)
    gt8_src = np.concatenate([gt_src, np.ones((B, R, 1), np.float32)],
                             axis=-1)
    reg_valid = (rng.random((B, R)) < 0.4).astype(np.int64)
    # soft iou-style labels in [0, 1]: torch>=2 rejects the reference's
    # -1 ignore sentinel inside F.binary_cross_entropy (it ran on torch
    # 1.6); the ignore masking itself is structural and identical
    cls_labels = rng.random((B, R)).astype(np.float32)
    rcnn_cls = rng.normal(0, 1, (B * R, 1)).astype(np.float32)
    rcnn_reg = rng.normal(0, 0.3, (B * R, 7)).astype(np.float32)

    class _AttrDict(dict):
        __getattr__ = dict.__getitem__

        def get(self, k, d=None):
            return super().get(k, d)

    lw = {'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
          'rcnn_corner_weight': 1.0, 'code_weights': [1.0] * 7}

    class _Duck:
        model_cfg = _AttrDict(LOSS_CONFIG=_AttrDict(
            CLS_LOSS='BinaryCrossEntropy', REG_LOSS='smooth-l1',
            CORNER_LOSS_REGULARIZATION=True, LOSS_WEIGHTS=lw))
        from pcdet.utils import box_coder_utils as _rbc
        box_coder = _rbc.ResidualCoder()
        reg_loss_func = ref_losses.WeightedSmoothL1Loss(
            code_weights=lw['code_weights'])
        forward_ret_dict = {
            'reg_valid_mask': torch.tensor(reg_valid),
            'gt_of_rois': torch.tensor(gt8),
            'gt_of_rois_src': torch.tensor(gt8_src),
            'rcnn_cls': torch.tensor(rcnn_cls),
            'rcnn_cls_labels': torch.tensor(cls_labels),
            'rcnn_reg': torch.tensor(rcnn_reg),
            'rois': torch.tensor(rois),
        }

    duck = _Duck()
    # bind the template's loss methods onto the duck
    duck.get_box_cls_layer_loss = \
        ref_roi.RoIHeadTemplate.get_box_cls_layer_loss.__get__(duck)
    duck.get_box_reg_layer_loss = \
        ref_roi.RoIHeadTemplate.get_box_reg_layer_loss.__get__(duck)
    ref_loss, ref_tb = ref_roi.RoIHeadTemplate.get_loss(duck)

    our_coder = our_coders.build_box_coder('ResidualCoder')
    # our forward's decode path (matches the reference's corner decode)
    local_rois = jnp.asarray(rois).at[..., 0:3].set(0.0).at[..., 6].set(0.0)
    decoded_local = our_coder.decode(
        jnp.asarray(rcnn_reg).reshape(B, R, 7), local_rois)
    xyz_g = rotate_points_along_z(
        decoded_local[..., 0:3].reshape(B * R, 1, 3),
        jnp.asarray(rois[..., 6]).reshape(B * R)).reshape(B, R, 3)
    decoded = decoded_local.at[..., 0:3].set(
        xyz_g + jnp.asarray(rois[..., 0:3]))
    decoded = decoded.at[..., 6].add(jnp.asarray(rois[..., 6]))

    t = RoiTargets(
        rois=jnp.asarray(rois),
        roi_labels=jnp.ones((B, R), jnp.int32),
        roi_scores=jnp.zeros((B, R)),
        gt_of_rois=jnp.asarray(gt8),
        gt_of_rois_src=jnp.asarray(gt8_src),
        gt_iou_of_rois=jnp.zeros((B, R)),
        reg_valid_mask=jnp.asarray(reg_valid) > 0,
        rcnn_cls_labels=jnp.asarray(cls_labels))
    ret = {'targets': t, 'rcnn_cls': jnp.asarray(rcnn_cls).reshape(B, R, 1),
           'rcnn_reg': jnp.asarray(rcnn_reg).reshape(B, R, 7),
           'batch_box_preds': decoded}
    our_loss, our_tb = pointrcnn_head_loss(
        ret, _AttrDict(CLS_LOSS='BinaryCrossEntropy',
                       CORNER_LOSS_REGULARIZATION=True, LOSS_WEIGHTS=lw),
        our_coder)

    for k in ('rcnn_loss_cls', 'rcnn_loss_reg'):
        assert float(our_tb[k]) == pytest.approx(float(ref_tb[k]),
                                                 rel=2e-4), k
    # our reg tb excludes corner (separate key); reference folds corner
    # into rcnn_loss_reg's return but logs it separately too
    assert float(our_tb['rcnn_loss_corner']) == pytest.approx(
        float(ref_tb['rcnn_loss_corner']), rel=2e-3)
    assert float(our_loss) == pytest.approx(float(ref_loss), rel=2e-3)


def test_stability_cvae_loss_matches_reference():
    """SPSNet's stability (CVAE) training loss — masked center regression +
    L2-norm regularization + fg/bg KL terms with the exp(logvar)-as-scale
    quirk (``stability_generate/model.py:430-508``) — vs our
    generate_center_loss, with targets from each side's own assignment."""
    # the reference stability module pulls torchvision + pointnet2 CUDA at
    # import; stub what the LOSS path never touches
    if 'torchvision' not in sys.modules:
        tv = types.ModuleType('torchvision')
        tv.models = types.ModuleType('torchvision.models')
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.models'] = tv.models
    for pkg, path in [
        ('pcdet.ops.pointnet2', f'{REFERENCE_ROOT}/pcdet/ops/pointnet2'),
        ('pcdet.ops.pointnet2.pointnet2_batch',
         f'{REFERENCE_ROOT}/pcdet/ops/pointnet2/pointnet2_batch'),
    ]:
        mod = sys.modules.setdefault(pkg, types.ModuleType(pkg))
        mod.__path__ = [path]
    sys.modules.setdefault(
        'pcdet.ops.pointnet2.pointnet2_batch.pointnet2_batch_cuda',
        types.ModuleType('pointnet2_batch_cuda'))
    from tests.reference_loader import load_reference_file
    ref_stab = load_reference_file('stability_generate/model.py',
                                   'ref_stability_model')
    from pcdet.utils import loss_utils as ref_losses
    import pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils as ref_pib
    ref_pib.points_in_boxes_gpu = _pib_gpu

    from spsnet_tpu.models.dense_heads.target_assign import (
        assign_targets_iassd)
    from spsnet_tpu.stability.model import generate_center_loss
    from spsnet_tpu.utils import box_utils as our_box_utils

    rng = np.random.default_rng(71)
    B, M, T = 2, 400, 6
    pts = np.zeros((B, M, 3), dtype=np.float32)
    pts[..., 0] = rng.uniform(0, 70, (B, M))
    pts[..., 1] = rng.uniform(-40, 40, (B, M))
    pts[..., 2] = rng.uniform(-2.5, 1, (B, M))
    gt = np.zeros((B, T, 8), dtype=np.float32)
    for b in range(B):
        n = 4
        gt[b, :n, 0] = rng.uniform(5, 60, n)
        gt[b, :n, 1] = rng.uniform(-25, 25, n)
        gt[b, :n, 2] = rng.uniform(-1.2, -0.5, n)
        gt[b, :n, 3:6] = rng.uniform(1.5, 4.5, (n, 3))
        gt[b, :n, 6] = rng.uniform(-np.pi, np.pi, n)
        gt[b, :n, 7] = rng.integers(1, 4, n)
        for i in range(n):
            k = 40
            local = rng.uniform(-0.4, 0.4, (k, 3)) * gt[b, i, 3:6]
            c, s = np.cos(gt[b, i, 6]), np.sin(gt[b, i, 6])
            world = np.stack([
                local[:, 0] * c - local[:, 1] * s + gt[b, i, 0],
                local[:, 0] * s + local[:, 1] * c + gt[b, i, 1],
                local[:, 2] + gt[b, i, 2]], 1)
            pts[b, rng.integers(0, M, k)] = world

    center_pred = rng.normal(0, 0.3, (B * M, 3)).astype(np.float32)
    mux = rng.normal(0, 1, (B * M, 8)).astype(np.float32)
    logvarx = rng.normal(0, 0.5, (B * M, 8)).astype(np.float32)
    lin1 = torch.nn.Linear(4, 6)
    lin2 = torch.nn.Linear(6, 3)
    lin3 = torch.nn.Linear(3, 2)

    stacked = np.concatenate([
        np.concatenate([np.full((M, 1), b, np.float32), pts[b]], axis=1)
        for b in range(B)], axis=0)
    ext = np.asarray(our_box_utils.enlarge_box3d(
        jnp.asarray(gt), [0.5, 0.5, 0.5]))

    class _Duck:
        num_class = 3
        reg_loss_func = ref_losses.WeightedSmoothL1Loss(
            code_weights=[1.0, 1.0, 1.0])
        feature_extract, feature_encoder, obj_encoder = lin1, lin2, lin3

    duck = _Duck()
    sa_t = ref_stab.Generate_center.assign_stack_targets_IASSD(
        duck, torch.tensor(stacked), torch.tensor(gt),
        extend_gt_boxes=torch.tensor(ext), set_ignore_flag=True)
    duck.forward_ret_dict = {
        'sa_ins_labels': [sa_t['point_cls_labels']],
        'sa_gt_box_of_fg_points': [sa_t['gt_box_of_fg_points']],
        'sa_xyz_coords': [torch.tensor(stacked)],
        'center_pred': torch.tensor(center_pred),
        'mux': torch.tensor(mux),
        'logvarx': torch.tensor(logvarx),
    }
    duck.generate_center_ness_mask = \
        ref_stab.Generate_center.generate_center_ness_mask.__get__(duck)
    duck.kl_divergence = \
        ref_stab.Generate_center.kl_divergence.__get__(duck)
    ref_loss, ref_tb, _ = ref_stab.Generate_center.get_training_loss(duck)

    params = {'l1': {'w': jnp.asarray(lin1.weight.detach().numpy()),
                     'b': jnp.asarray(lin1.bias.detach().numpy())},
              'l2': {'w': jnp.asarray(lin2.weight.detach().numpy()),
                     'b': jnp.asarray(lin2.bias.detach().numpy())},
              'l3': {'w': jnp.asarray(lin3.weight.detach().numpy()),
                     'b': jnp.asarray(lin3.bias.detach().numpy())}}
    ret = {'layer_xyz': jnp.asarray(pts),
           'center_pred': jnp.asarray(center_pred).reshape(B, M, 3),
           'mu': jnp.asarray(mux).reshape(B, M, 8),
           'logvar': jnp.asarray(logvarx).reshape(B, M, 8)}
    our_loss, our_tb = generate_center_loss(
        params, ret, jnp.asarray(gt), code_weights=[1.0, 1.0, 1.0])
    assert float(our_tb['center_loss_box']) == pytest.approx(
        float(ref_tb['center_loss_box']), rel=2e-4, abs=1e-6)
    assert float(our_loss) == pytest.approx(float(ref_loss), rel=2e-4)
