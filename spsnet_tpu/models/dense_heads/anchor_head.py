"""Anchor-based dense head (SECOND / PointPillars family).

Rebuild of ``dense_heads/anchor_head_{template,single}.py`` +
``target_assigner/{anchor_generator,axis_aligned_target_assigner}.py``:

- grid anchors per class (sizes x rotations) laid out (ny, nx, C*R, 7);
- axis-aligned-nearest-BEV-IoU target assignment with per-class
  matched/unmatched thresholds, gt-force-matching, batched via vmap;
- losses: positives-normalized focal cls, sin-difference smooth-L1 box,
  2-bin direction classifier;
- decode with direction correction.

Everything is fixed-shape; the per-frame/per-class python loops of the
reference become a static class loop inside one vmapped assignment.
"""
from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import box_coder as box_coder_lib
from ...utils import loss_utils
from ...utils.common import limit_period


def generate_anchors(anchor_generator_configs, grid_size, point_cloud_range,
                     feature_map_stride):
    """Returns anchors (ny, nx, A, 7) float32 and per-anchor-slot metadata
    (class id (A,), matched/unmatched thresholds (A,)).

    Layout per location: [class0_rot0, class0_rot1, class1_rot0, ...] —
    the conv head channel ordering must match (it does, by construction).
    """
    pcr = np.asarray(point_cloud_range, dtype=np.float32)
    nx = int(grid_size[0]) // feature_map_stride
    ny = int(grid_size[1]) // feature_map_stride

    all_anchors, cls_ids, m_thr, u_thr = [], [], [], []
    for ci, cfg in enumerate(anchor_generator_configs):
        # Grid placement mirrors the reference AnchorGenerator
        # (target_assigner/anchor_generator.py:26-40): align_center=True puts
        # anchors at voxel centers (stride=span/n, +stride/2 offset);
        # align_center=False (all KITTI configs) spans the full range
        # inclusively (stride=span/(n-1), no offset). z is always shifted
        # from bottom to box center by +dz/2 (reference line 59, applied
        # unconditionally after the grid build).
        if cfg.get('align_center', False):
            x_stride = (pcr[3] - pcr[0]) / nx
            y_stride = (pcr[4] - pcr[1]) / ny
            x_off, y_off = x_stride / 2, y_stride / 2
        else:
            x_stride = (pcr[3] - pcr[0]) / (nx - 1)
            y_stride = (pcr[4] - pcr[1]) / (ny - 1)
            x_off, y_off = 0.0, 0.0
        xs = pcr[0] + x_off + np.arange(nx) * x_stride
        ys = pcr[1] + y_off + np.arange(ny) * y_stride

        sizes = np.asarray(cfg['anchor_sizes'], dtype=np.float32)
        rotations = np.asarray(cfg['anchor_rotations'], dtype=np.float32)
        # All bottom heights are honored. Per-location ordering within a
        # class is height -> size -> rotation (the reference's flatten order
        # is only well-defined for a single height — every shipped config —
        # so for multi-height we pick the ordering its
        # num_anchors_per_location accounting implies).
        for z_bottom in cfg['anchor_bottom_heights']:
            for size in sizes:
                for rot in rotations:
                    a = np.zeros((ny, nx, 7), dtype=np.float32)
                    a[..., 0] = xs[None, :]
                    a[..., 1] = ys[:, None]
                    a[..., 2] = float(z_bottom) + size[2] / 2
                    a[..., 3:6] = size
                    a[..., 6] = rot
                    all_anchors.append(a)
                    cls_ids.append(ci + 1)
                    m_thr.append(float(cfg['matched_threshold']))
                    u_thr.append(float(cfg['unmatched_threshold']))
    anchors = np.stack(all_anchors, axis=2)        # (ny, nx, A, 7)
    return (anchors, np.asarray(cls_ids, np.int32),
            np.asarray(m_thr, np.float32), np.asarray(u_thr, np.float32))


def _aligned_bev_boxes(boxes):
    """Axis-aligned BEV envelope (parity: ``box_utils.
    boxes3d_lidar_to_aligned_bev_boxes``): rotate dims to the nearest axis."""
    rot = limit_period(boxes[..., 6], offset=0.5, period=np.pi)
    cond = (jnp.abs(rot) < np.pi / 4)
    dx = jnp.where(cond, boxes[..., 3], boxes[..., 4])
    dy = jnp.where(cond, boxes[..., 4], boxes[..., 3])
    return jnp.stack([boxes[..., 0] - dx / 2, boxes[..., 1] - dy / 2,
                      boxes[..., 0] + dx / 2, boxes[..., 1] + dy / 2], axis=-1)


def nearest_bev_iou(boxes_a, boxes_b):
    """(N, 7) x (M, 7) axis-aligned nearest-BEV IoU
    (parity: ``box_utils.boxes3d_nearest_bev_iou``)."""
    a = _aligned_bev_boxes(boxes_a)
    b = _aligned_bev_boxes(boxes_b)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    return inter / jnp.clip(area_a + area_b - inter, 1e-6, None)


def assign_anchor_targets(anchors_flat, anchor_cls, anchor_mthr, anchor_uthr,
                          gt_boxes, box_coder, num_classes):
    """One frame (parity: ``assign_targets_single`` with the per-class gt
    masking of ``AxisAlignedTargetAssigner.assign_targets``).

    Args:
        anchors_flat: (N, 7); anchor_cls/m/u: (N,); gt_boxes: (T, 8) padded —
            or (T, 10) for nuScenes-style boxes with velocity
            [x,y,z,dx,dy,dz,rot,vx,vy,cls]; the class is always the last
            column and extra dims are encoded as residuals vs zero-padded
            anchors (reference pads anchors to the coder's raw dim,
            ``anchor_head_template.py generate_anchors``).
    Returns: labels (N,) int32 (-1/0/c), reg_targets (N, code), reg_w (N,).
    """
    N = anchors_flat.shape[0]
    gt_valid = gt_boxes[:, 3] > 0
    gt_cls = gt_boxes[:, -1].astype(jnp.int32)
    box_dim = gt_boxes.shape[-1] - 1
    if box_dim > 7:
        anchors_flat = jnp.pad(anchors_flat, ((0, 0), (0, box_dim - 7)))

    iou = nearest_bev_iou(anchors_flat[:, :7], gt_boxes[:, :7])  # (N, T)
    same_class = anchor_cls[:, None] == gt_cls[None, :]
    iou = jnp.where(same_class & gt_valid[None, :], iou, -1.0)

    a2g_max = jnp.max(iou, axis=1)
    a2g_arg = jnp.argmax(iou, axis=1)
    g2a_max = jnp.max(iou, axis=0)                             # (T,)
    # gt with no positive overlap gets sentinel so no anchor force-matches
    g2a_max = jnp.where(g2a_max <= 0, -2.0, g2a_max)
    force = jnp.any((iou == g2a_max[None, :]) & gt_valid[None, :], axis=1)

    labels = jnp.full((N,), -1, dtype=jnp.int32)
    pos = a2g_max >= anchor_mthr
    bg = a2g_max < anchor_uthr
    matched_cls = gt_cls[a2g_arg]
    labels = jnp.where(bg, 0, labels)
    labels = jnp.where(pos | force, matched_cls, labels)

    fg = labels > 0
    enc = box_coder.encode(gt_boxes[a2g_arg, :box_dim], anchors_flat)
    reg_targets = jnp.where(fg[:, None], enc, 0.0)
    reg_weights = fg.astype(jnp.float32)
    return labels, reg_targets, reg_weights, a2g_arg


class AnchorHeadSingle(nn.Module):
    """Single conv head (``anchor_head_single.py``)."""
    model_cfg: Any
    num_class: int
    grid_size: Any
    point_cloud_range: Any

    def setup(self):
        tac = self.model_cfg.TARGET_ASSIGNER_CONFIG
        bc_cfg = tac.get('BOX_CODER_CONFIG', None)
        bc_cfg = dict(bc_cfg.to_dict()) if hasattr(bc_cfg, 'to_dict') else \
            dict(bc_cfg or {})
        self.box_coder = box_coder_lib.build_box_coder(
            tac.get('BOX_CODER', 'ResidualCoder'), **bc_cfg)
        agc = [dict(c.to_dict() if hasattr(c, 'to_dict') else c)
               for c in self.model_cfg.ANCHOR_GENERATOR_CONFIG]
        stride = int(agc[0].get('feature_map_stride', 2))
        anchors, cls_ids, m, u = generate_anchors(
            agc, self.grid_size, self.point_cloud_range, stride)
        self.anchors = jnp.asarray(anchors)          # (ny, nx, A, 7)
        self.anchor_cls = jnp.asarray(cls_ids)
        self.anchor_mthr = jnp.asarray(m)
        self.anchor_uthr = jnp.asarray(u)
        self.num_anchors_per_loc = anchors.shape[2]
        A = self.num_anchors_per_loc
        self.conv_cls = nn.Conv(A * self.num_class, (1, 1), name='conv_cls')
        self.conv_box = nn.Conv(A * self.box_coder.code_size, (1, 1),
                                name='conv_box')
        self.use_dir = self.model_cfg.get('USE_DIRECTION_CLASSIFIER', True)
        self.num_dir_bins = int(self.model_cfg.get('NUM_DIR_BINS', 2))
        if self.use_dir:
            self.conv_dir = nn.Conv(A * self.num_dir_bins, (1, 1),
                                    name='conv_dir_cls')

    def __call__(self, batch, train: bool = True):
        x = batch['spatial_features_2d']             # (B, ny, nx, C)
        B, H, W, _ = x.shape
        A = self.num_anchors_per_loc
        cls_preds = self.conv_cls(x).reshape(B, H * W * A, self.num_class)
        box_preds = self.conv_box(x).reshape(B, H * W * A,
                                             self.box_coder.code_size)
        dir_preds = None
        if self.use_dir:
            dir_preds = self.conv_dir(x).reshape(B, H * W * A,
                                                 self.num_dir_bins)

        anchors_flat = self.anchors.reshape(-1, 7)
        ret = {'cls_preds': cls_preds, 'box_preds': box_preds,
               'dir_preds': dir_preds, 'anchors': anchors_flat}

        if train and 'gt_boxes' in batch:
            ac = jnp.broadcast_to(self.anchor_cls[None, None],
                                  (H, W, A)).reshape(-1)
            am = jnp.broadcast_to(self.anchor_mthr[None, None],
                                  (H, W, A)).reshape(-1)
            au = jnp.broadcast_to(self.anchor_uthr[None, None],
                                  (H, W, A)).reshape(-1)
            labels, reg_t, reg_w, _ = jax.vmap(
                lambda gt: assign_anchor_targets(
                    anchors_flat, ac, am, au, gt, self.box_coder,
                    self.num_class))(batch['gt_boxes'])
            ret.update({'box_cls_labels': labels, 'box_reg_targets': reg_t,
                        'reg_weights': reg_w})

        # decode for inference
        decoded = self.box_coder.decode(box_preds, anchors_flat[None])
        if self.use_dir and dir_preds is not None:
            dir_offset = float(self.model_cfg.get('DIR_OFFSET', 0.78539))
            dir_limit_offset = float(self.model_cfg.get('DIR_LIMIT_OFFSET', 0.0))
            dir_labels = jnp.argmax(dir_preds, axis=-1)
            period = 2 * np.pi / self.num_dir_bins
            rot = limit_period(decoded[..., 6] - dir_offset,
                               dir_limit_offset, period)
            decoded = decoded.at[..., 6].set(
                rot + dir_offset + period * dir_labels.astype(decoded.dtype))

        batch = dict(batch)
        batch['batch_cls_preds'] = cls_preds
        batch['batch_box_preds'] = decoded
        batch['cls_preds_normalized'] = False
        batch['anchor_head_ret'] = ret
        return batch


def anchor_head_loss(ret, loss_cfg, num_class, box_coder, num_dir_bins=2,
                     dir_offset=0.78539):
    """AnchorHeadTemplate losses (``anchor_head_template.py``): focal cls,
    sin-difference smooth-L1 box, direction CE. Returns (loss, tb)."""
    lw = loss_cfg.LOSS_WEIGHTS
    labels = ret['box_cls_labels']                  # (B, N)
    cls_preds = ret['cls_preds']
    box_preds = ret['box_preds']
    tb = {}

    care = labels >= 0
    positives = labels > 0
    neg = labels == 0
    # pos/neg class weighting (anchor_head_multi.py get_cls_layer_loss uses
    # pos_cls_weight/neg_cls_weight from LOSS_WEIGHTS; single head = 1/1)
    cls_w = (lw.get('neg_cls_weight', 1.0) * neg
             + lw.get('pos_cls_weight', 1.0) * positives)
    pos_norm = jnp.clip(positives.sum(axis=1, keepdims=True), 1.0, None)
    cls_w = cls_w / pos_norm
    one_hot = jax.nn.one_hot(jnp.clip(labels, 0, None), num_class + 1)[..., 1:]
    cls_loss = loss_utils.sigmoid_focal_loss(cls_preds, one_hot, cls_w).sum() \
        / labels.shape[0]
    cls_loss = cls_loss * lw['cls_weight']
    tb['rpn_loss_cls'] = cls_loss

    reg_w = ret['reg_weights'] / pos_norm
    # sin-difference heading encoding (anchor_head_template.add_sin_difference)
    bp, rt = box_preds, ret['box_reg_targets']
    sin_p = jnp.sin(bp[..., 6]) * jnp.cos(rt[..., 6])
    sin_t = jnp.cos(bp[..., 6]) * jnp.sin(rt[..., 6])
    bp = bp.at[..., 6].set(sin_p)
    rt = rt.at[..., 6].set(sin_t)
    loc_loss = loss_utils.weighted_smooth_l1(
        bp, rt, weights=reg_w,
        code_weights=lw.get('code_weights', None)).sum() / labels.shape[0]
    loc_loss = loc_loss * lw['loc_weight']
    tb['rpn_loss_loc'] = loc_loss

    dir_loss = 0.0
    if ret.get('dir_preds', None) is not None:
        anchors = ret['anchors']                    # (N, 7)
        gt_rot = ret['box_reg_targets'][..., 6] + anchors[None, :, 6]
        dir_t = jnp.floor(
            limit_period(gt_rot - dir_offset, 0.0, 2 * np.pi)
            / (2 * np.pi / num_dir_bins)).astype(jnp.int32)
        dir_t = jnp.clip(dir_t, 0, num_dir_bins - 1)
        one_hot_dir = jax.nn.one_hot(dir_t, num_dir_bins)
        dir_loss = loss_utils.weighted_softmax_ce(
            ret['dir_preds'], one_hot_dir, reg_w).sum() / labels.shape[0]
        dir_loss = dir_loss * lw['dir_weight']
        tb['rpn_loss_dir'] = dir_loss

    total = cls_loss + loc_loss + dir_loss
    tb['rpn_loss'] = total
    return total, tb


class AnchorHeadMulti(nn.Module):
    """Grouped multi-head RPN (rebuild of ``anchor_head_multi.py``:
    ``AnchorHeadMulti`` :151 + ``SingleHead`` :9, SEPARATE_MULTIHEAD mode of
    ``second_multihead.yaml``).

    One shared 3x3 conv, then per RPN_HEAD_CFGS group a 1x1 cls/box/dir
    trio over only that group's classes. Multihead anchor ordering is
    anchor-major ((A, H, W) flattened — ``anchor_head_multi.py:121-129``),
    and each head's anchors are exactly its classes' generator entries.

    TPU reformulation of the list-of-heads outputs: the per-head local
    class logits are scattered into ONE dense (B, N_all, num_class) matrix
    with -1e9 elsewhere (sigmoid -> 0), which reproduces the reference's
    ``multihead_label_mapping`` consumption in both the focal loss (zero
    loss at p=0, target=0) and multi-class NMS — no ragged head lists.
    """
    model_cfg: Any
    num_class: int
    grid_size: Any
    point_cloud_range: Any
    class_names: Any = None

    def setup(self):
        tac = self.model_cfg.TARGET_ASSIGNER_CONFIG
        bc_cfg = tac.get('BOX_CODER_CONFIG', None)
        bc_cfg = dict(bc_cfg.to_dict()) if hasattr(bc_cfg, 'to_dict') else \
            dict(bc_cfg or {})
        self.box_coder = box_coder_lib.build_box_coder(
            tac.get('BOX_CODER', 'ResidualCoder'), **bc_cfg)
        agc = [dict(c.to_dict() if hasattr(c, 'to_dict') else c)
               for c in self.model_cfg.ANCHOR_GENERATOR_CONFIG]
        names = list(self.class_names) if self.class_names is not None else \
            [c['class_name'] for c in agc]
        stride = int(agc[0].get('feature_map_stride', 2))
        self.use_dir = self.model_cfg.get('USE_DIRECTION_CLASSIFIER', True)
        self.num_dir_bins = int(self.model_cfg.get('NUM_DIR_BINS', 2))

        shared_ch = self.model_cfg.get('SHARED_CONV_NUM_FILTER', None)
        if shared_ch is not None:
            self.shared_conv = nn.Conv(int(shared_ch), (3, 3),
                                       padding=((1, 1), (1, 1)),
                                       use_bias=False, name='shared_conv')
            self.shared_bn = nn.BatchNorm(momentum=0.99, epsilon=1e-3,
                                          name='shared_bn')
        else:
            self.shared_conv = None

        sep = self.model_cfg.get('SEPARATE_REG_CONFIG', None)
        if sep is not None:
            n_mid = int(sep.NUM_MIDDLE_CONV)
            n_fil = int(sep.NUM_MIDDLE_FILTER)
            reg_list = [(s.split(':')[0], int(s.split(':')[1]))
                        for s in sep.REG_LIST]
            assert sum(ch for _, ch in reg_list) == self.box_coder.code_size, \
                (reg_list, self.box_coder.code_size)
            self.reg_list = reg_list

        def mid_stack(prefix):
            return [(nn.Conv(n_fil, (3, 3), padding='SAME', use_bias=False,
                             name=f'{prefix}_mid{k}'),
                     nn.BatchNorm(momentum=0.99, epsilon=1e-3,
                                  name=f'{prefix}_mid{k}_bn'))
                    for k in range(n_mid)]

        heads = []
        head_meta = []
        for hi, hcfg in enumerate(self.model_cfg.RPN_HEAD_CFGS):
            head_names = list(hcfg['HEAD_CLS_NAME'])
            sub_agc = [c for c in agc if c['class_name'] in head_names]
            anchors, cls_local, m, u = generate_anchors(
                sub_agc, self.grid_size, self.point_cloud_range, stride)
            # global 1-based class id per anchor slot
            gids = np.asarray(
                [names.index(sub_agc[ci - 1]['class_name']) + 1
                 for ci in cls_local], np.int32)
            A = anchors.shape[2]
            C = len(head_names)
            if sep is None:
                heads.append({
                    'cls': nn.Conv(A * C, (1, 1), name=f'head{hi}_cls',
                                   bias_init=nn.initializers.constant(
                                       -np.log(99.0))),
                    'box': nn.Conv(A * self.box_coder.code_size, (1, 1),
                                   name=f'head{hi}_box'),
                    'dir': nn.Conv(A * self.num_dir_bins, (1, 1),
                                   name=f'head{hi}_dir') if self.use_dir
                    else None,
                })
            else:
                # SEPARATE_REG_CONFIG (SingleHead separate path,
                # anchor_head_multi.py:21-75): per-component reg branches
                # [middle 3x3 conv+BN+ReLU]*k -> 3x3 out; cls gets its own
                # middle stack; branch order (REG_LIST) IS the code layout
                # [xy, z, size, angle(cos,sin), velo].
                heads.append({
                    'cls_mid': mid_stack(f'head{hi}_cls'),
                    'cls': nn.Conv(A * C, (3, 3), padding='SAME',
                                   name=f'head{hi}_cls',
                                   bias_init=nn.initializers.constant(
                                       -np.log(99.0))),
                    'box_branches': [
                        (rname, ch, mid_stack(f'head{hi}_{rname}'),
                         nn.Conv(A * ch, (3, 3), padding='SAME',
                                 name=f'head{hi}_{rname}'))
                        for rname, ch in reg_list],
                    'dir': nn.Conv(A * self.num_dir_bins, (1, 1),
                                   name=f'head{hi}_dir') if self.use_dir
                    else None,
                })
            head_meta.append({
                # (A, ny, nx, 7): multihead anchor-major flatten order
                'anchors': jnp.asarray(
                    np.transpose(anchors, (2, 0, 1, 3))),
                'gids': jnp.asarray(gids), 'm': jnp.asarray(m),
                'u': jnp.asarray(u), 'A': A, 'C': C,
                'global_cols': tuple(names.index(n) for n in head_names),
            })
        self.heads = heads
        self.head_meta = head_meta

    def __call__(self, batch, train: bool = True):
        x = batch['spatial_features_2d']
        if self.shared_conv is not None:
            x = nn.relu(self.shared_bn(self.shared_conv(x),
                                       use_running_average=not train))
        B, H, W, _ = x.shape

        all_cls, all_box, all_dir = [], [], []
        anchors_list, cls_ids, mthr, uthr = [], [], [], []
        def run_mid(feat, stack):
            for conv, bn in stack:
                feat = nn.relu(bn(conv(feat), use_running_average=not train))
            return feat

        for head, meta in zip(self.heads, self.head_meta):
            A, C = meta['A'], meta['C']
            if 'box_branches' in head:
                cl = head['cls'](run_mid(x, head['cls_mid']))
                parts = [out(run_mid(x, mid)).reshape(B, H, W, A, ch)
                         for _, ch, mid, out in head['box_branches']]
                bx = jnp.concatenate(parts, axis=-1)
            else:
                cl = head['cls'](x)
                bx = head['box'](x).reshape(B, H, W, A,
                                            self.box_coder.code_size)
            cl = cl.reshape(B, H, W, A, C)
            cl = jnp.transpose(cl, (0, 3, 1, 2, 4)).reshape(B, A * H * W, C)
            # scatter local class logits into the global class columns
            gcls = jnp.full((B, A * H * W, self.num_class), -1e9, cl.dtype)
            for li, col in enumerate(meta['global_cols']):
                gcls = gcls.at[..., col].set(cl[..., li])
            all_cls.append(gcls)

            all_box.append(jnp.transpose(bx, (0, 3, 1, 2, 4)).reshape(
                B, A * H * W, -1))
            if self.use_dir:
                dr = head['dir'](x).reshape(B, H, W, A, self.num_dir_bins)
                all_dir.append(jnp.transpose(dr, (0, 3, 1, 2, 4)).reshape(
                    B, A * H * W, -1))

            assert meta['anchors'].shape[1] == H and \
                meta['anchors'].shape[2] == W, \
                (meta['anchors'].shape, (H, W))
            anchors_list.append(meta['anchors'].reshape(A * H * W, 7))
            cls_ids.append(jnp.repeat(meta['gids'], H * W))
            mthr.append(jnp.repeat(meta['m'], H * W))
            uthr.append(jnp.repeat(meta['u'], H * W))

        cls_preds = jnp.concatenate(all_cls, axis=1)
        box_preds = jnp.concatenate(all_box, axis=1)
        dir_preds = jnp.concatenate(all_dir, axis=1) if self.use_dir else None
        anchors_flat = jnp.concatenate(anchors_list, axis=0)
        ac = jnp.concatenate(cls_ids)
        am = jnp.concatenate(mthr)
        au = jnp.concatenate(uthr)

        ret = {'cls_preds': cls_preds, 'box_preds': box_preds,
               'dir_preds': dir_preds, 'anchors': anchors_flat}
        if train and 'gt_boxes' in batch:
            labels, reg_t, reg_w, _ = jax.vmap(
                lambda gt: assign_anchor_targets(
                    anchors_flat, ac, am, au, gt, self.box_coder,
                    self.num_class))(batch['gt_boxes'])
            ret.update({'box_cls_labels': labels, 'box_reg_targets': reg_t,
                        'reg_weights': reg_w})

        decoded = self.box_coder.decode(box_preds, anchors_flat[None])
        if self.use_dir and dir_preds is not None:
            dir_offset = float(self.model_cfg.get('DIR_OFFSET', 0.78539))
            dir_limit = float(self.model_cfg.get('DIR_LIMIT_OFFSET', 0.0))
            dir_labels = jnp.argmax(dir_preds, axis=-1)
            period = 2 * np.pi / self.num_dir_bins
            rot = limit_period(decoded[..., 6] - dir_offset, dir_limit,
                               period)
            decoded = decoded.at[..., 6].set(
                rot + dir_offset + period * dir_labels.astype(decoded.dtype))

        batch = dict(batch)
        batch['batch_cls_preds'] = cls_preds
        batch['batch_box_preds'] = decoded
        batch['cls_preds_normalized'] = False
        batch['anchor_head_ret'] = ret
        return batch
