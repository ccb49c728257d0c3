"""CenterHeadIoU: multi-group CenterPoint head with an IoU-rectified score.

Rebuild of ``dense_heads/center_head_iou.py`` (class ``CenterHeadIoU`` :50,
``SeparateHead`` :13, decode :585-667) + ``loss_utils.IouLoss`` (:206-228):

- one head group per ``CLASS_NAMES_EACH_HEAD`` entry, each with its own
  heatmap plus shared-order regression maps (HEAD_DICT, num_conv stacks);
- gaussian heatmap targets per group (reuses ``assign_center_targets``);
- losses: penalty-reduced focal (hm) + masked L1 at center pixels (loc) +
  L1 between the predicted IoU map (at gt peaks) and ``2*iou3d - 1`` of the
  decoded-and-detached boxes vs their gt (``IouLoss.forward``);
- decode: per-group peak NMS -> top-K, scores rectified per class as
  ``score^(1-r) * iou^r`` with the config ``RECTIFIER`` list, post-center
  range gate, then per-class (== per-group on KITTI configs) rotated NMS —
  ``class_specific_nms`` semantics with fixed output slots.

The reference's per-frame python decode loop is one fixed-shape jitted
program here.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import boxes as box_ops
from .center_head import assign_center_targets, gaussian_focal_loss


class SeparateHead(nn.Module):
    """Per-output conv stacks (``center_head_iou.py:13-48``)."""
    head_dict: Any          # {name: (out_channels, num_conv)}
    shared_channels: int
    init_bias: float = -2.19
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = {}
        for name, (ch, num_conv) in self.head_dict:
            h = x
            for i in range(num_conv - 1):
                h = nn.Conv(self.shared_channels, (3, 3),
                            padding=((1, 1), (1, 1)), use_bias=self.use_bias,
                            name=f'{name}_conv{i}')(h)
                h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, name=f'{name}_bn{i}')(h)
                h = nn.relu(h)
            bias_init = nn.initializers.constant(self.init_bias) \
                if name == 'hm' else nn.initializers.zeros
            out[name] = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                                bias_init=bias_init, name=f'{name}_out')(h)
        return out


class CenterHeadIoU(nn.Module):
    model_cfg: Any
    num_class: int
    grid_size: Any
    voxel_size: Any
    point_cloud_range: Any
    class_names: Any = None

    def setup(self):
        cfg = self.model_cfg
        self.feature_map_stride = int(
            cfg.TARGET_ASSIGNER_CONFIG.get('FEATURE_MAP_STRIDE', 4))
        shared_ch = int(cfg.get('SHARED_CONV_CHANNEL', 64))
        use_bias = bool(cfg.get('USE_BIAS_BEFORE_NORM', False))

        names = list(self.class_names) if self.class_names is not None else \
            [str(i + 1) for i in range(self.num_class)]
        groups = []
        for head_names in cfg.CLASS_NAMES_EACH_HEAD:
            ids = tuple(names.index(n) for n in head_names if n in names)
            groups.append(ids)            # 0-based global class ids
        self.class_ids_each_head = tuple(groups)

        self.shared_conv = nn.Conv(shared_ch, (3, 3),
                                   padding=((1, 1), (1, 1)),
                                   use_bias=use_bias, name='shared_conv')
        self.shared_bn = nn.BatchNorm(momentum=0.99, epsilon=1e-3,
                                      name='shared_bn')

        head_dict_cfg = dict(cfg.SEPARATE_HEAD_CFG.HEAD_DICT)
        num_hm_conv = int(cfg.get('NUM_HM_CONV', 2))
        heads = []
        for gi, ids in enumerate(self.class_ids_each_head):
            hd = {'hm': (len(ids), num_hm_conv)}
            for k, v in head_dict_cfg.items():
                hd[k] = (int(v['out_channels']), int(v['num_conv']))
            heads.append(SeparateHead(
                head_dict=tuple(sorted(hd.items())), shared_channels=shared_ch,
                use_bias=use_bias, name=f'head_{gi}'))
        self.heads_list = heads
        self.head_order = tuple(cfg.SEPARATE_HEAD_CFG.HEAD_ORDER)

    def _decode_at(self, pred, pix, B):
        """Gather reg maps at flat pixel indices and assemble (B, K, 7)."""
        H, W = pred['center'].shape[1:3]

        def gather(m):
            return jnp.take_along_axis(
                m.reshape(B, H * W, m.shape[-1]), pix[..., None], axis=1)

        c_off = gather(pred['center'])
        c_z = gather(pred['center_z'])[..., 0]
        dims = jnp.exp(jnp.clip(gather(pred['dim']), -10.0, 10.0))
        rots = gather(pred['rot'])
        angle = jnp.arctan2(rots[..., 1], rots[..., 0])
        px = (pix % W).astype(jnp.float32)
        py = (pix // W).astype(jnp.float32)
        vs = np.asarray(self.voxel_size, np.float32)
        pcr = np.asarray(self.point_cloud_range, np.float32)
        xs = (px + c_off[..., 0]) * self.feature_map_stride * vs[0] + pcr[0]
        ys = (py + c_off[..., 1]) * self.feature_map_stride * vs[1] + pcr[1]
        cols = [xs, ys, c_z, dims[..., 0], dims[..., 1], dims[..., 2], angle]
        out = jnp.stack(cols, axis=-1)
        if 'vel' in pred:     # nuScenes: 9-dim boxes [..., rot, vx, vy]
            out = jnp.concatenate([out, gather(pred['vel'])], axis=-1)
        return out

    def __call__(self, batch, train: bool = True):
        x = self.shared_conv(batch['spatial_features_2d'])
        x = nn.relu(self.shared_bn(x, use_running_average=not train))
        B, H, W, _ = x.shape

        pred_dicts = [head(x, train=train) for head in self.heads_list]
        ret = {'pred_dicts': pred_dicts}

        tac = self.model_cfg.TARGET_ASSIGNER_CONFIG
        if train and 'gt_boxes' in batch:
            target_dicts = []
            for ids in self.class_ids_each_head:
                # keep only this group's classes, remap labels to 1..G
                # (class is the LAST gt column: col 7 on KITTI 8-wide boxes,
                # col 9 on nuScenes 10-wide boxes with velocity)
                gt = batch['gt_boxes']                       # (B, T, 8|10)
                lbl = gt[..., -1].astype(jnp.int32)          # 1-based global
                remap = -jnp.ones((self.num_class + 1,), jnp.int32)
                for li, gid in enumerate(ids):
                    remap = remap.at[gid + 1].set(li + 1)
                new_lbl = remap[jnp.clip(lbl, 0, self.num_class)]
                sel = new_lbl > 0
                gt_g = jnp.where(sel[..., None], gt, 0.0)
                gt_g = gt_g.at[..., -1].set(
                    jnp.where(sel, new_lbl, 0).astype(gt.dtype))
                hm_t, boxes_t, inds_t, mask_t, gt7_t = jax.vmap(
                    lambda g: assign_center_targets(
                        g, len(ids), (W, H), self.feature_map_stride,
                        np.asarray(self.voxel_size, np.float32),
                        np.asarray(self.point_cloud_range, np.float32),
                        num_max_objs=int(tac.get('NUM_MAX_OBJS', 500)),
                        gaussian_overlap=float(
                            tac.get('GAUSSIAN_OVERLAP', 0.1)),
                        min_radius=int(tac.get('MIN_RADIUS', 2))))(gt_g)
                target_dicts.append(
                    {'heatmap': hm_t, 'boxes': boxes_t, 'inds': inds_t,
                     'mask': mask_t, 'gt7': gt7_t})
            ret['target_dicts'] = target_dicts
            ret['decode_at_inds'] = [
                self._decode_at(pd, td['inds'], B)
                for pd, td in zip(pred_dicts, target_dicts)]

        # ---- decode (fixed shapes; parity: generate_predicted_boxes) ----
        pp = self.model_cfg.POST_PROCESSING
        rectifier = np.asarray(pp.get('RECTIFIER', 0.0), np.float32).reshape(-1)
        post_range = np.asarray(
            pp.get('POST_CENTER_LIMIT_RANGE',
                   [-1e9, -1e9, -1e9, 1e9, 1e9, 1e9]), np.float32)
        score_thresh = float(pp.get('SCORE_THRESH', 0.1))
        nms_cfg = pp.NMS_CONFIG
        n_pre = int(nms_cfg.get('NMS_PRE_MAXSIZE', 500))
        n_post = int(nms_cfg.get('NMS_POST_MAXSIZE', 80))

        # Two decode protocols share this fixed-shape machinery:
        # - upstream CenterHead (``center_head.py:253-295`` +
        #   ``centernet_utils._topk``): global top-K over (class, pixel)
        #   pairs, NO peak filter, class_agnostic_nms per head group;
        # - the fork's CenterHeadIoU (``center_head_iou.py:585-650``):
        #   per-PIXEL class max (one candidate per pixel), score rectified
        #   by the iou head, then agnostic_nms or class_specific_nms per
        #   POST_PROCESSING.NMS_CONFIG.NMS_NAME.
        # Parity for the upstream branch is pinned by
        # tests/test_centerpoint_forward_parity.py.
        upstream = str(self.model_cfg.get('NAME', 'CenterHeadIoU')) == \
            'CenterHead'
        nms_name = str(nms_cfg.get(
            'NMS_NAME', 'agnostic_nms' if upstream else 'class_specific_nms'))
        nms_thresh = float(nms_cfg.get('NMS_THRESH', 0.1))

        all_boxes, all_scores, all_labels, all_valid = [], [], [], []
        for gi, (ids, pred) in enumerate(
                zip(self.class_ids_each_head, pred_dicts)):
            hm = jax.nn.sigmoid(pred['hm'])
            G = len(ids)
            if upstream:
                # candidate set = top MAX_OBJ_PER_SAMPLE over (pixel, class)
                # (``decode_bbox_from_heatmap`` K), NOT the NMS presize
                max_obj = int(pp.get('MAX_OBJ_PER_SAMPLE', 500))
                flat = hm.reshape(B, H * W * G)
                scores, top_idx = jax.lax.top_k(flat,
                                                min(max_obj, H * W * G))
                cls_local = top_idx % G
                pix = top_idx // G
            else:
                px_scores = jnp.max(hm, axis=-1).reshape(B, H * W)
                px_cls = jnp.argmax(hm, axis=-1).reshape(B, H * W)
                scores, pix = jax.lax.top_k(px_scores, min(n_pre, H * W))
                cls_local = jnp.take_along_axis(px_cls, pix, axis=1)

            boxes = self._decode_at(pred, pix, B)
            if 'iou' in pred:
                iou_map = pred['iou'].reshape(B, H * W)
                iou = jnp.take_along_axis(iou_map, pix, axis=1)
                iou = jnp.clip((iou + 1.0) * 0.5, 0.0, 1.0)
            else:
                iou = jnp.ones_like(scores)

            in_range = jnp.all(boxes[..., :3] >= post_range[:3], axis=-1) & \
                jnp.all(boxes[..., :3] <= post_range[3:], axis=-1)

            ids_arr = jnp.asarray(np.asarray(ids, np.int32))
            gids = ids_arr[cls_local]                   # global class ids
            if rectifier.size > 1:
                r = jnp.asarray(rectifier)[gids]
            else:
                r = jnp.float32(rectifier.reshape(-1)[0])
            s_all = jnp.power(jnp.clip(scores, 1e-9, None), 1.0 - r) * \
                jnp.power(jnp.clip(iou, 1e-9, None), r)

            def nms_one(b, s_, v):
                keep, cnt = box_ops.nms_bev(
                    b, s_, nms_thresh,
                    pre_maxsize=n_pre, post_maxsize=n_post, valid=v)
                sl = jnp.arange(n_post) < cnt
                kc = jnp.clip(keep, 0, None)
                return b[kc], jnp.where(sl, s_[kc], 0.0), kc, sl

            if nms_name == 'agnostic_nms':
                ok = in_range & (s_all > score_thresh)
                bb, ss, kc, vv = jax.vmap(nms_one)(
                    boxes, jnp.where(ok, s_all, 0.0), ok)
                all_boxes.append(bb)
                all_scores.append(ss)
                all_labels.append(jnp.take_along_axis(gids, kc, axis=1) + 1)
                all_valid.append(vv)
            else:
                # class_specific_nms: each class in the group gets its own
                # NMS and its own n_post output slots
                for li, gid in enumerate(ids):
                    ok = in_range & (s_all > score_thresh) & (cls_local == li)
                    bb, ss, _, vv = jax.vmap(nms_one)(
                        boxes, jnp.where(ok, s_all, 0.0), ok)
                    all_boxes.append(bb)
                    all_scores.append(ss)
                    all_labels.append(
                        jnp.full((B, n_post), gid + 1, jnp.int32))
                    all_valid.append(vv)

        boxes = jnp.concatenate(all_boxes, axis=1)
        scores = jnp.concatenate(all_scores, axis=1)
        labels = jnp.concatenate(all_labels, axis=1)
        valid = jnp.concatenate(all_valid, axis=1)

        batch = dict(batch)
        batch['final_boxes'] = jnp.where(valid[..., None], boxes, 0.0)
        batch['final_scores'] = scores
        batch['final_labels'] = jnp.where(valid, labels, 0)
        batch['final_valid'] = valid
        batch['batch_box_preds'] = boxes
        batch['batch_cls_preds'] = jnp.where(
            jax.nn.one_hot(jnp.clip(labels - 1, 0, self.num_class - 1),
                           self.num_class) > 0, scores[..., None], 0.0)
        batch['cls_preds_normalized'] = True
        batch['center_head_iou_ret'] = ret
        return batch


def center_head_iou_loss(ret, loss_cfg, head_order):
    """Sum over head groups: focal hm + masked L1 + IoU-target L1
    (``center_head_iou.py get_loss`` :501-583)."""
    lw = loss_cfg.LOSS_WEIGHTS
    total = 0.0
    tb = {}
    for gi, (pred, tgt) in enumerate(
            zip(ret['pred_dicts'], ret['target_dicts'])):
        hm_loss = gaussian_focal_loss(
            jnp.transpose(pred['hm'], (0, 3, 1, 2)), tgt['heatmap'])
        hm_loss = hm_loss * lw.get('cls_weight', 1.0)

        B, H, W, _ = pred['hm'].shape
        reg = jnp.concatenate([pred[k] for k in head_order], axis=-1)
        C = reg.shape[-1]
        flat = reg.reshape(B, H * W, C)
        at_inds = jnp.take_along_axis(flat, tgt['inds'][..., None], axis=1)
        mask = tgt['mask'].astype(jnp.float32)[..., None]
        code_w = jnp.asarray(lw.get('code_weights', [1.0] * C))[:C]
        l1 = jnp.abs(at_inds - tgt['boxes'][..., :C]) * mask * code_w
        loc_loss = l1.sum() / jnp.clip(mask.sum(), 1.0, None)
        loc_loss = loc_loss * lw.get('loc_weight', 0.25)

        total = total + hm_loss + loc_loss
        tb[f'hm_loss_head_{gi}'] = hm_loss
        tb[f'loc_loss_head_{gi}'] = loc_loss

        if 'iou' in pred:
            # reference clamps decoded boxes to +/-200 before the IoU
            # (center_head_iou.py:540) to dodge degenerate overlaps
            dec = jnp.clip(
                jax.lax.stop_gradient(ret['decode_at_inds'][gi][..., :7]),
                -200.0, 200.0)
            m = tgt['mask'].astype(jnp.float32)
            iou3d = jax.vmap(box_ops.boxes_iou3d_paired)(dec, tgt['gt7'])
            target = 2.0 * iou3d - 1.0
            iou_flat = pred['iou'].reshape(B, H * W)
            iou_at = jnp.take_along_axis(iou_flat, tgt['inds'], axis=1)
            iou_loss = jnp.sum(jnp.abs(iou_at - target) * m) / \
                (jnp.sum(m) + 1e-4)
            iou_loss = iou_loss * lw.get('iou_weight', 1.0)
            total = total + iou_loss
            tb[f'iou_loss_{gi}'] = iou_loss
    tb['rpn_loss'] = total
    return total, tb
