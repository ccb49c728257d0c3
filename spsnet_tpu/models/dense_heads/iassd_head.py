"""IA-SSD / SPSNet point head: cls+box FC stacks, in-jit target assignment,
and the full loss suite.

Rebuild of ``IASSD_Head`` (``dense_heads/IASSD_head.py``) and its byte-twin
``MLT_SSD_Head`` (identical except SA-instance centerness masking disabled,
diff at ``MLT_SSD_head.py:603-605``). All targets are computed densely inside
the jitted step — no per-frame python loops, no device->host sync.

Losses (``IASSD_head.py:402-785``), replicated exactly including the
reference's quirks:
- contextual vote loss: per-class masked smooth-L1 to gt centers, averaged
  over classes present (``:452-470``);
- SA instance-aware loss: weighted sigmoid-CE per confidence level with
  centerness masking on ctr-sampled levels (``:577-623``);
- center cls loss with centerness-weighted one-hot (``:547-574``);
- bin-orientation box loss — NOTE the in-bin residual term is averaged over
  ALL points (incl. background) and then multiplied by sum(reg_weights)==1,
  a reference quirk we keep for loss-curve parity (``:715-718``);
- 8-corner loss on decoded boxes vs fg gt (``:752-766``).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils import box_coder as box_coder_lib
from ...utils import box_utils, loss_utils
from ..blocks import MLPHead
from . import target_assign


def _build_coder(target_cfg):
    return box_coder_lib.build_box_coder(
        target_cfg.BOX_CODER, **target_cfg.BOX_CODER_CONFIG)


class IASSDHead(nn.Module):
    model_cfg: Any
    num_class: int
    input_channels: int
    predict_boxes_when_training: bool = False
    sa_centerness_mask: bool = True   # False => MLT_SSD_Head behavior

    def setup(self):
        target_cfg = self.model_cfg.TARGET_CONFIG
        self.box_coder = _build_coder(target_cfg)
        self.cls_center_layers = MLPHead(
            list(self.model_cfg.CLS_FC), self.num_class, name='cls_center')
        self.box_center_layers = MLPHead(
            list(self.model_cfg.REG_FC), self.box_coder.code_size, name='box_center')
        self.box_iou3d_layers = (
            MLPHead(list(self.model_cfg.IOU_FC), 1, name='box_iou3d')
            if self.model_cfg.get('IOU_FC', None) is not None else None)

    def assign_targets(self, batch):
        """Mirror of ``IASSD_Head.assign_targets`` (``:238-400``) in dense form."""
        target_cfg = self.model_cfg.TARGET_CONFIG
        gt_boxes = batch['gt_boxes']
        if gt_boxes.shape[-1] == 10:  # nuscenes: drop velocity, keep class
            gt_boxes = jnp.concatenate(
                [gt_boxes[..., 0:7], gt_boxes[..., -1:]], axis=-1)

        if target_cfg.get('EXTRA_WIDTH', False):
            extend_gt = box_utils.enlarge_box3d_for_class(
                gt_boxes, target_cfg.EXTRA_WIDTH)
        else:
            extend_gt = gt_boxes
        extend_gt_boxes = box_utils.enlarge_box3d(
            extend_gt, target_cfg.GT_EXTRA_WIDTH)

        out = {}
        centers = jax.lax.stop_gradient(batch['centers'])
        ct = target_assign.assign_targets_iassd(
            centers, extend_gt, extend_gt_boxes,
            set_ignore_flag=True, ret_box_labels=True,
            box_coder=self.box_coder, num_class=self.num_class)
        out['center_targets'] = ct

        if target_cfg.get('INS_AWARE_ASSIGN', False):
            sa_targets = []
            # level i pairs sa_ins_preds[i] (module i) with encoder_xyz[i+1];
            # module 0 uses the ignore-flag variant, deeper ones extend-gt
            # (reference loop ``IASSD_head.py:283-305``).
            for i, preds in enumerate(batch['sa_ins_preds']):
                if preds is None:
                    sa_targets.append(None)
                    continue
                sa_xyz = jax.lax.stop_gradient(batch['encoder_xyz'][i + 1])
                ext = box_utils.enlarge_box3d(gt_boxes, [0.5, 0.5, 0.5])
                t = target_assign.assign_targets_iassd(
                    sa_xyz, gt_boxes, ext,
                    set_ignore_flag=(i == 0), use_ex_gt_assign=(i != 0),
                    box_coder=self.box_coder, num_class=self.num_class)
                sa_targets.append(t)
            out['sa_targets'] = sa_targets

        extra = target_cfg.get('ASSIGN_METHOD', None)
        if extra is not None and extra.NAME == 'extend_gt':
            ext = box_utils.enlarge_box3d(gt_boxes, extra.EXTRA_WIDTH)
            pts = batch['centers_origin'] if extra.get('ASSIGN_TYPE', 'centers') \
                == 'centers_origin' else batch['centers']
            t = target_assign.assign_targets_iassd(
                jax.lax.stop_gradient(pts), gt_boxes, ext,
                set_ignore_flag=True, use_ex_gt_assign=True,
                fg_pc_ignore=bool(extra.get('FG_PC_IGNORE', False)),
                ret_box_labels=True,
                box_coder=self.box_coder, num_class=self.num_class)
            out['center_origin_targets'] = t
        return out

    def __call__(self, batch, train: bool = True):
        center_features = batch['centers_features']   # (B, M, C)
        center_cls_preds = self.cls_center_layers(center_features, train=train)
        center_box_preds = self.box_center_layers(center_features, train=train)
        box_iou3d_preds = (self.box_iou3d_layers(center_features, train=train)
                           if self.box_iou3d_layers is not None else None)

        ret = {
            'center_cls_preds': center_cls_preds,
            'center_box_preds': center_box_preds,
            'ctr_offsets': batch['ctr_offsets'],
            'centers': batch['centers'],
            'centers_origin': batch['centers_origin'],
            'sa_ins_preds': batch['sa_ins_preds'],
            'encoder_xyz': batch['encoder_xyz'],
            'box_iou3d_preds': box_iou3d_preds,
        }
        if train and 'gt_boxes' in batch:
            ret.update(self.assign_targets(batch))

        # decode (B, M, 7): pred class argmax+1 like generate_predicted_boxes
        pred_classes = jnp.argmax(center_cls_preds, axis=-1) + 1
        point_box_preds = self.box_coder.decode(
            center_box_preds, batch['centers'], pred_classes=pred_classes)
        ret['point_box_preds'] = point_box_preds

        batch = dict(batch)
        batch['batch_cls_preds'] = center_cls_preds
        batch['batch_box_preds'] = point_box_preds
        batch['cls_preds_normalized'] = False
        batch['head_ret'] = ret
        return batch


class MLTSSDHead(IASSDHead):
    """``MLT_SSD_Head``: IASSD head without SA centerness masking
    (``dense_heads/MLT_SSD_head.py:603-605``) — used by SPSNet.yaml."""
    sa_centerness_mask: bool = False


def _masked_mean(x, mask, eps=1.0):
    return jnp.sum(x * mask) / jnp.clip(jnp.sum(mask), eps, None)


def iassd_head_loss(ret, loss_cfg, num_class, box_coder,
                    sa_centerness_mask=True, sample_method_list=None):
    """Total head loss from the forward ret dict. Pure jnp; differentiable
    through the pred tensors. Returns (loss, tb_dict)."""
    lw = loss_cfg.LOSS_WEIGHTS
    tb = {}
    cls_loss_fn = loss_utils.build_cls_loss(loss_cfg.LOSS_CLS)
    ins_loss_fn = loss_utils.build_cls_loss(loss_cfg.get('LOSS_INS', loss_cfg.LOSS_CLS))

    # ---- vote loss — reference get_contextual_vote_loss{,_ver1,_ver2} ----
    cot = ret['center_origin_targets']
    centers_origin = ret['centers_origin']
    ctr_offsets = ret['ctr_offsets']
    centers_pred = centers_origin + ctr_offsets
    gt_centers = cot.gt_box_of_points[..., 0:3]
    per_elem = loss_utils.smooth_l1(centers_pred - gt_centers, beta=1.0)
    vote_type = loss_cfg.get('LOSS_VOTE_TYPE', 'none')
    if vote_type in ('ver1', 'ver2'):
        # instance-averaged variants (``IASSD_head.py:473-529``): per-frame
        # per-gt-instance sum/count via one-hot segment reduction.
        box_idxs = cot.box_idxs                        # (B, M)
        fg = cot.fg_mask
        max_t = 64
        safe_idx = jnp.clip(box_idxs, 0, max_t - 1)
        one_hot_ins = jax.nn.one_hot(safe_idx, max_t) * fg[..., None]
        per_point = per_elem.sum(axis=-1)              # (B, M)
        ins_sum = jnp.einsum('bm,bmt->bt', per_point, one_hot_ins)
        ins_cnt = one_hot_ins.sum(axis=1)              # (B, T)
        if vote_type == 'ver2':
            # extra term: spread around the per-instance mean prediction
            mean_pred = jnp.einsum('bmc,bmt->btc', centers_pred, one_hot_ins) \
                / jnp.clip(ins_cnt[..., None], 1.0, None)
            spread = loss_utils.smooth_l1(
                centers_pred[:, :, None, :] - mean_pred[:, None, :, :],
                beta=1.0).sum(-1)                      # (B, M, T)
            spread_sum = jnp.sum(spread * one_hot_ins, axis=1)
            ins_sum = ins_sum + 0.5 * spread_sum
        ins_loss = ins_sum / jnp.clip(ins_cnt, 1.0, None)
        has_ins = ins_cnt > 0
        vote_loss = jnp.sum(jnp.where(has_ins, ins_loss, 0.0)) \
            / jnp.clip(jnp.sum(has_ins), 1.0, None)
    else:  # 'none': per-class masked mean, averaged over classes present
        vote_losses, present = [], []
        for c in range(1, num_class + 1):
            m = (cot.cls_labels == c).astype(jnp.float32)
            cnt = jnp.sum(m)
            loss_c = jnp.sum(per_elem * m[..., None]) \
                / jnp.clip(cnt * 3.0, 1.0, None)
            vote_losses.append(loss_c)
            present.append((cnt > 0).astype(jnp.float32))
        vote_losses = jnp.stack(vote_losses)
        present = jnp.stack(present)
        vote_loss = jnp.sum(vote_losses * present) \
            / jnp.clip(jnp.sum(present), 1.0, None)
    vote_loss = vote_loss * lw.get('vote_weight', 1.0)
    tb['center_origin_loss_reg'] = vote_loss

    # ---- SA instance-aware loss — reference get_sa_ins_layer_loss (:577) ----
    sa_loss = 0.0
    n_valid_levels = 0
    for i, preds in enumerate(ret['sa_ins_preds']):
        if preds is None:
            continue
        t = ret['sa_targets'][i]
        labels = t.cls_labels
        positives = labels > 0
        weights = ((labels == 0) | positives).astype(jnp.float32)
        pos_norm = jnp.sum(positives.astype(jnp.float32))
        weights = weights / jnp.clip(pos_norm, 1.0, None)
        one_hot = jax.nn.one_hot(
            jnp.clip(labels, 0, None), num_class + 1)[..., 1:]
        use_cness = sa_centerness_mask and sample_method_list is not None and \
            ('ctr' in sample_method_list[i + 1][0])
        if use_cness:
            cness = target_assign.centerness_mask(
                ret['encoder_xyz'][i + 1], labels, t.gt_box_of_points, t.fg_mask)
            one_hot = one_hot * cness[..., None]
        li = ins_loss_fn(preds, one_hot, weights).mean(axis=-1).sum()
        li = li * lw.get('ins_aware_weight', [1.0] * 8)[i]
        sa_loss = sa_loss + li
        n_valid_levels += 1
        tb[f'sa{i}_loss_ins'] = li
    if n_valid_levels:
        sa_loss = sa_loss / n_valid_levels
    tb['sa_loss_ins'] = sa_loss

    # ---- center cls loss — reference get_center_cls_layer_loss (:547) ----
    ct = ret['center_targets']
    labels = ct.cls_labels
    cls_preds = ret['center_cls_preds']
    positives = labels > 0
    cls_weights = ((labels == 0) | positives).astype(jnp.float32)
    pos_norm = jnp.sum(positives.astype(jnp.float32))
    cls_weights = cls_weights / jnp.clip(pos_norm, 1.0, None)
    one_hot = jax.nn.one_hot(jnp.clip(labels, 0, None), num_class + 1)[..., 1:]
    cness = None
    if loss_cfg.get('CENTERNESS_REGULARIZATION', False):
        cness = target_assign.centerness_mask(
            ret['centers'], labels, ct.gt_box_of_points, ct.fg_mask)
        one_hot = one_hot * cness[..., None]
    cls_loss = cls_loss_fn(cls_preds, one_hot, cls_weights).mean(axis=-1).sum()
    cls_loss = cls_loss * lw['point_cls_weight']
    tb['center_loss_cls'] = cls_loss
    tb['center_pos_num'] = pos_norm

    # ---- box loss (bin-ori) — reference get_center_box_binori_layer_loss (:684) ----
    box_preds = ret['center_box_preds']
    box_labels = ct.box_labels
    reg_weights = positives.astype(jnp.float32)
    reg_weights = reg_weights / jnp.clip(pos_norm, 1.0, None)

    loss_xyzwhl = loss_utils.weighted_smooth_l1(
        box_preds[..., :6], box_labels[..., :6], weights=reg_weights,
        code_weights=lw.get('code_weights', None)).sum()

    bin_size = box_coder.bin_size
    pred_bin_id = box_preds[..., 6:6 + bin_size]
    pred_bin_res = box_preds[..., 6 + bin_size:6 + 2 * bin_size]
    label_bin_id = box_labels[..., 6].astype(jnp.int32)
    label_bin_res = box_labels[..., 7]
    logp = jax.nn.log_softmax(pred_bin_id, axis=-1)
    ce = -jnp.take_along_axis(logp, label_bin_id[..., None], axis=-1)[..., 0]
    loss_ori_cls = jnp.sum(ce * reg_weights) * lw.get('dir_weight', 1.0)
    res_at_label = jnp.take_along_axis(
        pred_bin_res, label_bin_id[..., None], axis=-1)[..., 0]
    # Reference quirk: scalar mean over ALL points, then x sum(reg_weights).
    loss_ori_reg = loss_utils.smooth_l1(res_at_label - label_bin_res, beta=1.0).mean()
    loss_ori_reg = loss_ori_reg * jnp.sum(reg_weights)
    box_loss = (loss_xyzwhl + loss_ori_reg + loss_ori_cls) * lw['point_box_weight']
    tb['center_loss_box'] = box_loss

    # ---- corner loss — reference get_corner_layer_loss (:752) ----
    corner_loss = 0.0
    if loss_cfg.get('CORNER_LOSS_REGULARIZATION', False):
        pred_boxes = ret['point_box_preds']
        B, M, _ = pred_boxes.shape
        fg = ct.fg_mask.reshape(-1).astype(jnp.float32)
        pc = loss_utils.get_corner_loss_lidar(
            pred_boxes.reshape(B * M, 7),
            ct.gt_box_of_points[..., :7].reshape(B * M, 7))
        corner_loss = _masked_mean(pc, fg) * lw['corner_weight']
        tb['corner_loss_reg'] = corner_loss

    total = vote_loss + sa_loss + cls_loss + box_loss + corner_loss
    tb['point_loss'] = total
    return total, tb
