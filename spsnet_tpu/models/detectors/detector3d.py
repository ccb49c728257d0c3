"""Shared detector machinery: post-processing (NMS) and recall bookkeeping.

Rebuild of ``Detector3DTemplate.post_processing`` (``detector3d_template.py:
186-292``) as a pure fixed-shape function: per-frame class-agnostic NMS is a
vmapped masked greedy suppression instead of a CUDA kernel + python batch loop.
Outputs are zero/-1 padded to ``NMS_POST_MAXSIZE`` with a per-frame count.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from ... import ops


@functools.partial(jax.jit, static_argnames=('score_thresh', 'nms_thresh',
                                             'nms_pre', 'nms_post',
                                             'cls_preds_normalized'))
def class_agnostic_nms_batch(batch_box_preds, batch_cls_preds,
                             score_thresh: float, nms_thresh: float,
                             nms_pre: int, nms_post: int,
                             cls_preds_normalized: bool = False,
                             batch_label_preds=None):
    """
    Args:
        batch_box_preds: (B, M, 7); batch_cls_preds: (B, M, num_class) logits.
        batch_label_preds: optional (B, M) int32 — when given these labels
            are gathered at the kept indices instead of argmax+1 (the
            reference's ``has_class_labels`` path: final labels come from
            ``roi_labels``, ``detector3d_template.py:230-232``).
    Returns dict:
        boxes (B, P, 7), scores (B, P), labels (B, P) int32 (1-based, 0 pad),
        count (B,) int32, indices (B, P) int32 (-1 pad) into the M axis.

    Parity: ``model_nms_utils.class_agnostic_nms`` (``model_nms_utils.py:6-25``)
    — score-threshold mask, top-``nms_pre`` by score, rotated NMS, ``nms_post``
    cap.
    """
    cls_scores = batch_cls_preds if cls_preds_normalized \
        else jax.nn.sigmoid(batch_cls_preds)
    scores = jnp.max(cls_scores, axis=-1)
    if batch_label_preds is None:
        labels = jnp.argmax(cls_scores, axis=-1).astype(jnp.int32) + 1
    else:
        labels = batch_label_preds.astype(jnp.int32)
    valid = scores > score_thresh

    def one_frame(boxes, score, lab, val):
        keep_idx, num = ops.nms_bev(boxes, score, nms_thresh,
                                    pre_maxsize=nms_pre, post_maxsize=nms_post,
                                    valid=val)
        ok = keep_idx >= 0
        safe = jnp.clip(keep_idx, 0, None)
        out_boxes = jnp.where(ok[:, None], boxes[safe], 0.0)
        out_scores = jnp.where(ok, score[safe], 0.0)
        out_labels = jnp.where(ok, lab[safe], 0)
        return out_boxes, out_scores, out_labels, num, keep_idx

    boxes, scores_o, labels_o, count, indices = jax.vmap(one_frame)(
        batch_box_preds, scores, labels, valid)
    return {'boxes': boxes, 'scores': scores_o, 'labels': labels_o,
            'count': count, 'indices': indices}


@functools.partial(jax.jit, static_argnames=('score_thresh', 'nms_thresh',
                                             'nms_pre', 'nms_post',
                                             'cls_preds_normalized'))
def multi_classes_nms_batch(batch_box_preds, batch_cls_preds,
                            score_thresh: float, nms_thresh: float,
                            nms_pre: int, nms_post: int,
                            cls_preds_normalized: bool = False):
    """Per-class NMS (parity: ``model_nms_utils.multi_classes_nms``,
    ``model_nms_utils.py:28-66``): each class suppressed independently, then
    the per-class survivors are merged by score to ``nms_post`` slots."""
    cls_scores = batch_cls_preds if cls_preds_normalized \
        else jax.nn.sigmoid(batch_cls_preds)
    num_class = cls_scores.shape[-1]

    def one_frame(boxes, scores_all):
        all_boxes, all_scores, all_labels = [], [], []
        for c in range(num_class):
            s = scores_all[:, c]
            valid = s > score_thresh
            keep_idx, num = ops.nms_bev(boxes, s, nms_thresh,
                                        pre_maxsize=nms_pre,
                                        post_maxsize=nms_post, valid=valid)
            ok = keep_idx >= 0
            safe = jnp.clip(keep_idx, 0, None)
            all_boxes.append(jnp.where(ok[:, None], boxes[safe], 0.0))
            all_scores.append(jnp.where(ok, s[safe], -1.0))
            all_labels.append(jnp.where(ok, c + 1, 0))
        boxes_c = jnp.concatenate(all_boxes, axis=0)
        scores_c = jnp.concatenate(all_scores, axis=0)
        labels_c = jnp.concatenate(all_labels, axis=0)
        top_scores, order = jax.lax.top_k(scores_c, nms_post)
        kept = top_scores > -1.0
        return (jnp.where(kept[:, None], boxes_c[order], 0.0),
                jnp.where(kept, top_scores, 0.0),
                jnp.where(kept, labels_c[order], 0),
                jnp.sum(kept).astype(jnp.int32))

    boxes, scores_o, labels_o, count = jax.vmap(one_frame)(
        batch_box_preds, cls_scores)
    return {'boxes': boxes, 'scores': scores_o, 'labels': labels_o,
            'count': count}


def post_processing(batch, post_cfg, class_names=None):
    """Run configured NMS over head outputs; returns the final dets dict."""
    if batch.get('iou_rescoring', False):
        return iou_rescore_post_processing(batch, post_cfg,
                                           class_names=class_names)
    nms_cfg = post_cfg.NMS_CONFIG
    if nms_cfg.get('MULTI_CLASSES_NMS', False):
        return multi_classes_nms_batch(
            batch['batch_box_preds'], batch['batch_cls_preds'],
            score_thresh=float(post_cfg.SCORE_THRESH),
            nms_thresh=float(nms_cfg.NMS_THRESH),
            nms_pre=int(nms_cfg.NMS_PRE_MAXSIZE),
            nms_post=int(nms_cfg.NMS_POST_MAXSIZE),
            cls_preds_normalized=bool(batch.get('cls_preds_normalized',
                                                False)))
    labels = batch.get('batch_roi_labels') \
        if batch.get('has_class_labels', False) else None
    return class_agnostic_nms_batch(
        batch['batch_box_preds'], batch['batch_cls_preds'],
        score_thresh=float(post_cfg.SCORE_THRESH),
        nms_thresh=float(nms_cfg.NMS_THRESH),
        nms_pre=int(nms_cfg.NMS_PRE_MAXSIZE),
        nms_post=int(nms_cfg.NMS_POST_MAXSIZE),
        cls_preds_normalized=bool(batch.get('cls_preds_normalized', False)),
        batch_label_preds=labels)


def iou_rescore_post_processing(batch, post_cfg, class_names=None):
    """SECOND-IoU post-processing (``second_net_iou.py:76-180``): NMS scores
    are routed by ``NMS_CONFIG.SCORE_TYPE`` between the RCNN IoU prediction
    (``batch_cls_preds``, raw logits) and the RPN class score
    (``batch_roi_scores``):

    - absent / ``iou``: sigmoid(iou)
    - ``cls``: sigmoid(rpn score)
    - ``weighted_iou_cls``: SCORE_WEIGHTS.iou * iou + SCORE_WEIGHTS.cls * cls
    - ``num_pts_iou_cls``: per-box alpha blend by in-box point count
      (``cal_scores_by_npoints:38-57`` — incl. its hardcoded ``-10`` offset)
    - ``score_by_class``: per-class routing between iou and cls
      (``set_nms_score_by_class:59-73``; needs ``class_names``)
    """
    nms_cfg = post_cfg.NMS_CONFIG
    iou_preds = batch['batch_cls_preds']            # (B, R, 1) raw
    cls_preds = batch['batch_roi_scores']           # (B, R) raw
    if not batch.get('cls_preds_normalized', False):
        iou_preds = jax.nn.sigmoid(iou_preds)
        cls_preds = jax.nn.sigmoid(cls_preds)
    iou_max = jnp.max(iou_preds, axis=-1)           # (B, R)
    if batch.get('has_class_labels', False):
        label_preds = batch['batch_roi_labels'].astype(jnp.int32)
    else:
        label_preds = jnp.argmax(iou_preds, axis=-1).astype(jnp.int32) + 1

    score_type = nms_cfg.get('SCORE_TYPE', None) or 'iou'
    if nms_cfg.get('SCORE_BY_CLASS', None) and score_type == 'score_by_class':
        assert class_names is not None, 'class_names required'
        use_iou = jnp.asarray(
            [True] + [nms_cfg.SCORE_BY_CLASS[c] == 'iou'
                      for c in class_names])        # index 0 = padding label
        routed = jnp.where(use_iou[jnp.clip(label_preds, 0, None)],
                           iou_max, cls_preds)
        # reference quirk (``set_nms_score_by_class``, second_net_iou.py:60):
        # it loops ``range(torch.unique(label_preds).shape[0])`` — the COUNT
        # of distinct label values (incl. the 0 of zero-padded roi slots) —
        # masking labels 1..n_unique; any label above that count keeps
        # nms_score 0 (e.g. labels {1,3} with no padding -> class-3 boxes
        # are zeroed). Replicated exactly so parity holds box-for-box.
        n_class = len(class_names)
        present = jnp.stack(
            [jnp.any(label_preds == k, axis=1)
             for k in range(0, n_class + 1)], axis=1)        # (B, K+1)
        n_unique = jnp.sum(present.astype(jnp.int32), axis=1,
                           keepdims=True)                    # (B, 1)
        nms_scores = jnp.where(
            (label_preds >= 1) & (label_preds <= n_unique), routed, 0.0)
    elif score_type == 'iou':
        nms_scores = iou_max
    elif score_type == 'cls':
        nms_scores = cls_preds
    elif score_type == 'weighted_iou_cls':
        w = nms_cfg.SCORE_WEIGHTS
        nms_scores = float(w.iou) * iou_max + float(w.cls) * cls_preds
    elif score_type == 'num_pts_iou_cls':
        th = nms_cfg.SCORE_THRESH
        cls_t, iou_t = float(th.cls), float(th.iou)
        from ...utils import box_utils
        pts = batch['points'][..., :3]              # (B, N, 3)
        boxes7 = batch['batch_box_preds'][..., :7]
        # full (N, R) membership — points_in_boxes_cpu counts a point in
        # EVERY containing box, not just the first hit
        local = box_utils.points_to_box_local(pts, boxes7)   # (B, N, R, 3)
        # points_in_boxes_cpu uses MARGIN=1e-2 (roiaware_pool3d.cpp:131),
        # wider than the CUDA kernel's 1e-5
        inside = box_utils.in_canonical_box(
            local, boxes7[:, None, :, 3:6],
            margin=1e-2) & (boxes7[:, None, :, 3] > 0)
        if 'points_valid' in batch:   # exclude fixed-shape pad slots
            inside = inside & batch['points_valid'][:, :, None]
        npts = jnp.sum(inside.astype(jnp.float32), axis=1)   # (B, R)
        alpha = jnp.where(
            npts <= cls_t, 0.0,
            jnp.where(npts >= iou_t, 1.0, (npts - 10.0) / (iou_t - cls_t)))
        nms_scores = (1 - alpha) * cls_preds + alpha * iou_max
    else:
        raise NotImplementedError(f'SCORE_TYPE {score_type}')

    dets = class_agnostic_nms_batch(
        batch['batch_box_preds'], nms_scores[..., None],
        score_thresh=float(post_cfg.SCORE_THRESH),
        nms_thresh=float(nms_cfg.NMS_THRESH),
        nms_pre=int(nms_cfg.NMS_PRE_MAXSIZE),
        nms_post=int(nms_cfg.NMS_POST_MAXSIZE),
        cls_preds_normalized=True,
        batch_label_preds=label_preds)
    ok = dets['indices'] >= 0
    safe = jnp.clip(dets['indices'], 0, None)
    dets['cls_scores'] = jnp.where(
        ok, jnp.take_along_axis(cls_preds, safe, axis=1), 0.0)
    dets['iou_scores'] = jnp.where(
        ok, jnp.take_along_axis(iou_max, safe, axis=1), 0.0)
    return dets


@functools.partial(jax.jit, static_argnames=('thresh_list', 'per_frame'))
def generate_recall_record_batch(pred_boxes, pred_count, gt_boxes,
                                 thresh_list=(0.3, 0.5, 0.7),
                                 per_frame=False):
    """Batched recall record: (B, P, 7) x (B,) x (B, T, 8) -> counts dict
    (one device round-trip per eval batch, not per frame). With
    ``per_frame=True`` each value is the (B,) per-frame vector instead of
    the batch sum — the eval loop needs per-frame counts to skip
    loader-padding duplicate frames."""
    recs = jax.vmap(lambda b, c, g: generate_recall_record(
        b, c, g, thresh_list=thresh_list))(pred_boxes, pred_count, gt_boxes)
    if per_frame:
        return recs
    return {k: jnp.sum(v) for k, v in recs.items()}


def generate_recall_record(pred_boxes, pred_count, gt_boxes,
                           thresh_list=(0.3, 0.5, 0.7)):
    """Recall bookkeeping vs gt for one frame (parity:
    ``Detector3DTemplate.generate_recall_record``, ``:294-336``).

    Args:
        pred_boxes: (P, 7) zero-padded; pred_count: () int; gt_boxes: (T, 8).
    Returns dict {recalled_<t>: int, gt: int}.
    """
    gt_valid = gt_boxes[:, 3] > 0
    num_gt = jnp.sum(gt_valid)
    iou = ops.boxes_iou3d(gt_boxes[:, :7], pred_boxes)      # (T, P)
    pred_valid = (jnp.arange(pred_boxes.shape[0]) < pred_count)[None, :]
    iou = jnp.where(pred_valid & gt_valid[:, None], iou, 0.0)
    best = jnp.max(iou, axis=1)
    out = {'gt': num_gt}
    for t in thresh_list:
        out[f'roi_{t}'] = jnp.sum((best > t) & gt_valid)
        out[f'rcnn_{t}'] = jnp.sum((best > t) & gt_valid)
    return out
