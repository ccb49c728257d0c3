"""Waymo-protocol detection metrics (mAP / mAPH, L1/L2) in pure numpy.

The reference shells out to the TensorFlow ``waymo_open_dataset`` metric ops
(``waymo_dataset.py`` 'waymo' eval branch) — unavailable offline. This is a
faithful numpy reimplementation of the protocol:

- per class, greedy score-ordered matching on 3D IoU (Vehicle 0.7,
  Pedestrian/Cyclist/Sign 0.5);
- LEVEL_1 = gts with difficulty <= 1 (annotated difficulty 2 boxes and
  boxes with <= 5 points are LEVEL_2); LEVEL_2 = all gts. Detections
  matched to an above-level gt are ignored rather than counted as FP,
  matching the official levels semantics;
- AP = area under the precision-recall curve (trapezoid over every
  operating point); mAPH weights every TP by its heading accuracy
  ``1 - |wrap(theta_dt - theta_gt)| / pi`` (predictions AND the precision
  numerator, per the official definition).
"""
from __future__ import annotations

import numpy as np

from .rotate_iou import d3_box_overlap

IOU_THRESH = {'Vehicle': 0.7, 'Car': 0.7, 'Pedestrian': 0.5, 'Cyclist': 0.5,
              'Sign': 0.5}


def _wrap(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


def _accumulate_class(gt_list, dt_list, cls_name, level):
    """Returns (scores, tp_flags, heading_acc, num_gt) across all frames."""
    scores, tps, haccs = [], [], []
    num_gt = 0
    thr = IOU_THRESH.get(cls_name, 0.5)
    for gt, dt in zip(gt_list, dt_list):
        g_mask = np.asarray(gt['name']) == cls_name
        g_boxes = np.asarray(gt['boxes_lidar'], np.float64).reshape(-1, 7)[
            g_mask[:len(gt['boxes_lidar'])]] if len(gt['name']) else \
            np.zeros((0, 7))
        g_diff = np.asarray(gt.get('difficulty',
                                   np.zeros(len(gt['name']))))[g_mask]
        d_mask = np.asarray(dt['name']) == cls_name
        d_boxes = np.asarray(dt['boxes_lidar'], np.float64).reshape(-1, 7)[
            d_mask[:len(dt['boxes_lidar'])]] if len(dt['name']) else \
            np.zeros((0, 7))
        d_scores = np.asarray(dt['score'])[d_mask]

        in_level = g_diff <= level if level == 1 else \
            np.ones(len(g_boxes), bool)
        num_gt += int(in_level.sum())

        if len(d_boxes) == 0:
            continue
        order = np.argsort(-d_scores)
        d_boxes = d_boxes[order]
        d_scores = d_scores[order]
        iou = d3_box_overlap(d_boxes, g_boxes, criterion=-1) \
            if len(g_boxes) else np.zeros((len(d_boxes), 0))

        taken = np.zeros(len(g_boxes), bool)
        for i in range(len(d_boxes)):
            j_best, best = -1, thr
            for j in range(len(g_boxes)):
                if not taken[j] and iou[i, j] >= best:
                    best, j_best = iou[i, j], j
            if j_best >= 0:
                taken[j_best] = True
                if in_level[j_best]:
                    dh = abs(_wrap(d_boxes[i, 6] - g_boxes[j_best, 6]))
                    scores.append(d_scores[i])
                    tps.append(1.0)
                    haccs.append(max(0.0, 1.0 - dh / np.pi))
                # match to an out-of-level gt: ignored entirely
            else:
                scores.append(d_scores[i])
                tps.append(0.0)
                haccs.append(0.0)
    return (np.asarray(scores), np.asarray(tps), np.asarray(haccs), num_gt)


def _ap_from_matches(scores, tps, weights, num_gt):
    """Area under the (recall, weighted precision) curve."""
    if num_gt == 0 or len(scores) == 0:
        return 0.0
    order = np.argsort(-scores)
    tps = tps[order]
    w = weights[order]
    cum_tp = np.cumsum(tps)
    cum_w = np.cumsum(w * tps)          # heading-weighted TPs only
    cum_fp = np.cumsum(1.0 - tps)
    recall = cum_tp / num_gt
    precision = cum_w / np.maximum(cum_tp + cum_fp, 1e-9)
    # envelope + trapezoid over recall
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    r = np.concatenate([[0.0], recall])
    p = np.concatenate([[precision[0] if len(precision) else 0.0], precision])
    return float(np.sum((r[1:] - r[:-1]) * p[1:]))


def waymo_evaluation(gt_annos, det_annos, class_names):
    """gt/det annos: per-frame dicts with name, boxes_lidar, score
    (det) and difficulty (gt, optional). Returns (result_str, result_dict)
    shaped like the reference's waymo-eval output keys."""
    result = {}
    lines = []
    for cls in class_names:
        for level in (1, 2):
            scores, tps, haccs, num_gt = _accumulate_class(
                gt_annos, det_annos, cls, level)
            ap = _ap_from_matches(scores, tps, np.ones_like(tps), num_gt)
            aph = _ap_from_matches(scores, tps, haccs, num_gt)
            key = f'OBJECT_TYPE_TYPE_{cls.upper()}_LEVEL_{level}'
            result[f'{key}/AP'] = ap
            result[f'{key}/APH'] = aph
            lines.append(f'{cls} LEVEL_{level}: mAP {ap:.4f} mAPH {aph:.4f}')
    return '\n'.join(lines), result
