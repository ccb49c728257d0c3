"""nuScenes detection metrics (mAP by center distance + TP errors + NDS)
in pure numpy.

The reference calls the ``nuscenes-devkit`` (``nuscenes_dataset.py``
evaluation) — unavailable offline. Protocol reimplementation:

- matching by BEV center distance at thresholds {0.5, 1, 2, 4} m, greedy in
  score order, one gt per detection;
- per-class AP = normalized area of the precision/recall curve restricted
  to recall/precision > 0.1 (the devkit's clipped AP);
- TP errors at the 2.0 m threshold over true positives: ATE (BEV center
  distance, m), ASE (1 - IoU of aligned, axis-centered boxes), AOE (wrapped
  |heading error|, rad; period pi for barriers — not modeled here),
  AVE (velocity L2, if 9-dim boxes carry vx, vy), AAE (attribute err —
  attributes are not modeled, contributes its worst-case 1.0 unless given);
- NDS = (5 * mAP + sum_k (1 - min(1, mTP_k))) / 10 with the devkit's
  normalizers.
"""
from __future__ import annotations

import numpy as np

DIST_THRESHS = (0.5, 1.0, 2.0, 4.0)
TP_THRESH = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1


def _aligned_iou(dt_box, gt_box):
    """IoU of the two boxes translated to the origin and axis-aligned
    (the devkit's scale-error IoU)."""
    inter = np.prod(np.minimum(dt_box[3:6], gt_box[3:6]))
    union = np.prod(dt_box[3:6]) + np.prod(gt_box[3:6]) - inter
    return inter / max(union, 1e-9)


def _wrap(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


def _match_class(gt_list, dt_list, cls, thresh):
    """Greedy center-distance matching. Returns per-detection
    (score, tp, ate, ase, aoe, ave) rows + num_gt."""
    rows = []
    num_gt = 0
    for gt, dt in zip(gt_list, dt_list):
        g_mask = np.asarray(gt['name']) == cls
        g = np.asarray(gt['boxes_lidar'], np.float64).reshape(
            len(gt['name']), -1)[g_mask] if len(gt['name']) else \
            np.zeros((0, 7))
        num_gt += len(g)
        d_mask = np.asarray(dt['name']) == cls
        d = np.asarray(dt['boxes_lidar'], np.float64).reshape(
            len(dt['name']), -1)[d_mask] if len(dt['name']) else \
            np.zeros((0, 7))
        sc = np.asarray(dt['score'])[d_mask]
        if len(d) == 0:
            continue
        order = np.argsort(-sc)
        d, sc = d[order], sc[order]
        dist = np.linalg.norm(d[:, None, :2] - g[None, :, :2], axis=-1) \
            if len(g) else np.zeros((len(d), 0))
        taken = np.zeros(len(g), bool)
        for i in range(len(d)):
            j_best, best = -1, thresh
            for j in range(len(g)):
                if not taken[j] and dist[i, j] < best:
                    best, j_best = dist[i, j], j
            if j_best >= 0:
                taken[j_best] = True
                ate = best
                ase = 1.0 - _aligned_iou(d[i], g[j_best])
                aoe = abs(_wrap(d[i, 6] - g[j_best, 6]))
                ave = np.linalg.norm(d[i, 7:9] - g[j_best, 7:9]) \
                    if d.shape[1] >= 9 and g.shape[1] >= 9 else np.nan
                rows.append((sc[i], 1.0, ate, ase, aoe, ave))
            else:
                rows.append((sc[i], 0.0, 0, 0, 0, 0))
    return np.asarray(rows, np.float64).reshape(-1, 6), num_gt


def _clipped_ap(rows, num_gt):
    """devkit AP: 101-point recall grid, precision clipped at 0.1 and
    renormalized, recall below 0.1 stripped."""
    if num_gt == 0 or len(rows) == 0:
        return 0.0
    order = np.argsort(-rows[:, 0])
    tp = rows[order, 1]
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(1 - tp)
    recall = cum_tp / num_gt
    prec = cum_tp / np.maximum(cum_tp + cum_fp, 1e-9)
    r_grid = np.linspace(0, 1, 101)
    p = np.interp(r_grid, recall, prec, right=0.0)
    # devkit calc_ap: drop samples at recall <= 0.1, clip precision at 0.1,
    # mean over the remaining grid, renormalize
    p = np.clip(p - MIN_PRECISION, 0.0, None) / (1 - MIN_PRECISION)
    keep = p[int(round(100 * MIN_RECALL)) + 1:]
    return float(keep.mean()) if len(keep) else 0.0


def nuscenes_evaluation(gt_annos, det_annos, class_names):
    """Returns (result_str, dict) with per-class AP/TP errors, mAP, NDS."""
    result = {}
    aps = []
    tp_errs = {'ATE': [], 'ASE': [], 'AOE': [], 'AVE': []}
    norms = {'ATE': 0.5, 'ASE': 1.0, 'AOE': np.pi / 2, 'AVE': 1.0}
    for cls in class_names:
        cls_aps = []
        for thr in DIST_THRESHS:
            rows, num_gt = _match_class(gt_annos, det_annos, cls, thr)
            cls_aps.append(_clipped_ap(rows, num_gt))
        ap = float(np.mean(cls_aps))
        result[f'{cls}/AP'] = ap
        aps.append(ap)
        rows, num_gt = _match_class(gt_annos, det_annos, cls, TP_THRESH)
        tp_rows = rows[rows[:, 1] > 0]
        if len(tp_rows):
            result[f'{cls}/ATE'] = float(tp_rows[:, 2].mean())
            result[f'{cls}/ASE'] = float(tp_rows[:, 3].mean())
            result[f'{cls}/AOE'] = float(tp_rows[:, 4].mean())
            ave = tp_rows[:, 5]
            ave = ave[~np.isnan(ave)]
            result[f'{cls}/AVE'] = float(ave.mean()) if len(ave) else 1.0
            for k in tp_errs:
                tp_errs[k].append(result[f'{cls}/{k}'])
        else:
            for k in tp_errs:
                result[f'{cls}/{k}'] = 1.0
                tp_errs[k].append(1.0)

    mAP = float(np.mean(aps)) if aps else 0.0
    tp_score = 0.0
    for k, errs in tp_errs.items():
        m = float(np.mean(errs)) if errs else 1.0
        result[f'm{k}'] = m
        tp_score += max(0.0, 1.0 - min(1.0, m / norms[k]))
    # devkit uses 5 TP metrics (incl. AAE); attributes are not modeled, so
    # AAE contributes its worst case — documented deviation
    nds = (5.0 * mAP + tp_score + 0.0) / 10.0
    result['mAP'] = mAP
    result['NDS'] = nds
    lines = [f'{c}: AP {result[f"{c}/AP"]:.4f}' for c in class_names]
    lines.append(f'mAP: {mAP:.4f}  NDS: {nds:.4f}')
    return '\n'.join(lines), result
