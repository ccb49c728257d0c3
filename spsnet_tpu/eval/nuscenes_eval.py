"""nuScenes detection metrics (mAP by center distance + TP errors + NDS)
in pure numpy, faithful to the official devkit algorithms.

The reference calls the ``nuscenes-devkit`` (``nuscenes_dataset.py``
evaluation) — unavailable offline. This reimplements the devkit's
``detection/algo.py`` (accumulate / calc_ap / calc_tp) and
``detection/evaluate.py`` aggregation exactly:

- matching by BEV center distance at thresholds {0.5, 1, 2, 4} m, greedy in
  GLOBAL score order, nearest unmatched same-class gt in the detection's own
  frame (``algo.py accumulate``);
- per-class AP: precision interpolated onto the 101-point recall grid
  (``np.interp(rec_grid, rec, prec, right=0)``), samples at recall <= 0.1
  dropped, precision clipped at 0.1 and renormalized (``algo.py calc_ap``);
- TP errors at the 2.0 m threshold: CUMULATIVE-MEAN curves over the matches
  (score-ordered), interpolated onto the confidence-at-recall grid, then
  averaged from recall 0.1 to the max achieved recall
  (``algo.py calc_tp`` with ``max_recall_ind`` = last nonzero confidence);
  a class with no matches scores the worst-case 1.0;
- per-metric errors: ATE = BEV center distance (m), ASE = 1 - IoU of
  aligned origin-centered boxes, AOE = wrapped |heading error| (period pi
  for barrier), AVE = velocity L2 (needs 9-dim boxes), AAE = 1 - attribute
  accuracy (needs ``attr_name`` arrays on both sides);
- devkit exclusion table (``evaluate.py``): traffic_cone has no
  AOE/AVE/AAE, barrier no AVE/AAE — NaN, dropped from the class mean;
- NDS = (5 * mAP + sum_k max(0, 1 - mTP_k)) / (5 + K) with the RAW metric
  values (no per-metric normalizers — the devkit has none). K = 5 when all
  TP metrics are available. DEVIATION: when velocity or attributes are not
  modeled by the head at all (every class NaN for that metric), the metric
  is excluded from both numerator and denominator instead of contributing
  its worst case — stated in the result dict via ``NDS_tp_metrics``.
"""
from __future__ import annotations

import numpy as np

DIST_THRESHS = (0.5, 1.0, 2.0, 4.0)
TP_THRESH = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1
N_GRID = 101
TP_METRICS = ('ATE', 'ASE', 'AOE', 'AVE', 'AAE')
# devkit evaluate.py: class/metric combos defined as NaN
LEAVE_OUT = {'traffic_cone': {'AOE', 'AVE', 'AAE'},
             'barrier': {'AVE', 'AAE'}}


def _aligned_iou(dt_box, gt_box):
    """IoU of the two boxes translated to the origin and axis-aligned
    (the devkit's scale_iou)."""
    inter = np.prod(np.minimum(dt_box[3:6], gt_box[3:6]))
    union = np.prod(dt_box[3:6]) + np.prod(gt_box[3:6]) - inter
    return inter / max(union, 1e-9)


def _wrap(a, period=2 * np.pi):
    a = a % period
    return min(a, period - a)


def _cummean(x):
    """devkit utils.cummean: running mean ignoring NaNs; all-NaN -> ones."""
    x = np.asarray(x, np.float64)
    if np.isnan(x).all():
        return np.ones(len(x))
    s = np.nancumsum(x)
    c = np.cumsum(~np.isnan(x)).astype(np.float64)
    return np.divide(s, c, out=np.zeros_like(s), where=c != 0)


def _frame_arrays(anno, cls):
    """(boxes, scores, attrs) rows of ``anno`` whose name == cls."""
    names = np.asarray(anno['name'])
    m = names == cls
    boxes = np.asarray(anno['boxes_lidar'], np.float64)
    boxes = boxes.reshape(len(names), -1)[m] if len(names) else \
        np.zeros((0, 7))
    scores = np.asarray(anno['score'])[m] if 'score' in anno else None
    attrs = (np.asarray(anno['attr_name'])[m]
             if 'attr_name' in anno and len(np.asarray(anno['attr_name']))
             else None)
    return boxes, scores, attrs


def _accumulate(gt_annos, det_annos, cls, dist_th):
    """devkit algo.accumulate. Returns dict with the 101-point rec grid's
    ``prec``/``conf`` plus interpolated cummean TP-error curves, or None for
    the devkit's ``MetricData.no_predictions`` case (npos == 0, no dets, or
    no matches)."""
    frames = []
    npos = 0
    dets = []                       # (score, frame_idx, row_idx)
    for fi, (gt, dt) in enumerate(zip(gt_annos, det_annos)):
        g_boxes, _, g_attrs = _frame_arrays(gt, cls)
        d_boxes, d_scores, d_attrs = _frame_arrays(dt, cls)
        npos += len(g_boxes)
        frames.append((g_boxes, g_attrs, d_boxes, d_attrs))
        for ri in range(len(d_boxes)):
            dets.append((float(d_scores[ri]), fi, ri))
    if npos == 0 or not dets:
        return None
    dets.sort(key=lambda r: -r[0])

    taken = [np.zeros(len(f[0]), bool) for f in frames]
    tp, conf = [], []
    match = {k: [] for k in TP_METRICS}
    match_conf = []
    for score, fi, ri in dets:
        g_boxes, g_attrs, d_boxes, d_attrs = frames[fi]
        d = d_boxes[ri]
        free = ~taken[fi]
        conf.append(score)
        if free.any():
            dist = np.linalg.norm(g_boxes[free, :2] - d[:2], axis=-1)
            k = int(np.argmin(dist))
            if dist[k] < dist_th:
                j = np.flatnonzero(free)[k]
                taken[fi][j] = True
                g = g_boxes[j]
                tp.append(1.0)
                match['ATE'].append(dist[k])
                match['ASE'].append(1.0 - _aligned_iou(d, g))
                period = np.pi if cls == 'barrier' else 2 * np.pi
                match['AOE'].append(_wrap(d[6] - g[6], period))
                match['AVE'].append(
                    float(np.linalg.norm(d[7:9] - g[7:9]))
                    if len(d) >= 9 and len(g) >= 9 else np.nan)
                # devkit attr_acc: gt annotations without attributes ('')
                # yield NaN and are skipped by cummean, not counted as errors
                match['AAE'].append(
                    float(d_attrs[ri] != g_attrs[j])
                    if d_attrs is not None and g_attrs is not None
                    and g_attrs[j] != '' else np.nan)
                match_conf.append(score)
                continue
        tp.append(0.0)
    if not match_conf:
        return None

    tp = np.asarray(tp)
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(1.0 - tp)
    prec = cum_tp / (cum_tp + cum_fp)
    rec = cum_tp / npos
    grid = np.linspace(0, 1, N_GRID)
    prec_g = np.interp(grid, rec, prec, right=0.0)
    conf_g = np.interp(grid, rec, np.asarray(conf), right=0.0)
    out = {'prec': prec_g, 'conf': conf_g}
    mc = np.asarray(match_conf)
    for k in TP_METRICS:
        curve = _cummean(match[k])
        # interp is over ascending confidence (devkit reverses both sides)
        out[k] = np.interp(conf_g[::-1], mc[::-1], curve[::-1])[::-1]
        if np.isnan(match[k]).all():
            out[k] = np.full(N_GRID, np.nan)   # metric not modeled
    return out


def _calc_ap(md):
    """devkit algo.calc_ap."""
    if md is None:
        return 0.0
    p = md['prec'][round(100 * MIN_RECALL) + 1:].copy()
    p -= MIN_PRECISION
    p[p < 0] = 0.0
    return float(p.mean()) / (1.0 - MIN_PRECISION)


def _calc_tp(md, metric):
    """devkit algo.calc_tp: mean of the error curve from min_recall to the
    max achieved recall (last nonzero confidence)."""
    if md is None:
        return 1.0
    first = round(100 * MIN_RECALL) + 1
    nz = np.nonzero(md['conf'])[0]
    last = int(nz[-1]) if len(nz) else 0
    if last < first:
        return 1.0
    return float(np.mean(md[metric][first:last + 1]))


def nuscenes_evaluation(gt_annos, det_annos, class_names):
    """gt/det annos: per-frame dicts with ``name``, ``boxes_lidar``
    (7- or 9-dim; 9-dim carries vx,vy), ``score`` (det) and optionally
    ``attr_name``. Returns (result_str, dict) with per-class AP/TP errors,
    mAP, NDS."""
    result = {}
    aps = []
    class_tp = {k: [] for k in TP_METRICS}
    for cls in class_names:
        cls_aps = [_calc_ap(_accumulate(gt_annos, det_annos, cls, thr))
                   for thr in DIST_THRESHS]
        ap = float(np.mean(cls_aps))
        result[f'{cls}/AP'] = ap
        aps.append(ap)
        md = _accumulate(gt_annos, det_annos, cls, TP_THRESH)
        for k in TP_METRICS:
            if k in LEAVE_OUT.get(cls, ()):
                v = np.nan
            else:
                v = _calc_tp(md, k)
                if md is not None and np.isnan(md[k]).all():
                    v = np.nan                 # not modeled (no vel/attrs)
            result[f'{cls}/{k}'] = v
            class_tp[k].append(v)

    mAP = float(np.mean(aps)) if aps else 0.0
    tp_score, n_tp = 0.0, 0
    used = []
    for k in TP_METRICS:
        vals = np.asarray(class_tp[k], np.float64)
        m = float(np.nanmean(vals)) if not np.isnan(vals).all() else np.nan
        result[f'm{k}'] = m
        if not np.isnan(m):
            tp_score += max(0.0, 1.0 - min(1.0, m))
            n_tp += 1
            used.append(k)
    nds = (5.0 * mAP + tp_score) / (5.0 + n_tp) if (aps or n_tp) else 0.0
    result['mAP'] = mAP
    result['NDS'] = nds
    result['NDS_tp_metrics'] = ','.join(used)
    lines = [f'{c}: AP {result[f"{c}/AP"]:.4f}' for c in class_names]
    lines.append(f'mAP: {mAP:.4f}  NDS: {nds:.4f} '
                 f'(TP metrics: {result["NDS_tp_metrics"]})')
    return '\n'.join(lines), result
