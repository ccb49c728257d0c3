"""Official KITTI AP evaluation (R40 + R11), pure numpy.

Implements the published KITTI devkit protocol (the reference vendors it as
``pcdet/datasets/kitti/kitti_object_eval_python/eval.py``): per-class
difficulty filtering, greedy TP assignment with ignored/DontCare handling,
41-point score thresholds, AP over 2D bbox / BEV / 3D / AOS.

Output dict layout matches ``get_official_eval_result`` (``eval.py:639-746``)
so downstream tooling (tensorboard keys, BASELINE comparisons) is unchanged.
"""
from __future__ import annotations

import io

import numpy as np

from .rotate_iou import d3_box_overlap, image_box_overlap, rotate_iou_eval

try:  # native C++ fast path (spsnet_tpu/native); numpy fallback otherwise
    from ..native import (compute_statistics_native, d3_box_overlap_native,
                          get_lib, rotate_iou_eval_native)
    _NATIVE = get_lib() is not None
except Exception:
    _NATIVE = False

CLASS_NAMES = ['car', 'pedestrian', 'cyclist', 'van', 'person_sitting',
               'truck']
MIN_HEIGHT = [40, 25, 25]
MAX_OCCLUSION = [0, 1, 2]
MAX_TRUNCATION = [0.15, 0.3, 0.5]


def clean_data(gt_anno, dt_anno, current_class, difficulty):
    ignored_gt, ignored_dt, dc_bboxes = [], [], []
    current_cls_name = CLASS_NAMES[current_class].lower()
    num_gt = len(gt_anno['name'])
    num_dt = len(dt_anno['name'])
    num_valid_gt = 0
    for i in range(num_gt):
        bbox = gt_anno['bbox'][i]
        gt_name = gt_anno['name'][i].lower()
        height = bbox[3] - bbox[1]
        if gt_name == current_cls_name:
            valid_class = 1
        elif current_cls_name == 'pedestrian' and gt_name == 'person_sitting':
            valid_class = 0
        elif current_cls_name == 'car' and gt_name == 'van':
            valid_class = 0
        else:
            valid_class = -1
        ignore = (gt_anno['occluded'][i] > MAX_OCCLUSION[difficulty]
                  or gt_anno['truncated'][i] > MAX_TRUNCATION[difficulty]
                  or height <= MIN_HEIGHT[difficulty])
        if valid_class == 1 and not ignore:
            ignored_gt.append(0)
            num_valid_gt += 1
        elif valid_class == 0 or (ignore and valid_class == 1):
            ignored_gt.append(1)
        else:
            ignored_gt.append(-1)
        if gt_anno['name'][i] == 'DontCare':
            dc_bboxes.append(bbox)
    for i in range(num_dt):
        height = abs(dt_anno['bbox'][i, 3] - dt_anno['bbox'][i, 1])
        if dt_anno['name'][i].lower() == current_cls_name:
            valid_class = 1
        else:
            valid_class = -1
        if height < MIN_HEIGHT[difficulty]:
            ignored_dt.append(1)
        elif valid_class == 1:
            ignored_dt.append(0)
        else:
            ignored_dt.append(-1)
    return num_valid_gt, np.array(ignored_gt), np.array(ignored_dt), \
        np.array(dc_bboxes).reshape(-1, 4)


def get_thresholds(scores, num_gt, num_sample_pts=41):
    scores = np.sort(scores)[::-1]
    current_recall = 0.0
    thresholds = []
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        r_recall = (i + 2) / num_gt if i < len(scores) - 1 else l_recall
        if ((r_recall - current_recall) < (current_recall - l_recall)
                and i < len(scores) - 1):
            continue
        thresholds.append(score)
        current_recall += 1 / (num_sample_pts - 1.0)
    return np.array(thresholds)


NO_DETECTION = -10000000


def compute_statistics(overlaps, gt_datas, dt_datas, ignored_gt, ignored_det,
                       dc_bboxes, metric, min_overlap, thresh=0.0,
                       compute_fp=False, compute_aos=False):
    """One image, one threshold (devkit ``compute_statistics_jit``).

    overlaps: (num_dt, num_gt); gt_datas (num_gt, 5); dt_datas (num_dt, 6).
    """
    if _NATIVE:
        return compute_statistics_native(
            overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc_bboxes,
            metric, min_overlap, thresh=thresh, compute_fp=compute_fp,
            compute_aos=compute_aos)
    det_size = dt_datas.shape[0]
    gt_size = gt_datas.shape[0]
    dt_scores = dt_datas[:, -1]
    dt_alphas = dt_datas[:, 4]
    gt_alphas = gt_datas[:, 4]
    dt_bboxes = dt_datas[:, :4]

    ignored_threshold = dt_scores < thresh

    assigned_detection = np.zeros(det_size, dtype=bool)
    tp = fp = fn = similarity = 0
    thresholds = np.zeros(gt_size)
    delta = np.zeros(gt_size)
    thresh_idx = delta_idx = 0

    for i in range(gt_size):
        if ignored_gt[i] == -1:
            continue
        det_idx = -1
        valid_detection = NO_DETECTION
        max_overlap = 0.0
        assigned_ignored_det = False
        for j in range(det_size):
            if ignored_det[j] == -1 or assigned_detection[j] \
                    or ignored_threshold[j]:
                continue
            overlap = overlaps[j, i]
            dt_score = dt_scores[j]
            if not compute_fp and overlap > min_overlap \
                    and dt_score > valid_detection:
                det_idx = j
                valid_detection = dt_score
            elif compute_fp and overlap > min_overlap \
                    and (overlap > max_overlap or assigned_ignored_det) \
                    and ignored_det[j] == 0:
                max_overlap = overlap
                det_idx = j
                valid_detection = 1
                assigned_ignored_det = False
            elif compute_fp and overlap > min_overlap \
                    and valid_detection == NO_DETECTION \
                    and ignored_det[j] == 1:
                det_idx = j
                valid_detection = 1
                assigned_ignored_det = True
        if valid_detection == NO_DETECTION and ignored_gt[i] == 0:
            fn += 1
        elif valid_detection != NO_DETECTION and \
                (ignored_gt[i] == 1 or ignored_det[det_idx] == 1):
            assigned_detection[det_idx] = True
        elif valid_detection != NO_DETECTION:
            tp += 1
            thresholds[thresh_idx] = dt_scores[det_idx]
            thresh_idx += 1
            if compute_aos:
                delta[delta_idx] = gt_alphas[i] - dt_alphas[det_idx]
                delta_idx += 1
            assigned_detection[det_idx] = True

    if compute_fp:
        for j in range(det_size):
            if not (assigned_detection[j] or ignored_det[j] in (-1, 1)
                    or ignored_threshold[j]):
                fp += 1
        nstuff = 0
        if metric == 0 and len(dc_bboxes) > 0:
            overlaps_dt_dc = image_box_overlap(dt_bboxes, dc_bboxes, 0)
            for i in range(len(dc_bboxes)):
                for j in range(det_size):
                    if assigned_detection[j] or ignored_det[j] in (-1, 1) \
                            or ignored_threshold[j]:
                        continue
                    if overlaps_dt_dc[j, i] > min_overlap:
                        fp -= 1
                        nstuff += 1
                        assigned_detection[j] = True
        if compute_aos:
            tmp = np.zeros(fp + delta_idx)
            tmp[fp:] = (1.0 + np.cos(delta[:delta_idx])) / 2.0
            if tp > 0 or fp > 0:
                similarity = np.sum(tmp)
            else:
                similarity = -1
    return tp, fp, fn, similarity, thresholds[:thresh_idx]


def _prepare_image_data(gt_annos, dt_annos, metric):
    """Per-image IoU matrices (dt x gt) for one metric over all images."""
    overlaps = []
    for gt, dt in zip(gt_annos, dt_annos):
        if metric == 0:
            ov = image_box_overlap(np.asarray(dt['bbox']).reshape(-1, 4),
                                   np.asarray(gt['bbox']).reshape(-1, 4))
        elif metric == 1:
            loc_g = np.asarray(gt['location']).reshape(-1, 3)
            dim_g = np.asarray(gt['dimensions']).reshape(-1, 3)
            rot_g = np.asarray(gt['rotation_y']).reshape(-1)
            loc_d = np.asarray(dt['location']).reshape(-1, 3)
            dim_d = np.asarray(dt['dimensions']).reshape(-1, 3)
            rot_d = np.asarray(dt['rotation_y']).reshape(-1)
            gt_bev = np.concatenate(
                [loc_g[:, [0, 2]], dim_g[:, [0, 2]], rot_g[:, None]], axis=1)
            dt_bev = np.concatenate(
                [loc_d[:, [0, 2]], dim_d[:, [0, 2]], rot_d[:, None]], axis=1)
            fn_bev = rotate_iou_eval_native if _NATIVE else rotate_iou_eval
            ov = fn_bev(dt_bev, gt_bev, criterion=-1)
        else:
            gt_boxes = np.concatenate(
                [np.asarray(gt['location']).reshape(-1, 3),
                 np.asarray(gt['dimensions']).reshape(-1, 3)[:, [0, 1, 2]],
                 np.asarray(gt['rotation_y']).reshape(-1, 1)], axis=1)
            dt_boxes = np.concatenate(
                [np.asarray(dt['location']).reshape(-1, 3),
                 np.asarray(dt['dimensions']).reshape(-1, 3)[:, [0, 1, 2]],
                 np.asarray(dt['rotation_y']).reshape(-1, 1)], axis=1)
            # reorder to [x, y, z, l, h, w, ry]: dims stored as l, h, w already
            fn_3d = d3_box_overlap_native if _NATIVE else d3_box_overlap
            ov = fn_3d(dt_boxes, gt_boxes, criterion=-1)
        overlaps.append(ov)
    return overlaps


def eval_class(gt_annos, dt_annos, current_classes, difficultys, metric,
               min_overlaps, compute_aos=False, num_sample_pts=41):
    """Devkit ``eval_class``: returns precision/aos arrays of shape
    (num_class, num_difficulty, num_minoverlap, num_sample_pts)."""
    assert len(gt_annos) == len(dt_annos)
    num_examples = len(gt_annos)
    overlaps = _prepare_image_data(gt_annos, dt_annos, metric)

    num_minoverlap = len(min_overlaps)
    num_class = len(current_classes)
    num_difficulty = len(difficultys)
    precision = np.zeros(
        [num_class, num_difficulty, num_minoverlap, num_sample_pts])
    recall = np.zeros_like(precision)
    aos = np.zeros_like(precision)

    for m, current_class in enumerate(current_classes):
        for ld, difficulty in enumerate(difficultys):
            rets = [clean_data(gt_annos[i], dt_annos[i], current_class,
                               difficulty) for i in range(num_examples)]
            gt_datas_list, dt_datas_list = [], []
            ignored_gts, ignored_dets, dontcares = [], [], []
            total_num_valid_gt = 0
            for i, (num_valid_gt, ignored_gt, ignored_det, dc) in enumerate(rets):
                gt = gt_annos[i]
                dt = dt_annos[i]
                gt_datas = np.concatenate(
                    [np.asarray(gt['bbox']).reshape(-1, 4),
                     np.asarray(gt['alpha']).reshape(-1, 1)], axis=1)
                dt_datas = np.concatenate(
                    [np.asarray(dt['bbox']).reshape(-1, 4),
                     np.asarray(dt['alpha']).reshape(-1, 1),
                     np.asarray(dt['score']).reshape(-1, 1)], axis=1)
                gt_datas_list.append(gt_datas)
                dt_datas_list.append(dt_datas)
                ignored_gts.append(ignored_gt)
                ignored_dets.append(ignored_det)
                dontcares.append(dc)
                total_num_valid_gt += num_valid_gt

            for k, min_overlap in enumerate(min_overlaps[:, metric, m]
                                            if min_overlaps.ndim == 3
                                            else min_overlaps):
                # pass 1: collect tp scores -> thresholds
                thresholdss = []
                for i in range(num_examples):
                    _, _, _, _, th = compute_statistics(
                        overlaps[i], gt_datas_list[i], dt_datas_list[i],
                        ignored_gts[i], ignored_dets[i], dontcares[i],
                        metric, min_overlap, thresh=0.0, compute_fp=False)
                    thresholdss.append(th)
                thresholdss = np.concatenate(thresholdss)
                if total_num_valid_gt == 0:
                    continue
                thresholds = get_thresholds(thresholdss, total_num_valid_gt,
                                            num_sample_pts)
                # pass 2: pr curve
                pr = np.zeros([len(thresholds), 4])
                for i in range(num_examples):
                    for t, thresh in enumerate(thresholds):
                        tp, fp, fn, sim, _ = compute_statistics(
                            overlaps[i], gt_datas_list[i], dt_datas_list[i],
                            ignored_gts[i], ignored_dets[i], dontcares[i],
                            metric, min_overlap, thresh=thresh,
                            compute_fp=True, compute_aos=compute_aos)
                        pr[t, 0] += tp
                        pr[t, 1] += fp
                        pr[t, 2] += fn
                        if sim != -1:
                            pr[t, 3] += sim
                for t in range(len(thresholds)):
                    recall[m, ld, k, t] = pr[t, 0] / (pr[t, 0] + pr[t, 2])
                    precision[m, ld, k, t] = pr[t, 0] / (pr[t, 0] + pr[t, 1])
                    if compute_aos:
                        aos[m, ld, k, t] = pr[t, 3] / (pr[t, 0] + pr[t, 1])
                for t in range(len(thresholds)):
                    precision[m, ld, k, t] = np.max(
                        precision[m, ld, k, t:], axis=-1)
                    recall[m, ld, k, t] = np.max(recall[m, ld, k, t:], axis=-1)
                    if compute_aos:
                        aos[m, ld, k, t] = np.max(aos[m, ld, k, t:], axis=-1)
    return {'recall': recall, 'precision': precision, 'orientation': aos}


def get_mAP(prec):
    sums = 0
    for i in range(0, prec.shape[-1], 4):
        sums = sums + prec[..., i]
    return sums / 11 * 100


def get_mAP_R40(prec):
    sums = 0
    for i in range(1, prec.shape[-1]):
        sums = sums + prec[..., i]
    return sums / 40 * 100


def do_eval(gt_annos, dt_annos, current_classes, min_overlaps,
            compute_aos=False):
    difficultys = [0, 1, 2]
    ret = eval_class(gt_annos, dt_annos, current_classes, difficultys, 0,
                     min_overlaps, compute_aos)
    mAP_bbox = get_mAP(ret['precision'])
    mAP_bbox_R40 = get_mAP_R40(ret['precision'])
    mAP_aos = mAP_aos_R40 = None
    if compute_aos:
        mAP_aos = get_mAP(ret['orientation'])
        mAP_aos_R40 = get_mAP_R40(ret['orientation'])
    ret = eval_class(gt_annos, dt_annos, current_classes, difficultys, 1,
                     min_overlaps)
    mAP_bev = get_mAP(ret['precision'])
    mAP_bev_R40 = get_mAP_R40(ret['precision'])
    ret = eval_class(gt_annos, dt_annos, current_classes, difficultys, 2,
                     min_overlaps)
    mAP_3d = get_mAP(ret['precision'])
    mAP_3d_R40 = get_mAP_R40(ret['precision'])
    return mAP_bbox, mAP_bev, mAP_3d, mAP_aos, \
        mAP_bbox_R40, mAP_bev_R40, mAP_3d_R40, mAP_aos_R40


def get_official_eval_result(gt_annos, dt_annos, current_classes):
    """Devkit entry point; returns (result string, tensorboard dict) with the
    same keys as the reference (``eval.py:639-746``)."""
    overlap_0_7 = np.array([[0.7, 0.5, 0.5, 0.7, 0.5, 0.7],
                            [0.7, 0.5, 0.5, 0.7, 0.5, 0.7],
                            [0.7, 0.5, 0.5, 0.7, 0.5, 0.7]])
    overlap_0_5 = np.array([[0.7, 0.5, 0.5, 0.7, 0.5, 0.5],
                            [0.5, 0.25, 0.25, 0.5, 0.25, 0.5],
                            [0.5, 0.25, 0.25, 0.5, 0.25, 0.5]])
    min_overlaps = np.stack([overlap_0_7, overlap_0_5], axis=0)  # (2, 3, 6)
    class_to_name = {0: 'Car', 1: 'Pedestrian', 2: 'Cyclist', 3: 'Van',
                     4: 'Person_sitting', 5: 'Truck'}
    name_to_class = {v: n for n, v in class_to_name.items()}
    if not isinstance(current_classes, (list, tuple)):
        current_classes = [current_classes]
    current_classes_int = []
    for curcls in current_classes:
        if isinstance(curcls, str):
            current_classes_int.append(name_to_class[curcls])
        else:
            current_classes_int.append(curcls)
    current_classes = current_classes_int
    min_overlaps = min_overlaps[:, :, current_classes]

    compute_aos = False
    for anno in dt_annos:
        if len(anno['name']) != 0:
            if anno['alpha'].shape[0] != 0 and anno['alpha'][0] != -10:
                compute_aos = True
            break

    result = io.StringIO()
    ret_dict = {}
    mAPbbox, mAPbev, mAP3d, mAPaos, mAPbbox_R40, mAPbev_R40, mAP3d_R40, \
        mAPaos_R40 = do_eval(gt_annos, dt_annos, current_classes,
                             min_overlaps, compute_aos)
    # mAP* shape: (num_class, num_difficulty, num_minoverlap=2)
    for j in range(min_overlaps.shape[0]):
        for m, curcls in enumerate(current_classes):
            cls_name = class_to_name[curcls]
            print(f'{cls_name} AP@{min_overlaps[j, 0, m]:.2f}, '
                  f'{min_overlaps[j, 1, m]:.2f}, {min_overlaps[j, 2, m]:.2f}:',
                  file=result)
            print(f'bbox AP:{mAPbbox[m, 0, j]:.4f}, {mAPbbox[m, 1, j]:.4f}, '
                  f'{mAPbbox[m, 2, j]:.4f}', file=result)
            print(f'bev  AP:{mAPbev[m, 0, j]:.4f}, {mAPbev[m, 1, j]:.4f}, '
                  f'{mAPbev[m, 2, j]:.4f}', file=result)
            print(f'3d   AP:{mAP3d[m, 0, j]:.4f}, {mAP3d[m, 1, j]:.4f}, '
                  f'{mAP3d[m, 2, j]:.4f}', file=result)
            if compute_aos:
                print(f'aos  AP:{mAPaos[m, 0, j]:.2f}, {mAPaos[m, 1, j]:.2f}, '
                      f'{mAPaos[m, 2, j]:.2f}', file=result)
            print(f'{cls_name} AP_R40@{min_overlaps[j, 0, m]:.2f}, '
                  f'{min_overlaps[j, 1, m]:.2f}, {min_overlaps[j, 2, m]:.2f}:',
                  file=result)
            print(f'bbox AP:{mAPbbox_R40[m, 0, j]:.4f}, '
                  f'{mAPbbox_R40[m, 1, j]:.4f}, {mAPbbox_R40[m, 2, j]:.4f}',
                  file=result)
            print(f'bev  AP:{mAPbev_R40[m, 0, j]:.4f}, '
                  f'{mAPbev_R40[m, 1, j]:.4f}, {mAPbev_R40[m, 2, j]:.4f}',
                  file=result)
            print(f'3d   AP:{mAP3d_R40[m, 0, j]:.4f}, '
                  f'{mAP3d_R40[m, 1, j]:.4f}, {mAP3d_R40[m, 2, j]:.4f}',
                  file=result)
            if compute_aos:
                print(f'aos  AP:{mAPaos_R40[m, 0, j]:.2f}, '
                      f'{mAPaos_R40[m, 1, j]:.2f}, {mAPaos_R40[m, 2, j]:.2f}',
                      file=result)
            if j == 0:  # strict-overlap setting feeds the tb dict
                for d, dname in enumerate(['easy', 'moderate', 'hard']):
                    ret_dict[f'{cls_name}_3d/{dname}'] = mAP3d[m, d, 0]
                    ret_dict[f'{cls_name}_3d/{dname}_R40'] = mAP3d_R40[m, d, 0]
                    ret_dict[f'{cls_name}_bev/{dname}'] = mAPbev[m, d, 0]
                    ret_dict[f'{cls_name}_bev/{dname}_R40'] = mAPbev_R40[m, d, 0]
                    ret_dict[f'{cls_name}_image/{dname}'] = mAPbbox[m, d, 0]
                    ret_dict[f'{cls_name}_image/{dname}_R40'] = mAPbbox_R40[m, d, 0]
                    if compute_aos:
                        ret_dict[f'{cls_name}_aos/{dname}'] = mAPaos[m, d, 0]
                        ret_dict[f'{cls_name}_aos/{dname}_R40'] = \
                            mAPaos_R40[m, d, 0]
    return result.getvalue(), ret_dict
