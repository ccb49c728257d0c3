"""Native Waymo mAP/mAPH and nuScenes NDS evaluators (numpy protocol
reimplementations of the absent official devkits)."""
import numpy as np
import pytest

from spsnet_tpu.eval.nuscenes_eval import nuscenes_evaluation
from spsnet_tpu.eval.waymo_eval import waymo_evaluation


def _frame(boxes, names, scores=None, difficulty=None):
    d = {'name': np.asarray(names),
         'boxes_lidar': np.asarray(boxes, np.float64)}
    if scores is not None:
        d['score'] = np.asarray(scores, np.float64)
    if difficulty is not None:
        d['difficulty'] = np.asarray(difficulty)
    return d


BOXES = np.array([[10.0, 5.0, 0.0, 4.0, 2.0, 1.5, 0.3],
                  [30.0, -8.0, 0.0, 4.2, 1.9, 1.6, -1.0],
                  [50.0, 2.0, -0.5, 0.8, 0.8, 1.7, 0.0]])


def test_waymo_perfect_detections():
    gt = [_frame(BOXES, ['Vehicle', 'Vehicle', 'Pedestrian'],
                 difficulty=[1, 2, 1])]
    dt = [_frame(BOXES, ['Vehicle', 'Vehicle', 'Pedestrian'],
                 scores=[0.9, 0.8, 0.7])]
    s, r = waymo_evaluation(gt, dt, ['Vehicle', 'Pedestrian'])
    assert r['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP'] == pytest.approx(1.0)
    assert r['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/APH'] == pytest.approx(1.0)
    # L1 has only the difficulty-1 vehicle; the difficulty-2 match is
    # ignored, not a FP -> still perfect
    assert r['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP'] == pytest.approx(1.0)
    assert r['OBJECT_TYPE_TYPE_PEDESTRIAN_LEVEL_2/AP'] == pytest.approx(1.0)


def test_waymo_heading_error_hits_aph_not_ap():
    gt = [_frame(BOXES[:1], ['Vehicle'])]
    flipped = BOXES[:1].copy()
    flipped[0, 6] += np.pi          # opposite heading: same IoU, worst APH
    dt = [_frame(flipped, ['Vehicle'], scores=[0.9])]
    s, r = waymo_evaluation(gt, dt, ['Vehicle'])
    assert r['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP'] == pytest.approx(1.0)
    assert r['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/APH'] == pytest.approx(
        0.0, abs=1e-6)


def test_waymo_false_positive_lowers_ap():
    gt = [_frame(BOXES[:1], ['Vehicle'])]
    fp = np.vstack([BOXES[0], BOXES[0] + [20, 20, 0, 0, 0, 0, 0]])
    dt = [_frame(fp, ['Vehicle', 'Vehicle'], scores=[0.9, 0.95])]
    s, r = waymo_evaluation(gt, dt, ['Vehicle'])
    # higher-scored FP comes first: precision at full recall is 0.5
    assert 0.3 < r['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP'] < 0.8


def test_nuscenes_perfect():
    gt = [_frame(BOXES, ['car', 'car', 'pedestrian'])]
    dt = [_frame(BOXES, ['car', 'car', 'pedestrian'],
                 scores=[0.9, 0.8, 0.7])]
    s, r = nuscenes_evaluation(gt, dt, ['car', 'pedestrian'])
    assert r['mAP'] == pytest.approx(1.0, abs=0.02)   # 101-pt grid rounding
    assert r['car/ATE'] == pytest.approx(0.0, abs=1e-9)
    assert r['car/ASE'] == pytest.approx(0.0, abs=1e-9)
    assert r['car/AOE'] == pytest.approx(0.0, abs=1e-9)
    # NDS = (5*mAP + 3 perfect TP scores) / 10: AVE is worst-case without
    # velocity in the boxes, AAE is unmodeled (documented deviations)
    assert r['NDS'] == pytest.approx((5 * r['mAP'] + 3.0) / 10.0, abs=1e-6)


def test_nuscenes_distance_thresholds():
    gt = [_frame(BOXES[:1], ['car'])]
    shifted = BOXES[:1].copy()
    shifted[0, 0] += 1.5            # matches at 2m/4m, misses 0.5m/1m
    dt = [_frame(shifted, ['car'], scores=[0.9])]
    s, r = nuscenes_evaluation(gt, dt, ['car'])
    assert 0.3 < r['car/AP'] < 0.7  # 2 of 4 thresholds match
    assert r['car/ATE'] == pytest.approx(1.5, abs=1e-6)


def test_nuscenes_scale_and_heading_errors():
    gt = [_frame(BOXES[:1], ['car'])]
    mod = BOXES[:1].copy()
    mod[0, 3:6] = mod[0, 3:6] * 0.5      # half-size box
    mod[0, 6] += 0.4
    dt = [_frame(mod, ['car'], scores=[0.9])]
    s, r = nuscenes_evaluation(gt, dt, ['car'])
    assert r['car/ASE'] == pytest.approx(1 - 0.125, abs=1e-6)
    assert r['car/AOE'] == pytest.approx(0.4, abs=1e-6)


def test_nuscenes_velocity_error_with_9dim_boxes():
    g = np.concatenate([BOXES[:1], [[1.0, 0.0]]], axis=1)
    d = np.concatenate([BOXES[:1], [[2.0, 1.0]]], axis=1)
    gt = [_frame(g, ['car'])]
    dt = [_frame(d, ['car'], scores=[0.9])]
    s, r = nuscenes_evaluation(gt, dt, ['car'])
    assert r['car/AVE'] == pytest.approx(np.sqrt(2.0), abs=1e-6)
