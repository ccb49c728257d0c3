"""KITTI AP evaluator sanity: perfect predictions -> ~100 AP; misses lower it."""
import numpy as np

from spsnet_tpu.eval.kitti_eval import get_official_eval_result


def _make_annos(rng, n_frames=12, perfect=True):
    gt_annos, dt_annos = [], []
    for _ in range(n_frames):
        n = rng.integers(2, 6)
        loc = np.stack([rng.uniform(-10, 10, n), rng.uniform(1.2, 1.8, n),
                        rng.uniform(8, 40, n)], axis=1)
        dims = np.stack([rng.uniform(3.5, 4.5, n), rng.uniform(1.4, 1.7, n),
                         rng.uniform(1.5, 1.8, n)], axis=1)  # l, h, w
        rots = rng.uniform(-np.pi, np.pi, n)
        bbox = np.stack([rng.uniform(0, 500, n), rng.uniform(0, 100, n),
                         np.zeros(n), np.zeros(n)], axis=1)
        bbox[:, 2] = bbox[:, 0] + rng.uniform(60, 120, n)
        bbox[:, 3] = bbox[:, 1] + rng.uniform(50, 80, n)   # height >= 40: easy
        alpha = rng.uniform(-np.pi, np.pi, n)
        gt = {'name': np.array(['Car'] * n), 'truncated': np.zeros(n),
              'occluded': np.zeros(n), 'alpha': alpha, 'bbox': bbox,
              'dimensions': dims, 'location': loc, 'rotation_y': rots,
              'difficulty': np.zeros(n, dtype=np.int32)}
        gt_annos.append(gt)
        if perfect:
            dt = {k: (v.copy() if isinstance(v, np.ndarray) else v)
                  for k, v in gt.items()}
            dt['score'] = rng.uniform(0.5, 1.0, n)
        else:
            keep = slice(0, max(1, n // 2))
            dt = {k: (v[keep].copy() if isinstance(v, np.ndarray) else v)
                  for k, v in gt.items()}
            dt['score'] = rng.uniform(0.5, 1.0, len(dt['name']))
        dt_annos.append(dt)
    return gt_annos, dt_annos


def test_perfect_predictions_give_full_ap():
    rng = np.random.default_rng(0)
    gt, dt = _make_annos(rng, perfect=True)
    result_str, ret = get_official_eval_result(gt, dt, ['Car'])
    assert ret['Car_3d/easy_R40'] > 99.0, result_str
    assert ret['Car_bev/easy_R40'] > 99.0
    assert ret['Car_image/easy_R40'] > 99.0
    assert ret['Car_aos/easy_R40'] > 99.0


def test_half_recall_lowers_ap():
    rng = np.random.default_rng(1)
    gt, dt = _make_annos(rng, perfect=False)
    _, ret = get_official_eval_result(gt, dt, ['Car'])
    assert 20.0 < ret['Car_3d/easy_R40'] < 80.0


def test_empty_predictions():
    rng = np.random.default_rng(2)
    gt, _ = _make_annos(rng, perfect=True)
    dt = [{'name': np.array([]), 'truncated': np.array([]),
           'occluded': np.array([]), 'alpha': np.array([]),
           'bbox': np.zeros((0, 4)), 'dimensions': np.zeros((0, 3)),
           'location': np.zeros((0, 3)), 'rotation_y': np.array([]),
           'score': np.array([])} for _ in gt]
    _, ret = get_official_eval_result(gt, dt, ['Car'])
    assert ret['Car_3d/easy_R40'] == 0.0
