"""DataBaseSampler (gt_sampling) — functional tests + seeded parity vs the
reference's own sampler run with its CUDA deps patched to our parity-tested
numpy kernels. Covers round-robin RNG order, BEV-IoU collision rejection,
carve-out with REMOVE_EXTRA_WIDTH, and the road-plane snap
(``pcdet/datasets/augmentor/database_sampler.py``).
"""
import pickle
from pathlib import Path

import numpy as np
import pytest

from spsnet_tpu.config import EDict
from spsnet_tpu.data.augmentor.database_sampler import DataBaseSampler


def _build_db(root, rng, classes=('Car', 'Pedestrian', 'Cyclist'),
              per_class=30):
    """Synthetic gt database: crops + dbinfos pkl in the OpenPCDet layout."""
    (root / 'gt_database').mkdir(parents=True, exist_ok=True)
    infos = {c: [] for c in classes}
    sizes = {'Car': [3.9, 1.6, 1.56], 'Pedestrian': [0.8, 0.6, 1.73],
             'Cyclist': [1.76, 0.6, 1.73]}
    for c in classes:
        for i in range(per_class):
            n_pts = int(rng.integers(6, 40))
            box = np.zeros(7, dtype=np.float32)
            box[0] = rng.uniform(5, 60)
            box[1] = rng.uniform(-25, 25)
            box[2] = rng.uniform(-1.2, -0.6)
            box[3:6] = sizes[c]
            box[6] = rng.uniform(-np.pi, np.pi)
            pts = np.zeros((n_pts, 4), dtype=np.float32)
            pts[:, 0] = rng.uniform(-box[3] / 2, box[3] / 2, n_pts)
            pts[:, 1] = rng.uniform(-box[4] / 2, box[4] / 2, n_pts)
            pts[:, 2] = rng.uniform(-box[5] / 2, box[5] / 2, n_pts)
            rel = f'gt_database/{c}_{i}.bin'
            pts.tofile(root / rel)
            infos[c].append({
                'name': c, 'path': rel, 'box3d_lidar': box,
                'difficulty': int(rng.integers(-1, 3)),
                'num_points_in_gt': n_pts,
            })
    with open(root / 'kitti_dbinfos_train.pkl', 'wb') as f:
        pickle.dump(infos, f)
    return infos


def _sampler_cfg(**over):
    cfg = EDict({
        'DB_INFO_PATH': ['kitti_dbinfos_train.pkl'],
        'PREPARE': {'filter_by_min_points': ['Car:5', 'Pedestrian:5',
                                             'Cyclist:5'],
                    'filter_by_difficulty': [-1]},
        'SAMPLE_GROUPS': ['Car:15', 'Pedestrian:10', 'Cyclist:10'],
        'NUM_POINT_FEATURES': 4,
        'LIMIT_WHOLE_SCENE': True,
        'REMOVE_EXTRA_WIDTH': [0.0, 0.0, 0.0],
        'USE_ROAD_PLANE': False,
    })
    cfg.update(over)
    return cfg


def _scene(rng, n=20000):
    pts = np.zeros((n, 4), dtype=np.float32)
    pts[:, 0] = rng.uniform(0, 70, n)
    pts[:, 1] = rng.uniform(-40, 40, n)
    pts[:, 2] = rng.uniform(-2, 1, n)
    gt = np.zeros((3, 7), dtype=np.float32)
    gt[:, 0] = [10, 25, 40]
    gt[:, 1] = [-5, 3, 8]
    gt[:, 2] = -1.0
    gt[:, 3:6] = [3.9, 1.6, 1.56]
    return pts, gt


def test_sampler_fills_scene_and_carves(tmp_path):
    rng = np.random.default_rng(0)
    _build_db(tmp_path, rng)
    sampler = DataBaseSampler(tmp_path, _sampler_cfg(),
                              ['Car', 'Pedestrian', 'Cyclist'])
    pts, gt = _scene(rng)
    np.random.seed(7)
    dd = sampler({'points': pts.copy(), 'gt_boxes': gt.copy(),
                  'gt_names': np.array(['Car'] * 3)})
    # LIMIT_WHOLE_SCENE: Car tops up to 15 total (12 sampled minus
    # collision rejects), Ped/Cyc add up to 10 each
    assert len(dd['gt_boxes']) > 3
    assert len(dd['gt_names']) == len(dd['gt_boxes'])
    assert (dd['gt_names'][:3] == 'Car').all()
    # no sampled box overlaps another in BEV
    from spsnet_tpu.data.augmentor.data_augmentor_geometry import (
        boxes_bev_iou_cpu)
    iou = boxes_bev_iou_cpu(dd['gt_boxes'][3:, :7], dd['gt_boxes'][:, :7])
    iou[range(len(iou)), range(3, 3 + len(iou))] = 0
    assert iou.max() < 1e-6
    # crop points were concatenated into the scene
    n_obj = len(dd['points']) - np.isin(
        dd['points'].view([('', dd['points'].dtype)] * 4).reshape(-1),
        pts.view([('', pts.dtype)] * 4).reshape(-1)).sum()
    assert n_obj > 0   # crop points were added


def test_remove_extra_width_carves_margin(tmp_path):
    rng = np.random.default_rng(1)
    _build_db(tmp_path, rng, per_class=10)
    pts, gt = _scene(rng)
    outs = {}
    for extra in (0.0, 0.8):
        sampler = DataBaseSampler(
            tmp_path, _sampler_cfg(REMOVE_EXTRA_WIDTH=[extra] * 3),
            ['Car', 'Pedestrian', 'Cyclist'])
        np.random.seed(3)   # identical sampling decisions
        outs[extra] = sampler({'points': pts.copy(), 'gt_boxes': gt.copy(),
                               'gt_names': np.array(['Car'] * 3)})
    assert np.array_equal(outs[0.0]['gt_boxes'], outs[0.8]['gt_boxes'])
    # wider carve removes at least as many scene points
    assert len(outs[0.8]['points']) <= len(outs[0.0]['points'])


def test_road_plane_snap(tmp_path):
    from spsnet_tpu.data.kitti.calibration import Calibration
    rng = np.random.default_rng(2)
    _build_db(tmp_path, rng, per_class=10)
    calib = Calibration({
        'P2': np.array([[700.0, 0.0, 600.0, 44.9],
                        [0.0, 700.0, 180.0, 0.2],
                        [0.0, 0.0, 1.0, 0.003]], dtype=np.float32),
        'R0': np.eye(3, dtype=np.float32),
        'Tr_velo2cam': np.array([[0.0, -1.0, 0.0, 0.0],
                                 [0.0, 0.0, -1.0, -0.08],
                                 [1.0, 0.0, 0.0, -0.27]], dtype=np.float32),
    })
    plane = np.array([0.0, -1.0, 0.0, 1.65])
    pts, gt = _scene(rng)
    sampler = DataBaseSampler(
        tmp_path, _sampler_cfg(USE_ROAD_PLANE=True),
        ['Car', 'Pedestrian', 'Cyclist'])
    np.random.seed(11)
    dd = sampler({'points': pts.copy(), 'gt_boxes': gt.copy(),
                  'gt_names': np.array(['Car'] * 3),
                  'road_plane': plane, 'calib': calib})
    sampled = dd['gt_boxes'][3:]
    assert len(sampled) > 0
    # with this calib, rect y=1.65 plane <-> lidar z = -0.08 - 1.65 + ...:
    # bottoms must all sit at ONE height (the plane is horizontal)
    bottoms = sampled[:, 2] - sampled[:, 5] / 2
    assert np.ptp(bottoms) < 1e-3
    assert 'road_plane' not in dd
    # graceful skip when planes data is absent
    np.random.seed(11)
    dd2 = sampler({'points': pts.copy(), 'gt_boxes': gt.copy(),
                   'gt_names': np.array(['Car'] * 3)})
    assert len(dd2['gt_boxes']) == len(dd['gt_boxes'])


def test_sampler_matches_reference_seeded(tmp_path):
    """Full gt_sampling stage vs the reference's DataBaseSampler with its
    CUDA deps patched to OUR numpy kernels: same seed -> identical sampled
    boxes, names, and (modulo the kernels already parity-tested elsewhere)
    identical carved point sets."""
    torch = pytest.importorskip('torch')
    import importlib
    from tests.reference_loader import load_reference_pcdet
    load_reference_pcdet()
    from tests.test_reference_parity import _stub_ref_datasets_pkgs
    _stub_ref_datasets_pkgs()
    ref_ds = importlib.import_module(
        'pcdet.datasets.augmentor.database_sampler')

    from spsnet_tpu.data.augmentor.data_augmentor_geometry import (
        boxes_bev_iou_cpu)
    from spsnet_tpu.data.processor.data_processor import (
        points_in_boxes_cpu_np)
    ref_ds.iou3d_nms_utils.boxes_bev_iou_cpu = boxes_bev_iou_cpu
    import pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils as ref_pib

    def _points_in_boxes_cpu(points_t, boxes_t):
        out = points_in_boxes_cpu_np(points_t.numpy(), boxes_t.numpy())
        return torch.from_numpy(out)

    ref_pib.points_in_boxes_cpu = _points_in_boxes_cpu

    rng = np.random.default_rng(4)
    _build_db(tmp_path, rng)
    cfg = _sampler_cfg()
    classes = ['Car', 'Pedestrian', 'Cyclist']
    pts, gt = _scene(rng)
    names = np.array(['Car', 'Car', 'Pedestrian'])

    ours = DataBaseSampler(tmp_path, cfg, classes)
    ref = ref_ds.DataBaseSampler(Path(tmp_path), cfg, classes)

    np.random.seed(123)
    od = ours({'points': pts.copy(), 'gt_boxes': gt.copy(),
               'gt_names': names.copy()})
    np.random.seed(123)
    rd = ref({'points': pts.copy(), 'gt_boxes': gt.copy(),
              'gt_names': names.copy(),
              'gt_boxes_mask': np.ones(3, dtype=bool)})

    np.testing.assert_array_equal(od['gt_names'], rd['gt_names'])
    np.testing.assert_allclose(od['gt_boxes'], rd['gt_boxes'], atol=1e-6)
    assert od['points'].shape == rd['points'].shape

    def row_sorted(a):
        return a[np.lexsort(a.T[::-1])]

    np.testing.assert_array_equal(row_sorted(od['points']),
                                  row_sorted(rd['points']))
