"""Waymo/nuScenes info + gt-database generation on synthetic fixtures
(VERDICT r1 item 4: create_infos must cover all three datasets; fixtures
mirror test_kitti_end2end's synthetic kitti_root)."""
import pickle

import numpy as np
import pytest

from spsnet_tpu.config import EDict


def make_waymo_root(tmp_path, n_frames=4, seq='seq0'):
    root = tmp_path / 'waymo'
    (root / 'ImageSets').mkdir(parents=True)
    (root / 'ImageSets' / 'train.txt').write_text(f'{seq}.tfrecord\n')
    (root / 'ImageSets' / 'val.txt').write_text(f'{seq}.tfrecord\n')
    seq_dir = root / 'waymo_processed_data' / seq
    seq_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    infos = []
    for i in range(n_frames):
        # one box at origin with 20 points inside, plus background
        box = np.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.6, 0.3]],
                       dtype=np.float32)
        inside = rng.uniform(-0.5, 0.5, (20, 3)).astype(np.float32)
        bg = rng.uniform(10, 40, (200, 3)).astype(np.float32)
        xyz = np.concatenate([inside, bg])
        feats = np.zeros((len(xyz), 6), dtype=np.float32)
        feats[:, :3] = xyz
        feats[:, 3] = rng.uniform(0, 1, len(xyz))   # intensity
        feats[:, 4] = rng.uniform(0, 1, len(xyz))   # elongation
        feats[:, 5] = -1                            # NLZ flag: keep all
        np.save(seq_dir / f'{i:04d}.npy', feats)
        infos.append({
            'point_cloud': {'lidar_sequence': seq, 'sample_idx': i,
                            'num_features': 5},
            'frame_id': f'{seq}_{i:03d}',
            'annos': {
                'name': np.array(['Vehicle']),
                'difficulty': np.array([0]),
                'gt_boxes_lidar': box,
            },
        })
    with open(seq_dir / f'{seq}.pkl', 'wb') as f:
        pickle.dump(infos, f)
    return root


def waymo_cfg():
    return EDict({
        'DATASET': 'WaymoDataset',
        'DATA_PATH': 'unused',
        'PROCESSED_DATA_TAG': 'waymo_processed_data',
        'POINT_CLOUD_RANGE': [-75.2, -75.2, -2, 75.2, 75.2, 4],
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'POINT_FEATURE_ENCODING': {
            'encoding_type': 'absolute_coordinates_encoding',
            'used_feature_list': ['x', 'y', 'z', 'intensity', 'elongation'],
            'src_feature_list': ['x', 'y', 'z', 'intensity', 'elongation'],
        },
        'DATA_PROCESSOR': [],
    })


def test_create_waymo_infos_and_gt_database(tmp_path):
    from spsnet_tpu.data.waymo.waymo_dataset import create_waymo_infos
    root = make_waymo_root(tmp_path)
    create_waymo_infos(
        dataset_cfg=waymo_cfg(),
        class_names=['Vehicle', 'Pedestrian', 'Cyclist'],
        data_path=root, save_path=root)

    train_pkl = root / 'waymo_processed_data_infos_train.pkl'
    assert train_pkl.exists()
    with open(train_pkl, 'rb') as f:
        infos = pickle.load(f)
    assert len(infos) == 4
    # num_points_in_gt computed from the lidar (20 points in the box)
    assert infos[0]['annos']['num_points_in_gt'][0] == 20

    db_pkl = root / 'waymo_processed_data_waymo_dbinfos_train_sampled_1.pkl'
    assert db_pkl.exists()
    with open(db_pkl, 'rb') as f:
        db = pickle.load(f)
    # frames 1,2,3 drop Vehicles (k%4 quirk): only frame 0 contributes
    assert len(db['Vehicle']) == 1
    entry = db['Vehicle'][0]
    assert entry['num_points_in_gt'] == 20
    crop = np.fromfile(root / entry['path'], dtype=np.float32).reshape(-1, 5)
    assert crop.shape[0] == 20
    # crop is centered at the box
    assert np.abs(crop[:, :3]).max() < 1.0


def make_nuscenes_root(tmp_path, n_frames=3):
    # Data lives under <base>/<VERSION>/ — NuScenesDataset appends
    # cfg.VERSION to root_path (reference parity), so the fixture nests too.
    base = tmp_path / 'nuscenes'
    root = base / 'v1.0-mini'
    root.mkdir(parents=True)
    (root / 'samples').mkdir()
    rng = np.random.default_rng(1)
    infos = []
    for i in range(n_frames):
        box = np.zeros((1, 9), dtype=np.float32)
        box[0, 3:6] = [4.0, 2.0, 1.6]
        box[0, 6] = 0.5
        box[0, 7:9] = [1.0, -0.5]                    # velocity
        inside = rng.uniform(-0.5, 0.5, (15, 3)).astype(np.float32)
        bg = rng.uniform(10, 40, (100, 3)).astype(np.float32)
        xyz = np.concatenate([inside, bg])
        pts = np.zeros((len(xyz), 5), dtype=np.float32)
        pts[:, :3] = xyz
        pts.tofile(root / 'samples' / f'frame{i}.bin')
        infos.append({
            'lidar_path': f'samples/frame{i}.bin',
            'token': f'tok{i}',
            'sweeps': [],
            'timestamp': float(i),
            'gt_boxes': box,
            'gt_names': np.array(['car']),
            'num_lidar_pts': np.array([15]),
        })
    with open(root / 'nuscenes_infos_10sweeps_train.pkl', 'wb') as f:
        pickle.dump(infos, f)
    return base


def test_create_nuscenes_gt_database(tmp_path):
    from spsnet_tpu.data.nuscenes.nuscenes_dataset import NuScenesDataset
    base = make_nuscenes_root(tmp_path)
    root = base / 'v1.0-mini'                 # dataset.root_path after init
    cfg = EDict({
        'DATASET': 'NuScenesDataset',
        'DATA_PATH': 'unused', 'VERSION': 'v1.0-mini', 'MAX_SWEEPS': 10,
        'POINT_CLOUD_RANGE': [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'INFO_PATH': {'train': ['nuscenes_infos_10sweeps_train.pkl'],
                      'test': ['nuscenes_infos_10sweeps_val.pkl']},
        'POINT_FEATURE_ENCODING': {
            'encoding_type': 'absolute_coordinates_encoding',
            'used_feature_list': ['x', 'y', 'z', 'intensity', 'timestamp'],
            'src_feature_list': ['x', 'y', 'z', 'intensity', 'timestamp'],
        },
        'DATA_PROCESSOR': [],
    })
    dataset = NuScenesDataset(dataset_cfg=cfg, class_names=None,
                              root_path=base, training=False)
    assert dataset.root_path == root
    with open(root / 'nuscenes_infos_10sweeps_train.pkl', 'rb') as f:
        dataset.infos = pickle.load(f)
    dataset.create_groundtruth_database(max_sweeps=10)

    db_pkl = root / 'nuscenes_dbinfos_10sweeps_withvelo.pkl'
    assert db_pkl.exists()
    with open(db_pkl, 'rb') as f:
        db = pickle.load(f)
    assert len(db['car']) == 3
    entry = db['car'][0]
    assert entry['num_points_in_gt'] == 15
    assert entry['box3d_lidar'].shape[-1] == 9       # velocity kept
    # sweeps layout: [x, y, z, intensity, time_lag]
    crop = np.fromfile(root / entry['path'], dtype=np.float32).reshape(-1, 5)
    assert crop.shape[0] == 15


def test_create_infos_cli_choices():
    import subprocess
    import sys
    from pathlib import Path
    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run([sys.executable, 'tools/create_infos.py', '--help'],
                       cwd=repo, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0
    for name in ('kitti', 'waymo', 'nuscenes'):
        assert name in r.stdout


def test_waymo_shared_memory_cache(tmp_path):
    """USE_SHARED_MEMORY copies each frame npy into the shm dir once
    (bounded by SHARED_MEMORY_FILE_LIMIT) and serves identical points
    from it; clean_shared_memory removes the split's cache."""
    from spsnet_tpu.data.waymo.waymo_dataset import WaymoDataset
    root = make_waymo_root(tmp_path, n_frames=4)
    cfg = waymo_cfg()
    cfg['USE_SHARED_MEMORY'] = True
    cfg['SHARED_MEMORY_FILE_LIMIT'] = 2
    cfg['SHARED_MEMORY_DIR'] = str(tmp_path / 'shm')

    ds = WaymoDataset(dataset_cfg=cfg, class_names=['Vehicle'],
                      training=True, root_path=root)
    plain = WaymoDataset(dataset_cfg=waymo_cfg(), class_names=['Vehicle'],
                         training=True, root_path=root)
    frame0 = plain.get_lidar('seq0', 0)
    for i in range(4):
        np.testing.assert_array_equal(ds.get_lidar('seq0', i),
                                      plain.get_lidar('seq0', i))
    cached = sorted(p.name for p in ds._shm_dir.glob('*.npy'))
    assert len(cached) == 2  # limit respected
    # cached frames serve from shm even after the source disappears
    (root / 'waymo_processed_data' / 'seq0' / '0000.npy').unlink()
    np.testing.assert_array_equal(ds.get_lidar('seq0', 0), frame0)
    ds.clean_shared_memory()
    assert not ds._shm_dir.exists()
