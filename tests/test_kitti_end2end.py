"""End-to-end KITTI slice: synthetic on-disk dataset -> KittiDataset loader ->
tiny IA-SSD -> NMS -> prediction dicts -> official evaluator.

This is the M1 integration test from SURVEY.md §7: it exercises the exact
path `tools/test.py` runs, minus real data.
"""
import pickle

import numpy as np
import jax
import pytest

from spsnet_tpu.config import EDict
from spsnet_tpu.data.kitti.kitti_dataset import KittiDataset
from spsnet_tpu.data.loader import DataLoader, ShardedSampler
from spsnet_tpu.models import build_detector
from spsnet_tpu.runtime.trainer import Trainer
from spsnet_tpu.zoo import tiny_iassd_cfg, tiny_optimization_cfg

N_FRAMES = 4
N_POINTS_RAW = 4000


def _make_calib(path):
    P2 = 'P2: 700 0 600 45 0 700 180 0 0 0 1 0.005'
    lines = ['P0: ' + ' '.join(['0'] * 12), 'P1: ' + ' '.join(['0'] * 12),
             P2, 'P3: ' + ' '.join(['0'] * 12),
             'R0_rect: 1 0 0 0 1 0 0 0 1',
             'Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0',
             'Tr_imu_to_velo: ' + ' '.join(['0'] * 12)]
    path.write_text('\n'.join(lines) + '\n')


@pytest.fixture(scope='module')
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('kitti')
    (root / 'ImageSets').mkdir()
    split_ids = [f'{i:06d}' for i in range(N_FRAMES)]
    (root / 'ImageSets' / 'val.txt').write_text('\n'.join(split_ids))
    train_dir = root / 'training'
    for sub in ('velodyne', 'calib', 'label_2'):
        (train_dir / sub).mkdir(parents=True)

    rng = np.random.default_rng(0)
    infos = []
    for i, sid in enumerate(split_ids):
        # points in the camera FOV (x forward, near the image center ray)
        n = N_POINTS_RAW
        pts = np.zeros((n, 4), dtype=np.float32)
        pts[:, 0] = rng.uniform(4, 60, n)
        pts[:, 1] = pts[:, 0] * rng.uniform(-0.5, 0.5, n)
        pts[:, 2] = rng.uniform(-1.5, 0.5, n)
        pts[:, 3] = rng.uniform(0, 1, n)
        pts.tofile(str(train_dir / 'velodyne' / f'{sid}.bin'))
        _make_calib(train_dir / 'calib' / f'{sid}.txt')

        # two cars per frame in lidar frame -> write camera-frame labels
        n_gt = 2
        gt_lidar = np.zeros((n_gt, 7), dtype=np.float32)
        gt_lidar[:, 0] = rng.uniform(8, 40, n_gt)
        gt_lidar[:, 1] = rng.uniform(-8, 8, n_gt)
        gt_lidar[:, 2] = rng.uniform(-1.0, -0.5, n_gt)
        gt_lidar[:, 3:6] = [3.9, 1.6, 1.56]
        gt_lidar[:, 6] = rng.uniform(-np.pi, np.pi, n_gt)

        from spsnet_tpu.data.kitti.calibration import Calibration
        from spsnet_tpu.data.kitti import kitti_utils
        calib = Calibration(str(train_dir / 'calib' / f'{sid}.txt'))
        cam = kitti_utils.boxes3d_lidar_to_kitti_camera(gt_lidar, calib)
        img_boxes = kitti_utils.boxes3d_kitti_camera_to_imageboxes(
            cam, calib, image_shape=np.array([375, 1242]))
        # force easy difficulty: tall boxes, no truncation/occlusion
        img_boxes[:, 1] = 50
        img_boxes[:, 3] = 150

        label_lines = []
        for k in range(n_gt):
            l, h, w = cam[k, 3], cam[k, 4], cam[k, 5]
            label_lines.append(
                f'Car 0.0 0 0.0 {img_boxes[k,0]:.2f} {img_boxes[k,1]:.2f} '
                f'{img_boxes[k,2]:.2f} {img_boxes[k,3]:.2f} '
                f'{h:.2f} {w:.2f} {l:.2f} '
                f'{cam[k,0]:.2f} {cam[k,1]:.2f} {cam[k,2]:.2f} {cam[k,6]:.2f}')
        (train_dir / 'label_2' / f'{sid}.txt').write_text(
            '\n'.join(label_lines) + '\n')

        annos = {
            'name': np.array(['Car'] * n_gt),
            'truncated': np.zeros(n_gt), 'occluded': np.zeros(n_gt),
            'alpha': np.zeros(n_gt), 'bbox': img_boxes.astype(np.float64),
            'dimensions': np.stack([cam[:, 3], cam[:, 4], cam[:, 5]], axis=1),
            'location': cam[:, 0:3].astype(np.float64),
            'rotation_y': cam[:, 6].astype(np.float64),
            'score': -np.ones(n_gt),
            'difficulty': np.zeros(n_gt, dtype=np.int32),
            'index': np.arange(n_gt, dtype=np.int32),
            'gt_boxes_lidar': gt_lidar,
        }
        infos.append({'point_cloud': {'num_features': 4, 'lidar_idx': sid},
                      'image': {'image_idx': sid,
                                'image_shape': np.array([375, 1242])},
                      'annos': annos})
    with open(root / 'kitti_infos_val.pkl', 'wb') as f:
        pickle.dump(infos, f)
    return root


def _dataset_cfg():
    return EDict({
        'DATASET': 'KittiDataset',
        'DATA_PATH': '',
        'POINT_CLOUD_RANGE': [0, -40, -3, 70.4, 40, 1],
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'INFO_PATH': {'train': ['kitti_infos_train.pkl'],
                      'test': ['kitti_infos_val.pkl']},
        'FOV_POINTS_ONLY': True,
        'MAX_GT_BOXES': 16,
        'POINT_FEATURE_ENCODING': {
            'encoding_type': 'absolute_coordinates_encoding',
            'used_feature_list': ['x', 'y', 'z', 'intensity'],
            'src_feature_list': ['x', 'y', 'z', 'intensity'],
        },
        'DATA_PROCESSOR': [
            {'NAME': 'mask_points_and_boxes_outside_range',
             'REMOVE_OUTSIDE_BOXES': True},
            {'NAME': 'sample_points',
             'NUM_POINTS': {'train': 256, 'test': 256}},
            {'NAME': 'shuffle_points',
             'SHUFFLE_ENABLED': {'train': True, 'test': False}},
        ],
    })


def test_kitti_eval_end2end(kitti_root, tmp_path):
    dataset = KittiDataset(_dataset_cfg(), ['Car', 'Pedestrian', 'Cyclist'],
                           training=False, root_path=kitti_root)
    assert len(dataset) == N_FRAMES
    frame = dataset[0]
    assert frame['points'].shape == (256, 4)

    loader = DataLoader(dataset, batch_size=2, num_workers=2)
    cfg = EDict({'CLASS_NAMES': ['Car', 'Pedestrian', 'Cyclist'],
                 'MODEL': tiny_iassd_cfg(),
                 'OPTIMIZATION': tiny_optimization_cfg()})
    model = build_detector(cfg.MODEL, num_class=3)
    trainer = Trainer(cfg, model, tmp_path, total_iters_each_epoch=2)
    example = next(iter(loader))
    state = trainer.init_state(example)

    det_annos, result_str, result_dict = trainer.evaluate(
        dataset, loader, state, cfg.CLASS_NAMES)
    assert len(det_annos) == N_FRAMES
    assert 'Car_3d/moderate_R40' in result_dict
    assert 'recall/rcnn_0.3' in result_dict
    assert result_dict['sec_per_example'] > 0
    # untrained model: AP is whatever it is, but the protocol must produce
    # finite numbers and well-formed annos
    for anno in det_annos:
        assert set(anno.keys()) >= {'name', 'bbox', 'location', 'score',
                                    'boxes_lidar', 'frame_id'}
