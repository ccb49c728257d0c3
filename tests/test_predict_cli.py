"""Batched offline-inference CLI (tools/predict.py) end-to-end on CPU."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent


def _write_tiny_cfg(tmp_path):
    from spsnet_tpu.zoo import tiny_iassd_cfg
    cfg = {
        'CLASS_NAMES': ['Car', 'Pedestrian', 'Cyclist'],
        'MODEL': json.loads(json.dumps(tiny_iassd_cfg())),
        'DATA_CONFIG': {
            'DATA_PROCESSOR': [
                {'NAME': 'sample_points',
                 'NUM_POINTS': {'train': 512, 'test': 512}},
            ],
        },
    }
    p = tmp_path / 'tiny.yaml'
    p.write_text(yaml.safe_dump(cfg))
    return p


def _write_calib(path):
    lines = [
        'P0: 700 0 600 0 0 700 180 0 0 0 1 0',
        'P1: 700 0 600 0 0 700 180 0 0 0 1 0',
        'P2: 700.0 0.0 600.0 44.9 0.0 700.0 180.0 0.2 0.0 0.0 1.0 0.003',
        'P3: 700 0 600 0 0 700 180 0 0 0 1 0',
        'R0_rect: 1 0 0 0 1 0 0 0 1',
        'Tr_velo_to_cam: 0 -1 0 0 0 0 -1 -0.08 1 0 0 -0.27',
        'Tr_imu_to_velo: 1 0 0 0 0 1 0 0 0 0 1 0',
    ]
    path.write_text('\n'.join(lines) + '\n')


@pytest.mark.slow
def test_predict_cli_end_to_end(tmp_path):
    cfg_path = _write_tiny_cfg(tmp_path)
    rng = np.random.default_rng(0)
    data_dir = tmp_path / 'velodyne'
    calib_dir = tmp_path / 'calib'
    out_dir = tmp_path / 'preds'
    data_dir.mkdir()
    calib_dir.mkdir()
    n_frames = 5   # odd vs batch 2: exercises the padded tail batch
    for i in range(n_frames):
        pts = np.zeros((3000, 4), dtype=np.float32)
        pts[:, 0] = rng.uniform(0, 70, 3000)
        pts[:, 1] = rng.uniform(-40, 40, 3000)
        pts[:, 2] = rng.uniform(-2, 1, 3000)
        pts.tofile(data_dir / f'{i:06d}.bin')
        _write_calib(calib_dir / f'{i:06d}.txt')

    env = dict(os.environ, SPSNET_PLATFORM='cpu', SPSNET_NATIVE='1')
    r = subprocess.run(
        [sys.executable, 'tools/predict.py', '--cfg_file', str(cfg_path),
         '--data_dir', str(data_dir), '--out_dir', str(out_dir),
         '--batch_size', '2', '--calib_dir', str(calib_dir),
         '--save_sample_list'],
        cwd=REPO, capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'scenes/s' in r.stdout

    # SAVE_SAMPLE_LIST artifact: per-frame list of per-SA-layer sampled xyz
    sl = sorted((out_dir / 'sample_list_save').glob('sample_list_*.npy'))
    assert len(sl) == n_frames
    layers = np.load(sl[0], allow_pickle=True)
    assert len(layers) >= 2                       # raw cloud + >=1 SA layer
    assert layers[0].shape[-1] == 3
    assert layers[1].shape[0] < layers[0].shape[0]   # downsampling chain

    jsons = sorted(out_dir.glob('*.json'))
    assert len(jsons) == n_frames
    rec = json.loads(jsons[0].read_text())
    assert set(rec) == {'frame_id', 'boxes_lidar', 'scores', 'labels',
                        'names'}
    assert len(rec['boxes_lidar']) == len(rec['scores']) == len(rec['names'])
    for b in rec['boxes_lidar']:
        assert len(b) == 7
    # KITTI txt written for every frame, 16 columns when non-empty
    txts = sorted(out_dir.glob('*.txt'))
    assert len(txts) == n_frames
    for t in txts:
        for line in t.read_text().splitlines():
            assert len(line.split(' ')) == 16


def test_predict_cli_help():
    r = subprocess.run([sys.executable, 'tools/predict.py', '--help'],
                       cwd=REPO, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0
    assert '--score_thresh' in r.stdout


@pytest.mark.slow
def test_predict_cli_voxel_family(tmp_path):
    """Voxel-family serving: the CLI runs the host pipeline (voxelization +
    sparse plan + ragged-point pad) and the IoU-rescoring post-processing
    for SECOND-IoU — no fixed-N sample_points stage in the config."""
    rng = np.random.default_rng(1)
    data_dir = tmp_path / 'velodyne'
    out_dir = tmp_path / 'preds'
    data_dir.mkdir()
    n_frames = 3   # odd vs batch 2: exercises the padded tail batch
    for i in range(n_frames):
        n = 2500 + 400 * i                      # ragged across frames
        pts = np.zeros((n, 4), dtype=np.float32)
        pts[:, 0] = rng.uniform(0, 70, n)
        pts[:, 1] = rng.uniform(-40, 40, n)
        pts[:, 2] = rng.uniform(-2, 1, n)
        pts.tofile(data_dir / f'{i:06d}.bin')

    env = dict(os.environ, SPSNET_PLATFORM='cpu')
    r = subprocess.run(
        [sys.executable, 'tools/predict.py', '--cfg_file',
         'tools/cfgs/kitti_models/second_iou.yaml',
         '--data_dir', str(data_dir), '--out_dir', str(out_dir),
         '--batch_size', '2', '--num_points', '4096'],
        cwd=REPO, capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    recs = [json.loads((out_dir / f'{i:06d}.json').read_text())
            for i in range(n_frames)]
    assert all(set(rec) >= {'boxes_lidar', 'scores', 'labels', 'names'}
               for rec in recs)
    for rec in recs:                             # labels are 1-based + named
        for lab, name in zip(rec['labels'], rec['names']):
            assert name == ['Car', 'Pedestrian', 'Cyclist'][lab - 1]
