"""Full CLI chain end-to-end: tools/train.py trains on a synthetic
mini-KITTI tree and checkpoints; tools/test.py restores that checkpoint and
reports KITTI AP + recall — the exact user workflow, through argparse and
config plumbing, in subprocesses (CPU-pinned via SPSNET_PLATFORM)."""
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_train_then_eval_cli(tmp_path):
    from tests.test_kitti_end2end import _dataset_cfg, build_kitti_root
    from spsnet_tpu.zoo import tiny_iassd_cfg, tiny_optimization_cfg

    (tmp_path / 'kitti').mkdir()
    root = build_kitti_root(tmp_path / 'kitti')
    data_cfg = json.loads(json.dumps(_dataset_cfg(num_points=256)))
    data_cfg['DATA_PATH'] = str(root)
    opt = json.loads(json.dumps(tiny_optimization_cfg()))
    opt['NUM_EPOCHS'] = 1
    opt['BATCH_SIZE_PER_GPU'] = 2
    cfg = {
        'CLASS_NAMES': ['Car', 'Pedestrian', 'Cyclist'],
        'DATA_CONFIG': data_cfg,
        'MODEL': json.loads(json.dumps(tiny_iassd_cfg())),
        'OPTIMIZATION': opt,
    }
    cfg_path = tmp_path / 'tiny_cli.yaml'
    cfg_path.write_text(yaml.safe_dump(cfg))
    out_dir = tmp_path / 'run'

    env = dict(os.environ, SPSNET_PLATFORM='cpu')
    r = subprocess.run(
        [sys.executable, 'tools/train.py', '--cfg_file', str(cfg_path),
         '--output_dir', str(out_dir), '--workers', '1', '--epochs', '1',
         '--batch_size', '2'],
        cwd=REPO, capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2500:])
    ckpts = list((out_dir / 'ckpt').iterdir())
    assert ckpts, 'no checkpoint written'
    logs = list(out_dir.glob('log_train_*.txt'))
    assert logs and 'training finished' in logs[0].read_text()

    r = subprocess.run(
        [sys.executable, 'tools/test.py', '--cfg_file', str(cfg_path),
         '--output_dir', str(out_dir), '--workers', '1',
         '--batch_size', '2'],
        cwd=REPO, capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2500:])
    eval_logs = sorted((out_dir / 'eval').glob('log_eval_*.txt'))
    assert eval_logs
    log_text = eval_logs[-1].read_text()
    assert 'Car_3d/moderate_R40' in log_text
    assert 'recall/rcnn_0.3' in log_text
