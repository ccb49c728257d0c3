"""Training telemetry: meters + JSONL/TensorBoard scalar logging.

Parity: ``train_utils.py:17-20,58-83`` (data/forward/batch time meters,
tensorboard scalars). JSONL is the primary sink (greppable, no deps);
TensorBoard is used when torch's SummaryWriter is importable.
"""
from __future__ import annotations

import json
import time
from pathlib import Path


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class MetricsLogger:
    def __init__(self, log_dir, use_tensorboard=True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.jsonl = open(self.log_dir / 'metrics.jsonl', 'a')
        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(str(self.log_dir / 'tensorboard'))
            except Exception:
                self.tb = None

    def log_scalars(self, step, scalars: dict, prefix=''):
        rec = {'step': int(step), 'ts': time.time()}
        for k, v in scalars.items():
            key = f'{prefix}{k}' if prefix else k
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                continue
            if self.tb is not None:
                self.tb.add_scalar(key, rec[key], int(step))
        self.jsonl.write(json.dumps(rec) + '\n')
        self.jsonl.flush()

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
