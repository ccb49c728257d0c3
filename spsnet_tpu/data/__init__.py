"""Host-side data pipeline (numpy) producing fixed-shape batches for jit.

Registry parity with ``pcdet/datasets/__init__.py:13-73``.
"""
from .dataset import DatasetTemplate, collate_batch
from .loader import build_dataloader

__all__ = ['DatasetTemplate', 'collate_batch', 'build_dataloader']
