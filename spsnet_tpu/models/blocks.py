"""Reusable flax building blocks.

The reference's ``Conv2d(1x1)+BatchNorm2d+ReLU`` / ``Conv1d(1)+BatchNorm1d+ReLU``
stacks (e.g. ``pointnet2_modules.py:199-246``) are pointwise MLPs; on TPU we
express them channel-last as ``Dense`` so XLA tiles them onto the MXU as large
batched matmuls.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

# Process-wide compute dtype for the pointwise MLP stacks (weights stay
# fp32; matmuls run in this dtype). Set via set_compute_dtype(jnp.bfloat16)
# BEFORE building modules — distance/selection math elsewhere stays fp32.
_COMPUTE_DTYPE: Any = None


def set_compute_dtype(dtype):
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def get_compute_dtype():
    return _COMPUTE_DTYPE


class SharedMLP(nn.Module):
    """Pointwise Dense+BN+ReLU stack over the trailing channel dim.

    BatchNorm matches torch defaults (eps 1e-5, running-stat momentum 0.1 →
    flax momentum 0.9) and normalizes per-channel over all leading dims,
    exactly like ``BatchNorm2d`` on an (B, C, M, S) tensor. Under pjit/GSPMD
    the batch statistics are global across the mesh automatically (the
    SyncBatchNorm capability of the reference, ``tools/train.py:122-123``,
    for free).
    """
    channels: Sequence[int]
    use_bn: bool = True
    dropout: float = 0.0
    dropout_idx: Sequence[int] = ()

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = get_compute_dtype()
        for k, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=not self.use_bn, dtype=dt)(x)
            if self.use_bn:
                # BN statistics in fp32 regardless of compute dtype
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=jnp.float32)(x)
            x = nn.relu(x)
            if self.dropout > 0 and k in tuple(self.dropout_idx):
                # reference RoI heads interleave nn.Dropout(DP_RATIO)
                # after the ReLU (e.g. pvrcnn_head.py:29-30)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if dt is not None:
            x = x.astype(jnp.float32)
        return x


class MLPHead(nn.Module):
    """SharedMLP followed by a biased linear output layer (no activation).

    Equivalent of the reference's confidence/head stacks that end in a plain
    ``Conv1d(..., bias=True)`` (``pointnet2_modules.py:240-246``,
    ``point_head_template.py:36-47``).
    """
    hidden: Sequence[int]
    out_channels: int
    use_bn: bool = True
    dropout: float = 0.0
    dropout_idx: Sequence[int] = ()

    @nn.compact
    def __call__(self, x, train: bool = True):
        if len(self.hidden) > 0:
            x = SharedMLP(self.hidden, use_bn=self.use_bn,
                          dropout=self.dropout,
                          dropout_idx=self.dropout_idx)(x, train=train)
        return nn.Dense(self.out_channels)(x)
