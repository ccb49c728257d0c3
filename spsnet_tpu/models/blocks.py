"""Reusable flax building blocks.

The reference's ``Conv2d(1x1)+BatchNorm2d+ReLU`` / ``Conv1d(1)+BatchNorm1d+ReLU``
stacks (e.g. ``pointnet2_modules.py:199-246``) are pointwise MLPs; on TPU we
express them channel-last as ``Dense`` so XLA tiles them onto the MXU as large
batched matmuls.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


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

    @nn.compact
    def __call__(self, x, train: bool = True):
        for c in self.channels:
            x = nn.Dense(c, use_bias=not self.use_bn)(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5)(x)
            x = nn.relu(x)
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

    @nn.compact
    def __call__(self, x, train: bool = True):
        if len(self.hidden) > 0:
            x = SharedMLP(self.hidden, use_bn=self.use_bn)(x, train=train)
        return nn.Dense(self.out_channels)(x)
