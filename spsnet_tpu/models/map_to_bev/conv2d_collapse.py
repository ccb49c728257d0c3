"""Collapse a camera voxel volume to BEV (parity:
``map_to_bev/conv2d_collapse.py``): stack Z into channels, 1x1 conv + BN +
relu back down to NUM_BEV_FEATURES."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class Conv2DCollapse(nn.Module):
    model_cfg: Any
    grid_size: Sequence[int]       # (X, Y, Z)

    @nn.compact
    def __call__(self, batch, train: bool = True):
        vox = batch['voxel_features_3d']             # (B, X, Y, Z, C)
        B, X, Y, Z, C = vox.shape
        # BEV layout (B, Y, X, Z*C) NHWC (reference flattens (C, Z))
        bev = jnp.transpose(vox, (0, 2, 1, 3, 4)).reshape(B, Y, X, Z * C)
        k = int(self.model_cfg.get('ARGS', {}).get('kernel_size', 1))
        out = nn.Conv(int(self.model_cfg.NUM_BEV_FEATURES), (k, k),
                      padding=((k // 2, k // 2),) * 2,
                      use_bias=bool(self.model_cfg.get('ARGS', {}).get(
                          'bias', False)), name='collapse')(bev)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                           epsilon=1e-3, name='collapse_bn')(out)
        batch = dict(batch)
        batch['spatial_features'] = nn.relu(out)
        return batch
