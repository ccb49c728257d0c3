"""UNetV2 sparse encoder-decoder (PartA2's backbone).

Rebuild of ``backbones_3d/spconv_unet.py``: the VoxelBackBone8x encoder plus
a decoder that walks back up the levels with host-planned inverse sparse
convs (``sparse_plan.spconv_up_table``), concatenating encoder skips and
fusing with submanifold convs. Output: per-voxel features at the input level
(for the part head) + the bottleneck for BEV compression.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .spconv_backbone import SparseConv, sparse_gather


class UNetV2(nn.Module):
    model_cfg: Any
    input_channels: int = 4

    @nn.compact
    def __call__(self, batch, train: bool = True):
        f = batch['voxel_features']
        t = lambda k: batch[f'{k}_table']

        # ---- encoder (VoxelBackBone8x geometry) ----
        x = SparseConv(16, name='conv_input')(f, t('subm1'), train=train)
        x_conv1 = SparseConv(16, name='conv1')(x, t('subm1'), train=train)
        x = SparseConv(32, name='conv2_down')(x_conv1, t('down2'), train=train)
        x = SparseConv(32, name='conv2_a')(x, t('subm2'), train=train)
        x_conv2 = SparseConv(32, name='conv2_b')(x, t('subm2'), train=train)
        x = SparseConv(64, name='conv3_down')(x_conv2, t('down3'), train=train)
        x = SparseConv(64, name='conv3_a')(x, t('subm3'), train=train)
        x_conv3 = SparseConv(64, name='conv3_b')(x, t('subm3'), train=train)
        x = SparseConv(64, name='conv4_down')(x_conv3, t('down4'), train=train)
        x = SparseConv(64, name='conv4_a')(x, t('subm4'), train=train)
        x_conv4 = SparseConv(64, name='conv4_b')(x, t('subm4'), train=train)
        x_out = SparseConv(128, name='conv_out')(x_conv4, t('out'), train=train)

        # ---- decoder: inverse conv + skip concat + subm fuse ----
        def up(coarse_feats, skip_feats, up_table, subm_table_key, ch, name):
            g = sparse_gather(coarse_feats, up_table)        # (B, Vf, K, C)
            B, Vf, K, C = g.shape
            u = nn.Dense(ch, use_bias=False,
                         name=f'{name}_inv')(g.reshape(B, Vf, K * C))
            u = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f'{name}_inv_bn')(u)
            u = nn.relu(u)
            merged = jnp.concatenate([u, skip_feats], axis=-1)
            return SparseConv(ch, name=f'{name}_fuse')(
                merged, batch[f'{subm_table_key}_table'], train=train)

        u4 = up(x_conv4, x_conv3, batch['down4_up_table'], 'subm3', 64, 'up4')
        u3 = up(u4, x_conv2, batch['down3_up_table'], 'subm2', 32, 'up3')
        u2 = up(u3, x_conv1, batch['down2_up_table'], 'subm1', 16, 'up2')

        batch = dict(batch)
        batch['encoded_voxel_features'] = x_out
        batch['encoded_voxel_coords'] = batch['out_coords']
        batch['encoded_voxel_valid'] = batch['out_valid']
        batch['multi_scale_3d_features'] = {
            'x_conv1': x_conv1, 'x_conv2': x_conv2,
            'x_conv3': x_conv3, 'x_conv4': x_conv4,
        }
        batch['point_features'] = u2              # (B, V0, 16) decoder out
        return batch
