"""UNetV2 sparse encoder-decoder (PartA2's backbone).

Rebuild of ``backbones_3d/spconv_unet.py``: the VoxelBackBone8x encoder plus
the reference's UR-block decoder (``spconv_unet.py:135-144``) — per level: a
SparseBasicBlock on the lateral encoder features, a submanifold merge conv
over ``cat(bottom, lateral)``, the paired channel_reduction
(``view(n, C_out, -1).sum(2)``) residual add, then an inverse sparse conv up
to the next finer level (host-planned ``sparse_plan.spconv_up_table`` —
gather + one MXU matmul; the up-table slot k enumerates the SAME forward
kernel offsets the down conv used, so SparseInverseConv3d weights import
verbatim). The final block's ``conv5`` stays at the input level. Output:
per-voxel features at the input level (for the part head) + the bottleneck
for BEV compression. Weight-for-weight importable from reference PartA2
checkpoints (``utils/checkpoint_import.py``).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .spconv_backbone import SparseBasicBlock, SparseConv


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
        # PartA2_free sets RETURN_ENCODED_TENSOR False (``spconv_unet.py``:
        # the anchor-free variant has no BEV branch, so conv_out and its
        # params are skipped — keeps checkpoint import layouts matching)
        return_encoded = bool(self.model_cfg.get('RETURN_ENCODED_TENSOR',
                                                 True))
        if return_encoded:
            x_out = SparseConv(128, name='conv_out')(x_conv4, t('out'),
                                                     train=train)

        # ---- decoder: the reference's UR blocks ----
        def ur_block(lateral, bottom, subm_key, n, ch, up_table=None,
                     ch_out=None):
            """``UR_block_forward`` (``spconv_unet.py:135-144``):
            trans = basic_block(lateral); m = subm(cat(bottom, trans));
            reduced = channel_reduction(cat); x = m + reduced; then the
            inverse conv up (or conv5 at the last level)."""
            trans = SparseBasicBlock(ch, name=f'conv_up_t{n}')(
                lateral, t(subm_key), train=train)
            merged = jnp.concatenate([bottom, trans], axis=-1)
            m = SparseConv(ch, name=f'conv_up_m{n}')(
                merged, t(subm_key), train=train)
            # channel_reduction: view(N, ch, C_in//ch).sum(-1) — paired
            # adjacent channels, NOT a strided split (spconv_unet.py:146-160)
            B, V, C_in = merged.shape
            reduced = merged.reshape(B, V, ch, C_in // ch).sum(-1)
            x = m + reduced
            if up_table is None:                       # last level: conv5
                return SparseConv(ch, name='conv5')(
                    x, t(subm_key), train=train)
            return SparseConv(ch_out, name=f'inv_conv{n}')(
                x, up_table, train=train)

        x_up4 = ur_block(x_conv4, x_conv4, 'subm4', 4, 64,
                         batch['down4_up_table'], 64)
        x_up3 = ur_block(x_conv3, x_up4, 'subm3', 3, 64,
                         batch['down3_up_table'], 32)
        x_up2 = ur_block(x_conv2, x_up3, 'subm2', 2, 32,
                         batch['down2_up_table'], 16)
        x_up1 = ur_block(x_conv1, x_up2, 'subm1', 1, 16)

        batch = dict(batch)
        if return_encoded:
            batch['encoded_voxel_features'] = x_out
            batch['encoded_voxel_coords'] = batch['out_coords']
            batch['encoded_voxel_valid'] = batch['out_valid']
        batch['multi_scale_3d_features'] = {
            'x_conv1': x_conv1, 'x_conv2': x_conv2,
            'x_conv3': x_conv3, 'x_conv4': x_conv4,
        }
        batch['point_features'] = x_up1           # (B, V0, 16) decoder out
        return batch
