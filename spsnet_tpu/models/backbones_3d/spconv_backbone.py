"""VoxelBackBone8x as host-planned sparse convolution (gather + MXU matmul).

Rebuild of ``backbones_3d/spconv_backbone.py:69-180`` without spconv: the
host supplies per-frame neighbor tables (``data/processor/sparse_plan.py``);
each sparse conv is then

    gather features (V_out, K, C_in)  ->  reshape (V_out, K*C_in)
    -> Dense (K*C_in, C_out)  ->  BN -> ReLU

— i.e. one large batched matmul the MXU loves. Missing neighbors hit a
zero pad row (sentinel index V_in). The final level scatters to a dense BEV
grid (HeightCompression, ``map_to_bev/height_compression.py``).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def sparse_gather(features, table):
    """features (B, V_in, C) + zero pad row; table (B, V_out, K) with
    sentinel V_in -> (B, V_out, K, C)."""
    B, V_in, C = features.shape
    padded = jnp.concatenate(
        [features, jnp.zeros((B, 1, C), features.dtype)], axis=1)
    Vo, K = table.shape[1], table.shape[2]
    flat = table.reshape(B, Vo * K).astype(jnp.int32)
    out = jnp.take_along_axis(padded, flat[..., None], axis=1)
    return out.reshape(B, Vo, K, C)


class SparseConv(nn.Module):
    out_channels: int
    act: bool = True            # False: BN only (pre-residual-add branch)

    @nn.compact
    def __call__(self, features, table, train: bool = True):
        g = sparse_gather(features, table)
        B, Vo, K, C = g.shape
        x = nn.Dense(self.out_channels, use_bias=False)(g.reshape(B, Vo, K * C))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3)(x)
        return nn.relu(x) if self.act else x


class SparseBasicBlock(nn.Module):
    """Residual submanifold block (``spconv_backbone.py SparseBasicBlock``):
    conv-BN-ReLU -> conv-BN -> +identity -> ReLU over one subm table."""
    channels: int

    @nn.compact
    def __call__(self, x, table, train: bool = True):
        h = SparseConv(self.channels, name='conv1')(x, table, train=train)
        h = SparseConv(self.channels, act=False, name='conv2')(
            h, table, train=train)
        return nn.relu(h + x)


class VoxelBackBone8x(nn.Module):
    """Channel plan [16, 16, 32, 64, 64] + conv_out 128
    (``spconv_backbone.py:69-180``). Consumes the host plan tables from the
    batch dict (keys ``subm*/down*/out_table`` etc.)."""
    model_cfg: Any
    input_channels: int = 4

    @nn.compact
    def __call__(self, batch, train: bool = True):
        f = batch['voxel_features']                 # (B, V, C_in)
        t = lambda k: batch[f'{k}_table']

        x = SparseConv(16, name='conv_input')(f, t('subm1'), train=train)
        x = SparseConv(16, name='conv1')(x, t('subm1'), train=train)
        x_conv1 = x
        x = SparseConv(32, name='conv2_down')(x, t('down2'), train=train)
        x = SparseConv(32, name='conv2_a')(x, t('subm2'), train=train)
        x = SparseConv(32, name='conv2_b')(x, t('subm2'), train=train)
        x_conv2 = x
        x = SparseConv(64, name='conv3_down')(x, t('down3'), train=train)
        x = SparseConv(64, name='conv3_a')(x, t('subm3'), train=train)
        x = SparseConv(64, name='conv3_b')(x, t('subm3'), train=train)
        x_conv3 = x
        x = SparseConv(64, name='conv4_down')(x, t('down4'), train=train)
        x = SparseConv(64, name='conv4_a')(x, t('subm4'), train=train)
        x = SparseConv(64, name='conv4_b')(x, t('subm4'), train=train)
        x_conv4 = x
        x = SparseConv(128, name='conv_out')(x, t('out'), train=train)

        batch = dict(batch)
        batch['encoded_voxel_features'] = x          # (B, V_out, 128)
        batch['encoded_voxel_coords'] = batch['out_coords']
        batch['encoded_voxel_valid'] = batch['out_valid']
        batch['multi_scale_3d_features'] = {
            'x_conv1': x_conv1, 'x_conv2': x_conv2,
            'x_conv3': x_conv3, 'x_conv4': x_conv4,
        }
        return batch


class VoxelResBackBone8x(nn.Module):
    """Residual variant, channel plan [16, 32, 64, 128] + conv_out 128
    (``spconv_backbone.py:183-254``) — used by the nuScenes CBGS
    res3d-centerpoint configs. Consumes the same host plan tables as
    VoxelBackBone8x."""
    model_cfg: Any
    input_channels: int = 4

    @nn.compact
    def __call__(self, batch, train: bool = True):
        f = batch['voxel_features']
        t = lambda k: batch[f'{k}_table']

        x = SparseConv(16, name='conv_input')(f, t('subm1'), train=train)
        x = SparseBasicBlock(16, name='res1_a')(x, t('subm1'), train=train)
        x = SparseBasicBlock(16, name='res1_b')(x, t('subm1'), train=train)
        x_conv1 = x
        x = SparseConv(32, name='conv2_down')(x, t('down2'), train=train)
        x = SparseBasicBlock(32, name='res2_a')(x, t('subm2'), train=train)
        x = SparseBasicBlock(32, name='res2_b')(x, t('subm2'), train=train)
        x_conv2 = x
        x = SparseConv(64, name='conv3_down')(x, t('down3'), train=train)
        x = SparseBasicBlock(64, name='res3_a')(x, t('subm3'), train=train)
        x = SparseBasicBlock(64, name='res3_b')(x, t('subm3'), train=train)
        x_conv3 = x
        x = SparseConv(128, name='conv4_down')(x, t('down4'), train=train)
        x = SparseBasicBlock(128, name='res4_a')(x, t('subm4'), train=train)
        x = SparseBasicBlock(128, name='res4_b')(x, t('subm4'), train=train)
        x_conv4 = x
        x = SparseConv(128, name='conv_out')(x, t('out'), train=train)

        batch = dict(batch)
        batch['encoded_voxel_features'] = x
        batch['encoded_voxel_coords'] = batch['out_coords']
        batch['encoded_voxel_valid'] = batch['out_valid']
        batch['multi_scale_3d_features'] = {
            'x_conv1': x_conv1, 'x_conv2': x_conv2,
            'x_conv3': x_conv3, 'x_conv4': x_conv4,
        }
        return batch


class HeightCompression(nn.Module):
    """Sparse -> dense BEV: scatter the final voxel features to
    (B, ny, nx, nz*C) (parity: ``map_to_bev/height_compression.py``)."""
    model_cfg: Any
    grid_zyx: Any               # final-level (nz, ny, nx)

    @nn.compact
    def __call__(self, batch, train: bool = True):
        f = batch['encoded_voxel_features']          # (B, V, C)
        coords = batch['encoded_voxel_coords']       # (B, V, 3) zyx
        valid = batch['encoded_voxel_valid']
        nz, ny, nx = (int(v) for v in self.grid_zyx)
        B, V, C = f.shape
        flat = (coords[..., 0] * ny + coords[..., 1]) * nx + coords[..., 2]
        flat = jnp.where(valid, flat, nz * ny * nx)
        canvas = jnp.zeros((B, nz * ny * nx + 1, C), f.dtype)
        canvas = canvas.at[jnp.arange(B)[:, None], flat].set(f, mode='drop')
        canvas = canvas[:, :nz * ny * nx].reshape(B, nz, ny, nx, C)
        canvas = jnp.transpose(canvas, (0, 2, 3, 1, 4)).reshape(
            B, ny, nx, nz * C)
        batch = dict(batch)
        batch['spatial_features'] = canvas
        return batch
