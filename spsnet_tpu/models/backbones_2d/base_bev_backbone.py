"""SECOND-style BEV conv/deconv pyramid (parity:
``backbones_2d/base_bev_backbone.py:6-112``). NHWC layout; XLA maps the
convolutions straight onto the MXU."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class BaseBEVBackbone(nn.Module):
    model_cfg: Any
    input_channels: int

    @nn.compact
    def __call__(self, batch, train: bool = True):
        cfg = self.model_cfg
        layer_nums = list(cfg.get('LAYER_NUMS', []))
        strides = list(cfg.get('LAYER_STRIDES', []))
        filters = list(cfg.get('NUM_FILTERS', []))
        up_strides = list(cfg.get('UPSAMPLE_STRIDES', []))
        up_filters = list(cfg.get('NUM_UPSAMPLE_FILTERS', []))

        x = batch['spatial_features']               # (B, H, W, C)
        ups = []
        for i, n_layers in enumerate(layer_nums):
            x = nn.Conv(filters[i], (3, 3), strides=(strides[i], strides[i]),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        name=f'block{i}_down')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f'block{i}_down_bn')(x)
            x = nn.relu(x)
            for j in range(n_layers):
                x = nn.Conv(filters[i], (3, 3), padding=((1, 1), (1, 1)),
                            use_bias=False, name=f'block{i}_conv{j}')(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, name=f'block{i}_bn{j}')(x)
                x = nn.relu(x)
            if i < len(up_strides):
                s = up_strides[i]
                if s >= 1:
                    u = nn.ConvTranspose(up_filters[i], (s, s),
                                         strides=(s, s), use_bias=False,
                                         name=f'deblock{i}')(x)
                else:
                    s_inv = int(round(1 / s))
                    u = nn.Conv(up_filters[i], (s_inv, s_inv),
                                strides=(s_inv, s_inv), use_bias=False,
                                name=f'deblock{i}')(x)
                u = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, name=f'deblock{i}_bn')(u)
                ups.append(nn.relu(u))
        if len(ups) > 1:
            x = jnp.concatenate(ups, axis=-1)
        elif len(ups) == 1:
            x = ups[0]
        batch = dict(batch)
        batch['spatial_features_2d'] = x
        return batch


class RBFusion(nn.Module):
    """Range/BEV attention fusion (parity: ``base_bev_backbone.py:114-177``
    class ``RB_Fusion``): the concatenated [BEV | range] feature map is gated
    by a channel attention (global avg+max stats of each half through a
    bottleneck MLP) and a spatial attention (3x3 conv over the four
    channel-reduced maps), with a residual add."""
    model_cfg: Any
    input_channels: int = 0

    @nn.compact
    def __call__(self, batch, train: bool = True):
        bev_dim = int(self.model_cfg.BEV_DIM)
        range_dim = int(self.model_cfg.RANGE_DIM)
        x = batch['spatial_features']               # (B, H, W, C) NHWC
        bev = x[..., :bev_dim]
        rng = x[..., bev_dim:]

        def stats(m):
            return m.mean(axis=(1, 2)), m.max(axis=(1, 2))

        bev_avg, bev_max = stats(bev)
        rng_avg, rng_max = stats(rng)
        channel = jnp.concatenate([bev_avg, rng_avg, bev_max, rng_max],
                                  axis=-1)
        channel = nn.Dense(bev_dim, use_bias=False, name='channel_fc1')(
            channel)
        channel = nn.relu(channel)
        channel = nn.Dropout(0.2)(channel, deterministic=not train)
        channel = nn.Dense(bev_dim + range_dim, name='channel_fc2')(channel)
        channel = nn.sigmoid(channel)[:, None, None, :]

        space = jnp.stack([bev.mean(axis=-1), rng.mean(axis=-1),
                           bev.max(axis=-1), rng.max(axis=-1)], axis=-1)
        space = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                        name='space_conv')(space)
        space = nn.sigmoid(space)

        out = space * (channel * x) + x
        batch = dict(batch)
        batch['spatial_features_2d'] = out
        return batch
