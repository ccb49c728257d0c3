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
