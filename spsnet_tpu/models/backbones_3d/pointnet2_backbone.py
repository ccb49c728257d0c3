"""PointNet++ MSG backbone (SA encoder + FP decoder) for PointRCNN.

Equivalent of ``PointNet2MSG`` (``backbones_3d/pointnet2_backbone.py:9-95``):
4 SA layers with D-FPS sampling, then FP layers interpolating features back to
all points. Dense (B, N, C) layout.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..sa_module import FPModule, SAModule


class PointNet2MSG(nn.Module):
    model_cfg: Any
    num_class: int
    input_channels: int

    def setup(self):
        sa_cfg = self.model_cfg.SA_CONFIG
        channel_in = self.input_channels - 3
        self.num_points_each_layer = list(sa_cfg.NPOINTS)
        sa_modules, skip_channels = [], [channel_in]
        for k in range(len(sa_cfg.NPOINTS)):
            mlps = [[channel_in] + list(m) for m in sa_cfg.MLPS[k]]
            channel_out = sum(m[-1] for m in mlps)
            sa_modules.append(SAModule(
                npoint=sa_cfg.NPOINTS[k],
                radii=list(sa_cfg.RADIUS[k]),
                nsamples=list(sa_cfg.NSAMPLE[k]),
                mlps=[m[1:] for m in mlps],
                name=f'sa_{k}',
            ))
            skip_channels.append(channel_out)
            channel_in = channel_out
        self.sa_modules_list = sa_modules

        fp_modules = []
        fp_cfg = self.model_cfg.FP_MLPS
        channel_out = None
        for k in range(len(fp_cfg)):
            pre = fp_cfg[k + 1][-1] if k + 1 < len(fp_cfg) else channel_in
            fp_modules.append(FPModule(mlp=list(fp_cfg[k]), name=f'fp_{k}'))
            channel_out = fp_cfg[k][-1]
        self.fp_modules_list = fp_modules
        self.num_point_features = fp_cfg[0][-1]

    def __call__(self, batch, train: bool = True):
        points = batch['points']
        xyz = points[..., 0:3]
        features = points[..., 3:] if points.shape[-1] > 3 else None

        l_xyz, l_feats = [xyz], [features]
        for sa in self.sa_modules_list:
            li_xyz, li_feats = sa(l_xyz[-1], l_feats[-1], train=train)
            l_xyz.append(li_xyz)
            l_feats.append(li_feats)

        for i in range(len(self.fp_modules_list) - 1, -1, -1):
            l_feats[i] = self.fp_modules_list[i](
                l_xyz[i], l_xyz[i + 1], l_feats[i], l_feats[i + 1], train=train)

        batch = dict(batch)
        batch['point_features'] = l_feats[0]
        batch['point_coords'] = xyz
        return batch
