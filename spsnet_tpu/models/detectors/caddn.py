"""CaDDN: monocular (camera-only) 3D detection
(parity: ``detectors/caddn.py`` + ``CaDDN.yaml``).

ImageVFE (depth-distribution frustum -> voxel sampling) -> Conv2DCollapse ->
BaseBEVBackbone -> AnchorHeadSingle; loss = RPN + depth-distribution focal.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import numpy as np

from ..backbones_2d import build_backbone_2d
from ..dense_heads.anchor_head import AnchorHeadSingle, anchor_head_loss
from ..map_to_bev.conv2d_collapse import Conv2DCollapse
from ..vfe.image_vfe import ImageVFE, image_vfe_loss


class CaDDN(nn.Module):
    model_cfg: Any
    num_class: int
    voxel_size: Any = (0.16, 0.16, 0.16)
    point_cloud_range: Any = (2, -30.08, -3.0, 46.8, 30.08, 1.0)
    num_point_features: int = 3

    def setup(self):
        pcr = np.asarray(self.point_cloud_range, dtype=np.float32)
        vs = np.asarray(self.voxel_size, dtype=np.float32)
        self.grid_size = tuple(
            int(x) for x in np.round((pcr[3:6] - pcr[0:3]) / vs))
        self.vfe = ImageVFE(
            model_cfg=self.model_cfg.VFE,
            voxel_size=tuple(float(v) for v in vs),
            point_cloud_range=tuple(float(v) for v in pcr),
            grid_size=self.grid_size)
        self.map_to_bev_module = Conv2DCollapse(
            model_cfg=self.model_cfg.MAP_TO_BEV, grid_size=self.grid_size)
        self.backbone_2d = build_backbone_2d(
            self.model_cfg.BACKBONE_2D.NAME,
            model_cfg=self.model_cfg.BACKBONE_2D,
            input_channels=int(self.model_cfg.MAP_TO_BEV.NUM_BEV_FEATURES))
        self.dense_head = AnchorHeadSingle(
            model_cfg=self.model_cfg.DENSE_HEAD,
            num_class=self.num_class,
            grid_size=self.grid_size,
            point_cloud_range=tuple(float(v) for v in pcr))

    def __call__(self, batch, train: bool = True):
        batch = self.vfe(batch, train=train)
        batch = self.map_to_bev_module(batch, train=train)
        batch = self.backbone_2d(batch, train=train)
        batch = self.dense_head(batch, train=train)
        return batch

    def loss(self, batch):
        cfg = self.model_cfg
        l_rpn, tb = anchor_head_loss(
            batch['anchor_head_ret'], cfg.DENSE_HEAD.LOSS_CONFIG,
            self.num_class, self.dense_head.box_coder,
            num_dir_bins=int(cfg.DENSE_HEAD.get('NUM_DIR_BINS', 2)),
            dir_offset=float(cfg.DENSE_HEAD.get('DIR_OFFSET', 0.78539)))
        ffn = cfg.VFE.FFN
        l_depth, tb2 = image_vfe_loss(
            batch['image_vfe_ret'], batch,
            dict(ffn.LOSS.get('ARGS', {})), dict(ffn.DISCRETIZE),
            int(cfg.VFE.get('DOWNSAMPLE_FACTOR', 4)))
        tb = dict(tb)
        tb.update(tb2)
        return l_rpn + l_depth, tb
