"""SECOND detector (parity: ``detectors/second_net.py``): MeanVFE ->
VoxelBackBone8x (host-planned sparse conv) -> HeightCompression ->
BaseBEVBackbone -> AnchorHeadSingle."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import numpy as np

from ..backbones_2d import build_backbone_2d
from ..backbones_3d.spconv_backbone import HeightCompression, VoxelBackBone8x
from ..dense_heads.anchor_head import (AnchorHeadMulti, AnchorHeadSingle,
                                       anchor_head_loss)
from ..vfe import build_vfe


class SECONDNet(nn.Module):
    model_cfg: Any
    num_class: int
    voxel_size: Any = (0.05, 0.05, 0.1)
    point_cloud_range: Any = (0, -40, -3, 70.4, 40, 1)
    num_point_features: int = 4
    final_grid_zyx: Any = (2, 200, 176)   # after 8x + z-compression

    def setup(self):
        pcr = np.asarray(self.point_cloud_range, dtype=np.float32)
        vs = np.asarray(self.voxel_size, dtype=np.float32)
        self.grid_size = tuple(
            int(x) for x in np.round((pcr[3:6] - pcr[0:3]) / vs))
        self.vfe = build_vfe(self.model_cfg.VFE.NAME,
                             model_cfg=self.model_cfg.VFE,
                             num_point_features=self.num_point_features)
        self.backbone_3d = VoxelBackBone8x(
            model_cfg=self.model_cfg.BACKBONE_3D,
            input_channels=self.num_point_features)
        self.map_to_bev_module = HeightCompression(
            model_cfg=self.model_cfg.MAP_TO_BEV,
            grid_zyx=tuple(int(v) for v in self.final_grid_zyx))
        self.backbone_2d = build_backbone_2d(
            self.model_cfg.BACKBONE_2D.NAME,
            model_cfg=self.model_cfg.BACKBONE_2D,
            input_channels=int(self.model_cfg.MAP_TO_BEV.NUM_BEV_FEATURES))
        # anchors live on the BEV map after 8x downsample; second_multihead
        # configs select the grouped multi-head RPN by NAME
        head_cls = AnchorHeadMulti \
            if self.model_cfg.DENSE_HEAD.get('NAME', '') == 'AnchorHeadMulti' \
            else AnchorHeadSingle
        self.dense_head = head_cls(
            model_cfg=self.model_cfg.DENSE_HEAD,
            num_class=self.num_class,
            grid_size=self.grid_size,
            point_cloud_range=tuple(float(v) for v in pcr))

    def __call__(self, batch, train: bool = True):
        batch = self.vfe(batch, train=train)
        batch = self.backbone_3d(batch, train=train)
        batch = self.map_to_bev_module(batch, train=train)
        batch = self.backbone_2d(batch, train=train)
        batch = self.dense_head(batch, train=train)
        return batch

    def loss(self, batch):
        cfg = self.model_cfg.DENSE_HEAD
        return anchor_head_loss(
            batch['anchor_head_ret'], cfg.LOSS_CONFIG, self.num_class,
            self.dense_head.box_coder,
            num_dir_bins=int(cfg.get('NUM_DIR_BINS', 2)),
            dir_offset=float(cfg.get('DIR_OFFSET', 0.78539)))
