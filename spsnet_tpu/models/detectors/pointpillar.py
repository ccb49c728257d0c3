"""PointPillars detector (parity: ``detectors/pointpillar.py``):
PillarVFE -> PointPillarScatter -> BaseBEVBackbone -> AnchorHeadSingle.
All dense NHWC — the most MXU-native pipeline in the zoo."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import numpy as np

from ..backbones_2d import build_backbone_2d
from ..dense_heads.anchor_head import (AnchorHeadMulti, AnchorHeadSingle,
                                       anchor_head_loss)
from ..map_to_bev import build_map_to_bev
from ..vfe import build_vfe


class PointPillar(nn.Module):
    model_cfg: Any
    num_class: int
    voxel_size: Any = (0.16, 0.16, 4)
    point_cloud_range: Any = (0, -39.68, -3, 69.12, 39.68, 1)
    num_point_features: int = 4

    def setup(self):
        pcr = np.asarray(self.point_cloud_range, dtype=np.float32)
        vs = np.asarray(self.voxel_size, dtype=np.float32)
        self.grid_size = tuple(
            int(x) for x in np.round((pcr[3:6] - pcr[0:3]) / vs))
        self.vfe = build_vfe(
            self.model_cfg.VFE.NAME, model_cfg=self.model_cfg.VFE,
            num_point_features=self.num_point_features,
            voxel_size=tuple(float(v) for v in vs),
            point_cloud_range=tuple(float(v) for v in pcr))
        self.map_to_bev_module = build_map_to_bev(
            self.model_cfg.MAP_TO_BEV.NAME,
            model_cfg=self.model_cfg.MAP_TO_BEV,
            grid_size=self.grid_size)
        self.backbone_2d = build_backbone_2d(
            self.model_cfg.BACKBONE_2D.NAME,
            model_cfg=self.model_cfg.BACKBONE_2D,
            input_channels=int(self.model_cfg.MAP_TO_BEV.NUM_BEV_FEATURES))
        # nuScenes CBGS configs (cbgs_pp_multihead.yaml) select the grouped
        # multi-head RPN by DENSE_HEAD.NAME
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
