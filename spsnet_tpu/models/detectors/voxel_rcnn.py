"""Voxel R-CNN detector (parity: ``detectors/voxel_rcnn.py``):
MeanVFE -> VoxelBackBone8x -> HeightCompression -> BaseBEVBackbone ->
AnchorHeadSingle (proposals) -> VoxelRCNNHead (voxel-query RoI refinement)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import numpy as np

from ..backbones_2d import build_backbone_2d
from ..backbones_3d.spconv_backbone import HeightCompression, VoxelBackBone8x
from ..dense_heads.anchor_head import AnchorHeadSingle, anchor_head_loss
from ..dense_heads.center_head_iou import (CenterHeadIoU,
                                           center_head_iou_loss)
from ..roi_heads.pointrcnn_head import pointrcnn_head_loss
from ..roi_heads.voxelrcnn_head import VoxelRCNNHead
from ..vfe import build_vfe


class VoxelRCNN(nn.Module):
    model_cfg: Any
    num_class: int
    voxel_size: Any = (0.05, 0.05, 0.1)
    point_cloud_range: Any = (0, -40, -3, 70.4, 40, 1)
    num_point_features: int = 4
    final_grid_zyx: Any = (2, 200, 176)
    class_names: Any = None

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
        # voxel_rcnn_with_centerhead_dyn_voxel.yaml swaps the anchor RPN
        # for a CenterHead (same multi-group machinery as CenterPoint)
        if self.model_cfg.DENSE_HEAD.get('NAME', '') == 'CenterHead':
            self.dense_head = CenterHeadIoU(
                model_cfg=self.model_cfg.DENSE_HEAD,
                num_class=self.num_class,
                grid_size=self.grid_size,
                voxel_size=tuple(float(v) for v in vs),
                point_cloud_range=tuple(float(v) for v in pcr),
                class_names=self.class_names)
        else:
            self.dense_head = AnchorHeadSingle(
                model_cfg=self.model_cfg.DENSE_HEAD,
                num_class=self.num_class,
                grid_size=self.grid_size,
                point_cloud_range=tuple(float(v) for v in pcr))
        self.roi_head = VoxelRCNNHead(
            model_cfg=self.model_cfg.ROI_HEAD,
            num_class=1 if self.model_cfg.ROI_HEAD.CLASS_AGNOSTIC
            else self.num_class,
            voxel_size=tuple(float(v) for v in vs),
            point_cloud_range=tuple(float(v) for v in pcr))

    def __call__(self, batch, train: bool = True):
        batch = self.vfe(batch, train=train)
        batch = self.backbone_3d(batch, train=train)
        batch = self.map_to_bev_module(batch, train=train)
        batch = self.backbone_2d(batch, train=train)
        batch = self.dense_head(batch, train=train)
        batch = self.roi_head(batch, train=train)
        return batch

    def loss(self, batch):
        cfg = self.model_cfg
        if 'center_head_iou_ret' in batch:
            l_rpn, tb1 = center_head_iou_loss(
                batch['center_head_iou_ret'], cfg.DENSE_HEAD.LOSS_CONFIG,
                tuple(cfg.DENSE_HEAD.SEPARATE_HEAD_CFG.HEAD_ORDER))
            l_rcnn, tb3 = pointrcnn_head_loss(
                batch['roi_head_ret'], cfg.ROI_HEAD.LOSS_CONFIG,
                self.roi_head.box_coder)
            tb = dict(tb1)
            tb.update(tb3)
            return l_rpn + l_rcnn, tb
        l_rpn, tb1 = anchor_head_loss(
            batch['anchor_head_ret'], cfg.DENSE_HEAD.LOSS_CONFIG,
            self.num_class, self.dense_head.box_coder,
            num_dir_bins=int(cfg.DENSE_HEAD.get('NUM_DIR_BINS', 2)),
            dir_offset=float(cfg.DENSE_HEAD.get('DIR_OFFSET', 0.78539)))
        l_rcnn, tb2 = pointrcnn_head_loss(
            batch['roi_head_ret'], cfg.ROI_HEAD.LOSS_CONFIG,
            self.roi_head.box_coder)
        tb = dict(tb1)
        tb.update(tb2)
        return l_rpn + l_rcnn, tb
