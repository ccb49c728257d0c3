"""PartA2 detector (parity: ``detectors/PartA2_net.py``):
MeanVFE -> UNetV2 (host-planned sparse encoder-decoder) -> HeightCompression
-> BaseBEVBackbone -> AnchorHeadSingle (proposals) + PointIntraPartOffsetHead
(part-awareness) -> PartA2FCHead (RoI-aware pooled refinement)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..backbones_2d import build_backbone_2d
from ..backbones_3d.spconv_backbone import HeightCompression
from ..backbones_3d.spconv_unet import UNetV2
from ..dense_heads.anchor_head import AnchorHeadSingle, anchor_head_loss
from ..dense_heads.point_intra_part_head import (PointIntraPartOffsetHead,
                                                 point_intra_part_loss)
from ..roi_heads.parta2_head import PartA2FCHead
from ..roi_heads.pointrcnn_head import pointrcnn_head_loss
from ..vfe import build_vfe


class PartA2Net(nn.Module):
    model_cfg: Any
    num_class: int
    voxel_size: Any = (0.05, 0.05, 0.1)
    point_cloud_range: Any = (0, -40, -3, 70.4, 40, 1)
    num_point_features: int = 4
    final_grid_zyx: Any = (2, 200, 176)

    def setup(self):
        pcr = np.asarray(self.point_cloud_range, dtype=np.float32)
        vs = np.asarray(self.voxel_size, dtype=np.float32)
        self.grid_size = tuple(
            int(x) for x in np.round((pcr[3:6] - pcr[0:3]) / vs))
        self.vfe = build_vfe(self.model_cfg.VFE.NAME,
                             model_cfg=self.model_cfg.VFE,
                             num_point_features=self.num_point_features)
        self.backbone_3d = UNetV2(model_cfg=self.model_cfg.BACKBONE_3D,
                                  input_channels=self.num_point_features)
        self.map_to_bev_module = HeightCompression(
            model_cfg=self.model_cfg.MAP_TO_BEV,
            grid_zyx=tuple(int(v) for v in self.final_grid_zyx))
        self.backbone_2d = build_backbone_2d(
            self.model_cfg.BACKBONE_2D.NAME,
            model_cfg=self.model_cfg.BACKBONE_2D,
            input_channels=int(self.model_cfg.MAP_TO_BEV.NUM_BEV_FEATURES))
        self.dense_head = AnchorHeadSingle(
            model_cfg=self.model_cfg.DENSE_HEAD,
            num_class=self.num_class,
            grid_size=self.grid_size,
            point_cloud_range=tuple(float(v) for v in pcr))
        self.point_head = PointIntraPartOffsetHead(
            model_cfg=self.model_cfg.POINT_HEAD, num_class=1)
        self.roi_head = PartA2FCHead(
            model_cfg=self.model_cfg.ROI_HEAD,
            num_class=1 if self.model_cfg.ROI_HEAD.CLASS_AGNOSTIC
            else self.num_class,
            voxel_size=tuple(float(v) for v in vs),
            point_cloud_range=tuple(float(v) for v in pcr))

    def _voxel_centers(self, coords_zyx):
        vs = np.asarray(self.voxel_size, np.float32)
        pcr = np.asarray(self.point_cloud_range, np.float32)
        xyz_idx = coords_zyx[..., ::-1].astype(jnp.float32)
        return xyz_idx * vs + pcr[:3] + vs / 2

    def __call__(self, batch, train: bool = True):
        batch = self.vfe(batch, train=train)
        batch = self.backbone_3d(batch, train=train)
        batch = dict(batch)
        batch['voxel_centers'] = self._voxel_centers(batch['voxel_coords'])
        batch = self.map_to_bev_module(batch, train=train)
        batch = self.backbone_2d(batch, train=train)
        batch = self.dense_head(batch, train=train)
        batch = self.point_head(batch, train=train)
        batch = self.roi_head(batch, train=train)
        return batch

    def loss(self, batch):
        cfg = self.model_cfg
        l_rpn, tb1 = anchor_head_loss(
            batch['anchor_head_ret'], cfg.DENSE_HEAD.LOSS_CONFIG,
            self.num_class, self.dense_head.box_coder,
            num_dir_bins=int(cfg.DENSE_HEAD.get('NUM_DIR_BINS', 2)),
            dir_offset=float(cfg.DENSE_HEAD.get('DIR_OFFSET', 0.78539)))
        l_pt, tb2 = point_intra_part_loss(
            batch['point_part_ret'], cfg.POINT_HEAD.LOSS_CONFIG)
        l_rcnn, tb3 = pointrcnn_head_loss(
            batch['roi_head_ret'], cfg.ROI_HEAD.LOSS_CONFIG,
            self.roi_head.box_coder)
        tb = dict(tb1)
        tb.update(tb2)
        tb.update(tb3)
        return l_rpn + l_pt + l_rcnn, tb


class PartA2FreeNet(nn.Module):
    """Anchor-free PartA2 (reference ``kitti_models/PartA2_free.yaml``, run
    by the generic ``detectors/PointRCNN.py`` two-stage driver): MeanVFE ->
    UNetV2 with RETURN_ENCODED_TENSOR False (no BEV branch) ->
    PointIntraPartOffsetHead predicting per-point boxes (stage-1 proposals)
    -> PartA2FCHead with DISABLE_PART. Dispatched from ``build_detector``
    when a PointRCNN config carries a UNetV2 backbone."""
    model_cfg: Any
    num_class: int
    voxel_size: Any = (0.05, 0.05, 0.1)
    point_cloud_range: Any = (0, -40, -3, 70.4, 40, 1)
    num_point_features: int = 4

    def setup(self):
        pcr = np.asarray(self.point_cloud_range, dtype=np.float32)
        vs = np.asarray(self.voxel_size, dtype=np.float32)
        self.vfe = build_vfe(self.model_cfg.VFE.NAME,
                             model_cfg=self.model_cfg.VFE,
                             num_point_features=self.num_point_features)
        self.backbone_3d = UNetV2(model_cfg=self.model_cfg.BACKBONE_3D,
                                  input_channels=self.num_point_features)
        self.point_head = PointIntraPartOffsetHead(
            model_cfg=self.model_cfg.POINT_HEAD,
            num_class=1 if self.model_cfg.POINT_HEAD.get(
                'CLASS_AGNOSTIC', False) else self.num_class)
        self.roi_head = PartA2FCHead(
            model_cfg=self.model_cfg.ROI_HEAD,
            num_class=1 if self.model_cfg.ROI_HEAD.CLASS_AGNOSTIC
            else self.num_class,
            voxel_size=tuple(float(v) for v in vs),
            point_cloud_range=tuple(float(v) for v in pcr))

    def _voxel_centers(self, coords_zyx):
        vs = np.asarray(self.voxel_size, np.float32)
        pcr = np.asarray(self.point_cloud_range, np.float32)
        xyz_idx = coords_zyx[..., ::-1].astype(jnp.float32)
        return xyz_idx * vs + pcr[:3] + vs / 2

    def __call__(self, batch, train: bool = True):
        batch = self.vfe(batch, train=train)
        batch = self.backbone_3d(batch, train=train)
        batch = dict(batch)
        batch['voxel_centers'] = self._voxel_centers(batch['voxel_coords'])
        batch = self.point_head(batch, train=train)
        batch = self.roi_head(batch, train=train)
        return batch

    def loss(self, batch):
        cfg = self.model_cfg
        l_pt, tb1 = point_intra_part_loss(
            batch['point_part_ret'], cfg.POINT_HEAD.LOSS_CONFIG)
        l_rcnn, tb2 = pointrcnn_head_loss(
            batch['roi_head_ret'], cfg.ROI_HEAD.LOSS_CONFIG,
            self.roi_head.box_coder)
        tb = dict(tb1)
        tb.update(tb2)
        return l_pt + l_rcnn, tb
