"""PointRCNN two-stage detector (parity: ``detectors/PointRCNN.py``):
PointNet2MSG backbone -> PointHeadBox (stage 1) -> PointRCNNHead (stage 2)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from ..backbones_3d import build_backbone_3d
from ..dense_heads.point_head_box import PointHeadBox, point_head_box_loss
from ..roi_heads.pointrcnn_head import PointRCNNHead, pointrcnn_head_loss


class PointRCNN(nn.Module):
    model_cfg: Any
    num_class: int
    input_channels: int = 4

    def setup(self):
        self.backbone_3d = build_backbone_3d(
            self.model_cfg.BACKBONE_3D.NAME,
            model_cfg=self.model_cfg.BACKBONE_3D,
            num_class=self.num_class,
            input_channels=self.input_channels)
        self.point_head = PointHeadBox(
            model_cfg=self.model_cfg.POINT_HEAD,
            num_class=self.num_class)
        self.roi_head = PointRCNNHead(
            model_cfg=self.model_cfg.ROI_HEAD,
            num_class=1 if self.model_cfg.ROI_HEAD.CLASS_AGNOSTIC
            else self.num_class)

    def __call__(self, batch, train: bool = True):
        batch = self.backbone_3d(batch, train=train)
        batch = self.point_head(batch, train=train)
        batch = self.roi_head(batch, train=train)
        return batch

    def loss(self, batch):
        return pointrcnn_loss(batch, self.model_cfg, self.num_class,
                              self.point_head.box_coder,
                              self.roi_head.box_coder)


def pointrcnn_loss(batch, model_cfg, num_class, point_box_coder,
                   roi_box_coder):
    """Total two-stage loss; pure fn of the forward outputs."""
    l1, tb1 = point_head_box_loss(
        batch['point_head_ret'], model_cfg.POINT_HEAD.LOSS_CONFIG, num_class)
    l2, tb2 = pointrcnn_head_loss(
        batch['roi_head_ret'], model_cfg.ROI_HEAD.LOSS_CONFIG, roi_box_coder)
    tb = dict(tb1)
    tb.update(tb2)
    return l1 + l2, tb
