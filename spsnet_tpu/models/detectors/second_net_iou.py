"""SECOND-IoU detector (parity: ``detectors/second_net_iou.py``): SECOND +
BEV IoU-rescoring head."""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from ..roi_heads.second_head import SECONDHead, second_head_loss
from .second_net import SECONDNet


class SECONDNetIoU(SECONDNet):
    def setup(self):
        super().setup()
        self.roi_head = SECONDHead(
            model_cfg=self.model_cfg.ROI_HEAD,
            num_class=1,
            voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range,
            bev_stride=int(self.model_cfg.ROI_HEAD.get('BEV_STRIDE', 8)))

    def __call__(self, batch, train: bool = True):
        batch = super().__call__(batch, train=train)
        batch = self.roi_head(batch, train=train)
        return batch

    def loss(self, batch):
        rpn_loss, tb = super().loss(batch)
        iou_loss, tb2 = second_head_loss(
            batch['second_head_ret'], self.model_cfg.ROI_HEAD.LOSS_CONFIG)
        tb = dict(tb)
        tb.update(tb2)
        return rpn_loss + iou_loss, tb
