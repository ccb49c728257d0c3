"""IA-SSD detector (parity: ``detectors/IASSD.py``): backbone + point head;
train -> head loss only; eval -> post-processing NMS (done by the runtime)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from ..backbones_3d import build_backbone_3d
from ..dense_heads import build_point_head
from ..dense_heads.iassd_head import iassd_head_loss


class IASSD(nn.Module):
    model_cfg: Any
    num_class: int
    input_channels: int = 4

    def setup(self):
        self.backbone_3d = build_backbone_3d(
            self.model_cfg.BACKBONE_3D.NAME,
            model_cfg=self.model_cfg.BACKBONE_3D,
            num_class=self.num_class,
            input_channels=self.input_channels,
        )
        self.point_head = build_point_head(
            self.model_cfg.POINT_HEAD.NAME,
            model_cfg=self.model_cfg.POINT_HEAD,
            num_class=self.num_class,
            input_channels=0,  # inferred from features (channel-last Dense)
        )

    def __call__(self, batch, train: bool = True):
        batch = self.backbone_3d(batch, train=train)
        batch = self.point_head(batch, train=train)
        return batch

    def loss(self, batch):
        """Head loss from a forward-pass batch (train mode)."""
        head_cfg = self.model_cfg.POINT_HEAD
        sa_list = head_cfg.LOSS_CONFIG.get(
            'SAMPLE_METHOD_LIST',
            self.model_cfg.BACKBONE_3D.SA_CONFIG.SAMPLE_METHOD_LIST)
        return iassd_head_loss(
            batch['head_ret'], head_cfg.LOSS_CONFIG, self.num_class,
            self.point_head.box_coder,
            sa_centerness_mask=self.point_head.sa_centerness_mask,
            sample_method_list=sa_list)
