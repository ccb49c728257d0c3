"""AL/MLT-SSD detector: pillar BEV + spherical range-view dual branch.

The reference drives this family through the generic ``PAGNet`` detector
(``detectors/PAGNet.py``) with the pillar configs ``AL.yaml`` /
``MLT_SSD.yaml``: PillarVFE -> Sparse2BEV -> AL_3D -> RB_Fusion ->
CenterHeadIoU. Our registry keeps the point-based PAGNet class separate and
dispatches pillar-style PAGNet configs (those with a VFE block) here.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import numpy as np

from ..backbones_2d import build_backbone_2d
from ..backbones_3d.al_3d import AL3D
from ..dense_heads.center_head_iou import CenterHeadIoU, center_head_iou_loss
from ..map_to_bev import build_map_to_bev
from ..vfe import build_vfe


class ALNet(nn.Module):
    model_cfg: Any
    num_class: int
    voxel_size: Any = (0.16, 0.16, 4)
    point_cloud_range: Any = (0, -39.68, -3, 69.12, 39.68, 1)
    num_point_features: int = 4
    class_names: Any = None

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
        self.backbone_3d = AL3D(model_cfg=self.model_cfg.BACKBONE_3D)
        self.backbone_2d = build_backbone_2d(
            self.model_cfg.BACKBONE_2D.NAME,
            model_cfg=self.model_cfg.BACKBONE_2D)
        self.dense_head = CenterHeadIoU(
            model_cfg=self.model_cfg.DENSE_HEAD,
            num_class=self.num_class,
            grid_size=self.grid_size,
            voxel_size=tuple(float(v) for v in vs),
            point_cloud_range=tuple(float(v) for v in pcr),
            class_names=self.class_names)

    def __call__(self, batch, train: bool = True):
        batch = self.vfe(batch, train=train)
        batch = self.map_to_bev_module(batch, train=train)
        batch = self.backbone_3d(batch, train=train)
        batch = self.backbone_2d(batch, train=train)
        batch = self.dense_head(batch, train=train)
        return batch

    def loss(self, batch):
        import jax.numpy as jnp
        from ...utils.loss_utils import cpgnet_criterion
        cfg = self.model_cfg.DENSE_HEAD
        lw = cfg.LOSS_CONFIG.LOSS_WEIGHTS

        def sem_loss(mask_fg_only):
            """CPGNet CE+Lovasz on per-point semantic logits
            (``center_head_iou.py get_loss`` SEM_TASK / USE_DET_FOR_SEM)."""
            sem_pred = batch['sem_pred']               # (B, N, C)
            target = batch['sem_labels']               # (B, N)
            B, N, C = sem_pred.shape
            flat_p = sem_pred.reshape(B * N, C)
            flat_t = target.reshape(B * N)
            valid = flat_t >= 0
            ratio = 1.0
            if mask_fg_only:                           # USE_DET_FOR_SEM
                valid = valid & (flat_t > 0)
                ratio = jnp.sum(valid) / (B * N)
            out = cpgnet_criterion(
                flat_p, flat_t, weight=lw.get('sem_cs_weight', 'dynamic-log'),
                ignore=lw.get('sem_ignore', None), valid=valid)
            return out['loss'] * ratio * float(lw.get('sem_weight', 3.0))

        if bool(cfg.get('SEM_TASK', False)) and 'sem_labels' in batch:
            l = sem_loss(mask_fg_only=False)
            return l, {'sem_loss': l}

        total, tb = center_head_iou_loss(
            batch['center_head_iou_ret'], cfg.LOSS_CONFIG,
            tuple(cfg.SEPARATE_HEAD_CFG.HEAD_ORDER))
        if bool(cfg.get('USE_DET_FOR_SEM', False)) and 'sem_labels' in batch:
            l = sem_loss(mask_fg_only=True)
            tb = dict(tb)
            tb['sem_loss'] = l
            total = total + l
        return total, tb
