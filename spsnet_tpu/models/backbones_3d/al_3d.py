"""AL_3D: dual-branch (BEV pillar + spherical range-view) 2.5D backbone.

Rebuild of ``backbones_3d/AL_3D.py`` (class ``AL_3D`` :222, with the
``range_view=True`` fix from ``AL_3D_V3`` :371 — see ``al_2d.py`` docstring):

- points are embedded (Dense, no bias) and scatter-maxed into a spherical
  range image; the pillar-VFE BEV map arrives via ``Sparse2BEV``;
- both grids run CP-UNets; the range pyramid is fused back to BEV through the
  points by ``FusionBlock``;
- per-point semantic logits come from bilinear-gathered features of both
  branches (``sem_pred``);
- detection features = concat(BEV unet ``d0``, range->BEV fusion) at 1/4 the
  BEV resolution -> ``spatial_features`` for ``RB_Fusion`` + ``CenterHeadIoU``.

Everything is one fixed-shape jitted program: points stay (B, N, 4); the
reference's ragged ``keep``-filtered lists become masks (``projection.py``).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..backbones_2d import projection
from ..backbones_2d.al_2d import CPUnet, FusionBlock


class AL3D(nn.Module):
    model_cfg: Any

    def setup(self):
        cfg = self.model_cfg
        self.num_range_features = int(cfg.get('NUM_RANGE_FEATURES', 16))
        self.num_bev_features_in = int(cfg.get('NUM_BEV_FEATURES', 64))
        self.num_range_seg = int(cfg.get('NUM_RANGE_SEG_FEATURES', 64))
        self.num_bev_seg = int(cfg.get('NUM_BEV_SEG_FEATURES', 64))
        self.num_fusion = int(cfg.get('NUM_FUSION_FEATURES', 128))
        self.sem_cls = int(cfg.get('SEM_CLS', 4))
        self.pc_range = tuple(float(v) for v in cfg.POINT_CLOUD_RANGE)
        self.v_fov = projection.process_fov(list(cfg.PC_FOV))
        self.bev_shape = tuple(int(v) for v in cfg.BEV_SHAPE)
        self.range_shape = tuple(int(v) for v in cfg.RANGE_SHAPE)

        self.range_embed = nn.Dense(self.num_range_features, use_bias=False,
                                    name='range_embed')
        self.range_unet = CPUnet(self.num_range_features, self.num_range_seg,
                                 range_view=True, name='range_unet')
        self.bev_unet = CPUnet(self.num_bev_features_in, self.num_bev_seg,
                               name='bev_unet')
        self.fusion = FusionBlock(self.num_fusion, self.bev_shape,
                                  name='fusion')
        self.cls_fc1 = nn.Dense(128, name='cls_fc1')
        self.cls_fc2 = nn.Dense(64, name='cls_fc2')
        self.cls_out = nn.Dense(self.sem_cls, name='cls_out')
        self.cls_drop1 = nn.Dropout(0.5)
        self.cls_drop2 = nn.Dropout(0.5)

    # ``num_point_features`` parity attribute (AL_3D.py:250)
    @property
    def num_point_features(self):
        return 128

    def __call__(self, batch, train: bool = True):
        points = batch['points']                   # (B, N, 4+) xyzi
        ori_bev = batch['spatial_features']        # (B, Hb, Wb, C) NHWC
        valid = batch.get('points_valid', None)

        bu, bv, bkeep = projection.bev_coords(points, self.pc_range,
                                              self.bev_shape)
        ru, rv, rkeep = projection.range_coords(points, self.v_fov,
                                                self.range_shape)
        if valid is not None:
            bkeep = bkeep & valid
            rkeep = rkeep & valid

        range_pw = self.range_embed(points[..., :4])
        ori_range = projection.p2g_max(range_pw, ru, rv, rkeep,
                                       self.range_shape)

        encode_bev, bev_dict = self.bev_unet(ori_bev, train)
        encode_range, range_dict = self.range_unet(ori_range, train)

        rv_fusion = self.fusion(range_dict, (ru, rv, rkeep), (bu, bv, bkeep),
                                train)

        # per-point semantic branch
        bev_pw = projection.g2p_bilinear(encode_bev, bu, bv, bkeep)
        rng_pw = projection.g2p_bilinear(encode_range, ru, rv, rkeep)
        sem = jnp.concatenate([bev_pw, rng_pw], axis=-1)
        sem = nn.relu(self.cls_fc1(sem))
        sem = self.cls_drop1(sem, deterministic=not train)
        sem = nn.relu(self.cls_fc2(sem))
        sem = self.cls_drop2(sem, deterministic=not train)
        sem_pred = self.cls_out(sem)               # (B, N, SEM_CLS)

        det = jnp.concatenate([bev_dict['d0'], rv_fusion], axis=-1)
        batch = dict(batch)
        batch['sem_pred'] = sem_pred
        batch['spatial_features'] = det            # (B, Hb/4, Wb/4, C)
        return batch
