"""IA-SSD encoder: SA-with-sampling chain + vote layer.

TPU-native rebuild of ``IASSD_Backbone`` (``backbones_3d/IASSD_backbone.py``):
the flat ``(ΣN, 5)`` stacked layout becomes dense ``(B, N, C)`` tensors — the
reference already asserts equal per-frame counts (``IASSD_backbone.py:120``),
so nothing is lost and the whole chain jits into one XLA program.

Config keys consumed (``SA_CONFIG``): NPOINT_LIST, SAMPLE_RANGE_LIST,
SAMPLE_METHOD_LIST, RADIUS_LIST, NSAMPLE_LIST, MLPS, LAYER_TYPE, DILATED_GROUP,
AGGREGATION_MLPS, CONFIDENCE_MLPS, LAYER_INPUT, CTR_INDEX, MAX_TRANSLATE_RANGE
(see ``tools/cfgs/kitti_models/IA-SSD.yaml:32-57``).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ... import ops
from ...ops.sampling import fps_seeding_active
from ..sa_module import SAModuleMSGWithSampling, VoteLayer
from ..surface_feature import FeatureExtraction


def _layer_fps_ordered(sampled_here: bool, npoint0: int,
                       prev_ordered: bool) -> bool:
    """Order flag for a pure-D-FPS SA layer's output chain.

    ``encoder_xyz[j]`` is "a D-FPS chain in selection order" only if the
    layer actually ran EXACT FPS: a pass-through (n <= npoint) inherits
    the input's order, and a SEEDED run (fps_seeding_active for the
    layer's own npoint — sample_dfps is a gated call site) emits seed
    picks first, which is NOT an FPS chain, so downstream prefix
    shortcuts must not fire. Unit-tested in test_ops_sampling.py.
    """
    if not sampled_here:
        return prev_ordered
    return not fps_seeding_active(npoint0, allow_seed=True)


class IASSDBackbone(nn.Module):
    """Also serves as ``PAGNet_Backbone`` (``backbones_3d/PAGNet_backbone.py``)
    when ``SA_CONFIG.USE_SURFACE`` is set: a DenseEdgeConv 60-d surface
    descriptor is computed on the raw cloud, gathered along the sampling chain
    of SA layers 0-3 (``PAGNet_backbone.py:152-158``), and fed to the vote
    layer as extra features; per-point ``stds`` (SPSNet stability) thread
    through every SA call."""
    model_cfg: Any
    num_class: int
    input_channels: int

    def setup(self):
        sa_cfg = self.model_cfg.SA_CONFIG
        self.layer_types = list(sa_cfg.LAYER_TYPE)
        self.ctr_idx_list = list(sa_cfg.CTR_INDEX)
        self.layer_inputs = list(sa_cfg.LAYER_INPUT)
        aggregation_mlps = sa_cfg.get('AGGREGATION_MLPS', None)
        confidence_mlps = sa_cfg.get('CONFIDENCE_MLPS', None)
        max_translate = sa_cfg.get('MAX_TRANSLATE_RANGE', None)

        channel_in = self.input_channels - 3
        channel_out_list = [channel_in]
        modules = []
        # dfps_layer[j]: encoder_xyz[j] is configured as the output of a pure
        # single-D-FPS SA layer. A later D-FPS layer fed such an input
        # prefix-nests: its result IS arange(npoint) (see
        # SAModuleMSGWithSampling._sample) — the layer-2 FPS of IA-SSD
        # becomes free. Whether the producing layer actually RAN FPS (vs the
        # n <= npoint pass-through, whose output keeps the input's order) is
        # shape-dependent, so the final fps_ordered flag is re-derived from
        # concrete shapes in __call__ and passed per call.
        fps_ordered = [False]
        for k in range(len(sa_cfg.NSAMPLE_LIST)):
            layer_input = self.layer_inputs[k]
            if isinstance(layer_input, list):
                channel_in = channel_out_list[layer_input[-1]]
            else:
                channel_in = channel_out_list[layer_input]

            if self.layer_types[k] == 'SA_Layer':
                mlps = [list(m) for m in sa_cfg.MLPS[k]]
                channel_out = sum(m[-1] for m in mlps) if mlps else 0
                aggregation_mlp = None
                if aggregation_mlps and aggregation_mlps[k]:
                    aggregation_mlp = list(aggregation_mlps[k])
                    channel_out = aggregation_mlp[-1]
                confidence_mlp = None
                if confidence_mlps and confidence_mlps[k]:
                    confidence_mlp = list(confidence_mlps[k])

                ss_radii = sa_cfg.get('SS_RADIUS_LIST', None)
                ss_nsamples = sa_cfg.get('SS_NSAMPLE_LIST', None)
                methods = list(sa_cfg.SAMPLE_METHOD_LIST[k])
                samples_here = self.ctr_idx_list[k] == -1
                in_idx = (layer_input[-1] if isinstance(layer_input, list)
                          else layer_input)
                fps_ordered.append(
                    samples_here and methods == ['D-FPS']
                    and (list(sa_cfg.NPOINT_LIST[k])[0] > 0))
                modules.append(SAModuleMSGWithSampling(
                    npoint_list=list(sa_cfg.NPOINT_LIST[k]),
                    sample_range_list=list(sa_cfg.SAMPLE_RANGE_LIST[k]),
                    sample_type_list=methods,
                    input_fps_ordered=bool(fps_ordered[in_idx]),
                    radii=list(sa_cfg.RADIUS_LIST[k]),
                    nsamples=list(sa_cfg.NSAMPLE_LIST[k]),
                    mlps=mlps,
                    num_class=self.num_class,
                    use_xyz=True,
                    dilated_group=bool(sa_cfg.DILATED_GROUP[k]),
                    aggregation_mlp=aggregation_mlp,
                    confidence_mlp=confidence_mlp,
                    ss_radius=(ss_radii[k][0] if ss_radii and len(ss_radii[k]) else None),
                    ss_nsample=(ss_nsamples[k][0] if ss_nsamples and len(ss_nsamples[k]) else None),
                    name=f'sa_{k}',
                ))
            elif self.layer_types[k] == 'Vote_Layer':
                fps_ordered.append(False)
                channel_out = channel_out_list[layer_input]
                modules.append(VoteLayer(
                    mlp_list=list(sa_cfg.MLPS[k]),
                    max_translate_range=max_translate,
                    name=f'vote_{k}',
                ))
            else:
                raise NotImplementedError(self.layer_types[k])
            channel_out_list.append(channel_out)
        self.sa_modules = modules
        self._dfps_static = fps_ordered
        self._npoint0 = [
            (int(sa_cfg.NPOINT_LIST[k][0])
             if self.layer_types[k] == 'SA_Layer' and sa_cfg.NPOINT_LIST[k]
             else 0)
            for k in range(len(sa_cfg.NSAMPLE_LIST))]
        self.num_point_features = channel_out
        if sa_cfg.get('USE_SURFACE', False):
            self.sf_extract = FeatureExtraction(name='sf_extract')
        else:
            self.sf_extract = None

    def __call__(self, batch, train: bool = True):
        """
        Args:
            batch: dict with 'points' (B, N, C_in) [x, y, z, feat...] and
                optionally 'stds' (B, N) from the stability model (SPSNet).
        Returns: batch updated with
            centers/centers_origin/ctr_offsets: (B, M, 3),
            centers_features: (B, M, C), encoder_xyz: list, sa_ins_preds: list.
        """
        points = batch['points']
        xyz = points[..., 0:3]
        features = points[..., 3:] if points.shape[-1] > 3 else None
        stds = batch.get('stds', None)

        encoder_xyz, encoder_features, sa_ins_preds = [xyz], [features], []
        li_cls_pred = None
        centers = centers_origin = ctr_offsets = None
        surface_feature = None
        # fps_ordered[j]: encoder_xyz[j] is a D-FPS chain in selection order.
        # Re-derived here from concrete shapes: a configured D-FPS layer whose
        # input already fits (n <= npoint) pass-throughs identically, so its
        # output inherits the INPUT's order instead of becoming a chain.
        fps_ordered = [False]
        for i, module in enumerate(self.sa_modules):
            in_idx = self.layer_inputs[i]
            if isinstance(in_idx, list):
                in_idx = in_idx[-1]
            xyz_input = encoder_xyz[self.layer_inputs[i]]
            feat_input = encoder_features[self.layer_inputs[i]]

            if self.layer_types[i] == 'SA_Layer':
                ctr_xyz = (encoder_xyz[self.ctr_idx_list[i]]
                           if self.ctr_idx_list[i] != -1 else None)
                if self._dfps_static[i + 1] and ctr_xyz is None:
                    sampled_here = xyz_input.shape[1] > self._npoint0[i]
                    fps_ordered.append(_layer_fps_ordered(
                        sampled_here, self._npoint0[i],
                        fps_ordered[in_idx]))
                else:
                    fps_ordered.append(False)
                li_xyz, li_features, li_cls_pred, sampled_idx, stds = module(
                    xyz_input, feat_input, li_cls_pred, ctr_xyz=ctr_xyz,
                    stds=stds, train=train,
                    input_fps_ordered=bool(fps_ordered[in_idx]))
                if self.sf_extract is not None and i <= 3:
                    if i == 0:
                        surface_feature = self.sf_extract(xyz)
                    surface_feature = ops.gather_points(
                        surface_feature, sampled_idx)
            else:  # Vote_Layer
                fps_ordered.append(False)
                li_xyz, li_features, xyz_select, ctr_offsets = module(
                    xyz_input, feat_input,
                    surface_features=surface_feature,
                    train=train)
                centers = li_xyz
                centers_origin = xyz_select
                li_cls_pred = None

            encoder_xyz.append(li_xyz)
            encoder_features.append(li_features)
            sa_ins_preds.append(li_cls_pred if li_cls_pred is not None else None)

        batch = dict(batch)
        batch['ctr_offsets'] = ctr_offsets
        batch['centers'] = centers
        batch['centers_origin'] = centers_origin
        batch['centers_features'] = encoder_features[-1]
        batch['encoder_xyz'] = encoder_xyz
        batch['sa_ins_preds'] = sa_ins_preds
        batch['encoder_features'] = encoder_features
        return batch
