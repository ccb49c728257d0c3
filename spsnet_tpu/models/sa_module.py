"""Set-abstraction layer with pluggable sampling + multi-scale grouping.

TPU-native equivalent of ``PointnetSAModuleMSG_WithSampling``
(``pointnet2_modules.py:128-460``) and ``Vote_layer`` (:462-516). Features are
channel-last ``(B, N, C)``; the grouped shared-MLP runs as Dense over
``(B, M, S, C)`` so XLA maps it to batched MXU matmuls, with the max-pool over
the sample axis fused into the epilogue.
"""
from __future__ import annotations

import os
from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import ops
from ..ops.grouping import group_all
from . import samplers
from .blocks import MLPHead, SharedMLP


class SAModuleMSGWithSampling(nn.Module):
    """Sampler dispatch -> MSG grouping -> shared MLPs -> aggregation -> confidence.

    Attributes mirror the reference constructor args
    (``pointnet2_modules.py:133-246``). ``mlps`` entries EXCLUDE the input
    channel (it is inferred); ``use_xyz`` prepends relative coords.
    """
    npoint_list: Sequence[int]
    sample_range_list: Sequence[int]
    sample_type_list: Sequence[str]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    num_class: int
    use_xyz: bool = True
    dilated_group: bool = False
    pool_method: str = 'max_pool'
    aggregation_mlp: Optional[Sequence[int]] = None
    confidence_mlp: Optional[Sequence[int]] = None
    ss_radius: Optional[float] = None          # S-FPS swap radius
    ss_nsample: Optional[int] = None
    sfps_min_unique: int = 3500
    # the input point set is a D-FPS chain in selection order (set by the
    # backbone from static config analysis) — enables the prefix-nesting
    # shortcut in _sample; SPSNET_FPS_PREFIX=0 disables. The backbone
    # overrides this per call with a shape-aware value (a configured D-FPS
    # layer that pass-through'd because n <= npoint emits raw order, not a
    # chain — the static flag alone cannot see that).
    input_fps_ordered: bool = False

    def _sample(self, xyz, features, cls_features, stds,
                input_fps_ordered=None):
        """Run the configured sampler chain; returns (idx, stds)."""
        if input_fps_ordered is None:
            input_fps_ordered = self.input_fps_ordered
        B, N, _ = xyz.shape
        sampled, last_end = [], 0
        out_stds = stds
        for stype, srange, npoint in zip(self.sample_type_list,
                                         self.sample_range_list,
                                         self.npoint_list):
            if npoint <= 0:
                continue
            if srange == -1:
                xyz_t = xyz[:, last_end:]
                feat_t = features[:, last_end:] if features is not None else None
                cls_t = cls_features[:, last_end:] if cls_features is not None else None
            else:
                xyz_t = xyz[:, last_end:srange]
                feat_t = features[:, last_end:srange] if features is not None else None
                cls_t = cls_features[:, last_end:srange] if cls_features is not None else None
                last_end += srange

            n_t = xyz_t.shape[1]
            if n_t <= npoint:
                idx = jnp.broadcast_to(
                    jnp.arange(n_t, dtype=jnp.int32)[None], (B, n_t))
            elif ('cls' in stype) or ('ctr' in stype):
                idx = samplers.sample_ctr_aware(cls_t, npoint)
            elif ('sss' in stype) or ('ss' in stype):
                assert out_stds is not None, f'{stype} sampler needs stds'
                idx, out_stds = samplers.sample_sss_aware(cls_t, out_stds, npoint)
            elif 'S-FPS' in stype or 'SFS' in stype:
                assert out_stds is not None, f'{stype} sampler needs stds'
                idx, out_stds = samplers.sample_sfps(
                    xyz_t, out_stds, npoint, self.ss_radius, self.ss_nsample,
                    min_unique=self.sfps_min_unique)
            elif 'D-FPS' in stype or 'DFS' in stype:
                from ..ops.sampling import fps_seeding_active
                # same engagement condition (incl. the 128-aligned k0
                # rounding) as the sample_dfps dispatch — npoint small
                # enough that seeding disengages keeps the free shortcut
                seeding = fps_seeding_active(npoint, allow_seed=True)
                # chunked FPS emits concatenated per-slice chains, not one
                # selection-order chain — the shortcut would keep slice 0 only
                chunked = int(
                    os.environ.get('SPSNET_FPS_CHUNKS', '1') or '1') > 1
                if (input_fps_ordered and last_end == 0 and not seeding
                        and not chunked
                        and os.environ.get('SPSNET_FPS_PREFIX', '1') != '0'):
                    # prefix-nesting: xyz_t is (a head slice of) a D-FPS
                    # chain in selection order, and FPS restricted to its
                    # own output selects the same chain — pick k of
                    # FPS(chain, m) is the global argmax over the original
                    # cloud, which IS chain[k] (induction from the shared
                    # seed chain[0]). So the result is arange(npoint),
                    # exactly (up to exact-tie ordering), for free.
                    # Property-tested in test_ops_sampling.py.
                    idx = jnp.broadcast_to(
                        jnp.arange(npoint, dtype=jnp.int32)[None],
                        (B, npoint))
                    out_stds = (None if out_stds is None
                                else out_stds[:, :npoint])
                else:
                    idx, out_stds = samplers.sample_dfps(xyz_t, npoint,
                                                         stds=out_stds)
            elif 'F-FPS' in stype or 'FFS' in stype:
                idx = samplers.sample_ffps(xyz_t, feat_t, npoint)
            elif stype == 'FS':
                idx = samplers.sample_fs(xyz_t, feat_t, npoint)
            elif 'Rand' in stype:
                rng = self.make_rng('sampling')
                idx = samplers.sample_rand(rng, B, n_t, npoint)
            elif stype in ('ds_FPS', 'ds-FPS'):
                idx = samplers.sample_ds_fps(xyz_t, npoint)
            elif stype in ('ry_FPS', 'ry-FPS'):
                idx = samplers.sample_ry_fps(xyz_t, npoint)
            else:
                raise NotImplementedError(stype)
            sampled.append(idx)
        return jnp.concatenate(sampled, axis=-1), out_stds

    @nn.compact
    def __call__(self, xyz, features=None, cls_features=None, new_xyz=None,
                 ctr_xyz=None, stds=None, train: bool = True,
                 input_fps_ordered=None):
        """
        Args:
            xyz: (B, N, 3); features: (B, N, C) or None;
            cls_features: (B, N, num_class) from the previous confidence MLP;
            ctr_xyz: (B, M, 3) — group around given centers instead of sampling
                (the vote-center SA, ``pointnet2_modules.py:430-431``);
            stds: (B, N) per-point stability (SPSNet), threaded & re-gathered.
        Returns:
            new_xyz (B, M, 3), new_features (B, M, C'), cls_preds or None,
            sampled_idx (B, M) or None, stds (B, M) or None.
        """
        sampled_idx = None
        if ctr_xyz is None:
            sampled_idx, stds = self._sample(
                xyz, features, cls_features, stds,
                input_fps_ordered=input_fps_ordered)
            new_xyz = ops.gather_points(xyz, sampled_idx)
        else:
            new_xyz = ctr_xyz

        if len(self.radii) > 0:
            from ..ops.grouping import (masked_pool, msg_shared_enabled,
                                        msg_shared_group)
            if self.pool_method not in ('max_pool', 'avg_pool'):
                raise NotImplementedError(self.pool_method)
            scale_feats = []
            if (self.pool_method == 'max_pool'
                    and msg_shared_enabled(self.dilated_group,
                                           len(self.radii))):
                # ONE ball query + ONE neighbor gather for every scale
                # (gather cost is per row on TPU); smaller scales become
                # radius masks at the pool — see ops.msg_shared_group.
                grouped, valids = msg_shared_group(
                    tuple(self.radii), tuple(self.nsamples), xyz, new_xyz,
                    features, use_xyz=self.use_xyz)
                for i, mlp in enumerate(self.mlps):
                    h = SharedMLP(mlp, name=f'mlp_{i}')(grouped, train=train)
                    scale_feats.append(
                        masked_pool(h, valids[i], self.pool_method))
            else:
                # one shared distance computation for all MSG scales
                multi_idx = None
                if not self.dilated_group:
                    from ..ops.grouping import ball_query_multi
                    multi_idx = ball_query_multi(
                        tuple(self.radii), tuple(self.nsamples), xyz, new_xyz)
                for i, (radius, nsample, mlp) in enumerate(
                        zip(self.radii, self.nsamples, self.mlps)):
                    if self.dilated_group:
                        min_radius = 0.0 if i == 0 else self.radii[i - 1]
                        grouped, _ = ops.query_and_group(
                            radius, nsample, xyz, new_xyz, features,
                            use_xyz=self.use_xyz, min_radius=min_radius)
                    else:
                        grouped, _ = ops.query_and_group(
                            radius, nsample, xyz, new_xyz, features,
                            use_xyz=self.use_xyz, idx=multi_idx[i])
                    h = SharedMLP(mlp, name=f'mlp_{i}')(grouped, train=train)
                    scale_feats.append(masked_pool(h, None, self.pool_method))
            new_features = jnp.concatenate(scale_feats, axis=-1)
            if self.aggregation_mlp:
                new_features = SharedMLP(self.aggregation_mlp,
                                         name='aggregation')(new_features, train=train)
        else:
            new_features = ops.gather_points(features, sampled_idx)

        cls_preds = None
        if self.confidence_mlp:
            cls_preds = MLPHead(self.confidence_mlp, self.num_class,
                                name='confidence')(new_features, train=train)

        return new_xyz, new_features, cls_preds, sampled_idx, stds


class VoteLayer(nn.Module):
    """Light voting module with offset limits (``pointnet2_modules.py:462-516``).

    Note the reference returns an *empty* feature tensor from this layer (a
    latent defect masked by ``LAYER_INPUT``, SURVEY.md §2.8); we return the
    pre-vote features unchanged, which downstream configs never read.
    """
    mlp_list: Sequence[int]
    max_translate_range: Optional[Sequence[float]] = None

    @nn.compact
    def __call__(self, xyz, features, surface_features=None, train: bool = True):
        x = features
        if surface_features is not None:
            x = jnp.concatenate([surface_features, x], axis=-1)
        if len(self.mlp_list) > 0:
            x = SharedMLP(self.mlp_list, name='mlp')(x, train=train)
        ctr_offsets = nn.Dense(3, name='ctr_reg')(x)
        if self.max_translate_range is not None:
            limit = jnp.asarray(self.max_translate_range, dtype=xyz.dtype)
            ctr_offsets_limited = jnp.clip(ctr_offsets, -limit, limit)
        else:
            ctr_offsets_limited = ctr_offsets
        vote_xyz = xyz + ctr_offsets_limited
        return vote_xyz, features, xyz, ctr_offsets


class SAModule(nn.Module):
    """Plain single/multi-scale SA layer with D-FPS sampling (PointNet++ SSG/MSG;
    equivalent of ``PointnetSAModuleMSG``/``PointnetSAModule``,
    ``pointnet2_modules.py:86-126,519-536``). ``npoint=None`` groups all."""
    npoint: Optional[int]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    pool_method: str = 'max_pool'

    @nn.compact
    def __call__(self, xyz, features=None, new_xyz=None, train: bool = True):
        if new_xyz is None and self.npoint is not None:
            idx = ops.farthest_point_sample(xyz, self.npoint)
            new_xyz = ops.gather_points(xyz, idx)
        scale_feats = []
        for i, mlp in enumerate(self.mlps):
            if self.npoint is not None:
                grouped, _ = ops.query_and_group(
                    self.radii[i], self.nsamples[i], xyz, new_xyz, features,
                    use_xyz=self.use_xyz)
            else:
                grouped = group_all(xyz, features, use_xyz=self.use_xyz)
            h = SharedMLP(mlp, name=f'mlp_{i}')(grouped, train=train)
            if self.pool_method == 'max_pool':
                h = jnp.max(h, axis=2)
            else:
                h = jnp.mean(h, axis=2)
            scale_feats.append(h)
        return new_xyz, jnp.concatenate(scale_feats, axis=-1)


class FPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + unary MLP
    (equivalent of ``PointnetFPModule``, ``pointnet2_modules.py:539-587``)."""
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 train: bool = True):
        from ..ops.interpolate import three_interpolate, three_interpolate_weights, three_nn
        if known is not None:
            d2, idx = three_nn(unknown, known)
            w = three_interpolate_weights(d2)
            interp = three_interpolate(known_feats, idx, w)
        else:
            interp = jnp.broadcast_to(known_feats,
                                      (known_feats.shape[0], unknown.shape[1],
                                       known_feats.shape[-1]))
        if unknown_feats is not None:
            x = jnp.concatenate([interp, unknown_feats], axis=-1)
        else:
            x = interp
        return SharedMLP(self.mlp, name='mlp')(x, train=train)
