"""SPSNet stability (point-uncertainty) regressor — the CVAE ``Generate_center``.

Rebuild of ``stability_generate/model.py`` (imported by the reference as
``surface_uncertainty.model`` — SURVEY.md §2.5 naming caveat; unified here):

- ``SurfacePWFeature`` (:34-168): one D-FPS SA layer (identity sampling at
  npoint == N), MSG radii [0.2, 0.8], aggregation 64 -> per-point soc_feature.
- ``EncoderSurfaceFeature`` (:172-184): two Linears -> (mu, logvar) of an
  8-d latent Gaussian per point. NOTE the reference uses scale = exp(logvar)
  (not exp(logvar/2)) when building the distribution — kept.
- ``ObjectFeatEncoder`` (:187-219): concat(feature, z) -> MLP -> 3-d center
  offset.
- Train loss (:454-508): masked smooth-L1 center regression on layer-1 fg
  points + 5e-4 * sum-of-L2-norms of params + 5e-2 * mean KL(N(0,1) || q)
  on fg + 5e-2 * mean KL(N(mu, 20) || q) on bg.
- Eval (:575-580): ``stds = sum_dim exp(0.5 * logvar)`` — the per-point
  stability scalar consumed by the SPSNet samplers and delete hook.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.dense_heads import target_assign
from ..models.sa_module import SAModuleMSGWithSampling
from ..utils import box_utils, loss_utils

_SCALE_EPS = 3e-22


class EncoderSurfaceFeature(nn.Module):
    latent_size: int = 8

    @nn.compact
    def __call__(self, features):
        mu = nn.Dense(self.latent_size, name='fc_mu')(features)
        logvar = nn.Dense(self.latent_size, name='fc_logvar')(features)
        return mu, logvar


class ObjectFeatEncoder(nn.Module):
    """fc(72->64) relu -> fc(64->64) relu -> fc(64->64) relu -> fc(64->3)."""

    @nn.compact
    def __call__(self, x, z):
        h = jnp.concatenate([x, z], axis=-1)
        h = nn.relu(nn.Dense(64, name='fc1')(h))
        feat = nn.relu(nn.Dense(64, name='fc2')(h))
        h = nn.relu(nn.Dense(64, name='fc_ce1')(feat))
        return nn.Dense(3, use_bias=False, name='fc_ce2')(h)


class GenerateCenter(nn.Module):
    model_cfg: Any

    def setup(self):
        sa_cfg = self.model_cfg.SA_CONFIG
        mlps = [list(m) for m in sa_cfg.MLPS[0]]
        agg = list(sa_cfg.AGGREGATION_MLPS[0]) \
            if sa_cfg.get('AGGREGATION_MLPS', None) else None
        self.feature_extract = SAModuleMSGWithSampling(
            npoint_list=list(sa_cfg.NPOINT_LIST[0]),
            sample_range_list=list(sa_cfg.SAMPLE_RANGE_LIST[0]),
            sample_type_list=list(sa_cfg.SAMPLE_METHOD_LIST[0]),
            radii=list(sa_cfg.RADIUS_LIST[0]),
            nsamples=list(sa_cfg.NSAMPLE_LIST[0]),
            mlps=mlps,
            num_class=1,
            aggregation_mlp=agg,
            confidence_mlp=None,
            name='surface_pw_feature')
        self.feature_encoder = EncoderSurfaceFeature(
            latent_size=int(self.model_cfg.LATENT_DIM), name='feature_encoder')
        self.obj_encoder = ObjectFeatEncoder(name='obj_encoder')
        # model_V3 variant (``stability_generate/model_V3.py``): DenseEdgeConv
        # surface features gathered at the sampled points and concatenated
        # into soc_feature before the latent heads
        self.use_surface = bool(self.model_cfg.get('USE_SURFACE', False))
        if self.use_surface:
            from ..models.surface_feature import FeatureExtraction
            self.sf_extract = FeatureExtraction(name='sf_extract')

    def __call__(self, batch, train: bool = True):
        """Returns ret dict; eval adds ``stds`` (B, N)."""
        points = batch['points']
        xyz = points[..., 0:3]
        features = points[..., 3:] if points.shape[-1] > 3 else None
        new_xyz, soc_feature, _, sampled_idx, _ = self.feature_extract(
            xyz, features, train=train)
        if self.use_surface:
            from .. import ops
            sf = self.sf_extract(xyz)                     # (B, N, 60)
            sf = ops.gather_points(sf, sampled_idx)       # at sampled points
            soc_feature = jnp.concatenate([sf, soc_feature], axis=-1)
        mu, logvar = self.feature_encoder(soc_feature)

        ret = {'soc_feature': soc_feature, 'mu': mu, 'logvar': logvar,
               'layer_xyz': new_xyz}
        if train:
            eps = jax.random.normal(self.make_rng('latent'), mu.shape)
            # reference reparametrize uses std = exp(0.5 * logvar) (:243-247)
            z = mu + eps * jnp.exp(0.5 * logvar)
            ret['center_pred'] = self.obj_encoder(soc_feature, z)
        else:
            ret['stds'] = jnp.sum(jnp.exp(0.5 * logvar), axis=-1)
        return ret


def assign_stability_targets(layer_xyz, gt_boxes):
    """Layer-1 fg mask + point->box-center offsets (``model.py:363-370,
    392-407``): gt with [0.5] extension, ignore flags on the ring."""
    if gt_boxes.shape[-1] == 10:
        gt_boxes = jnp.concatenate(
            [gt_boxes[..., 0:7], gt_boxes[..., -1:]], axis=-1)
    ext = box_utils.enlarge_box3d(gt_boxes, [0.5, 0.5, 0.5])
    t = target_assign.assign_targets_iassd(
        jax.lax.stop_gradient(layer_xyz), gt_boxes, ext,
        set_ignore_flag=True, num_class=3)
    offsets = layer_xyz - t.gt_box_of_points[..., 0:3]
    return t.fg_mask, offsets


def _params_l2_norm_sum(params):
    """Sum of per-tensor L2 norms (NOT squared) — ``l2_regularisation``
    (``model.py:24-32``)."""
    leaves = jax.tree_util.tree_leaves(params)
    # sqrt(x+eps): plain norm has a NaN gradient at exactly-zero tensors
    # (flax biases init to zero; torch's non-zero init hid this in the ref).
    return sum(jnp.sqrt(jnp.sum(leaf ** 2) + 1e-12) for leaf in leaves)


def _kl_diag_normal(mu1, sigma1, mu2, sigma2):
    """KL(N(mu1, sigma1^2) || N(mu2, sigma2^2)) summed over the last dim."""
    return jnp.sum(
        jnp.log(sigma2 / sigma1)
        + (sigma1 ** 2 + (mu1 - mu2) ** 2) / (2.0 * sigma2 ** 2) - 0.5,
        axis=-1)


def generate_center_loss(params, ret, gt_boxes, code_weights=None):
    """Full training loss (``model.py:454-508``). Returns (loss, tb_dict)."""
    fg_mask, gt_offsets = assign_stability_targets(ret['layer_xyz'], gt_boxes)
    fg = fg_mask.astype(jnp.float32)
    pos_norm = jnp.clip(jnp.sum(fg), 1.0, None)
    w = fg / pos_norm

    reg = loss_utils.weighted_smooth_l1(
        ret['center_pred'], jax.lax.stop_gradient(gt_offsets), weights=w,
        code_weights=code_weights).sum()

    l2 = 5e-4 * _params_l2_norm_sum(params)

    mu = ret['mu']
    sigma = jnp.exp(ret['logvar']) + _SCALE_EPS
    kl_fg_all = _kl_diag_normal(jnp.zeros_like(mu), jnp.ones_like(sigma),
                                mu, sigma)
    kl_fg = 5e-2 * jnp.sum(kl_fg_all * fg) / pos_norm
    bg = 1.0 - fg
    kl_bg_all = _kl_diag_normal(mu, jnp.full_like(sigma, 20.0), mu, sigma)
    kl_bg = 5e-2 * jnp.sum(kl_bg_all * bg) / jnp.clip(jnp.sum(bg), 1.0, None)

    loss = reg + l2 + kl_fg + kl_bg
    tb = {'center_loss_box': reg, 'l2_reg': l2, 'lattent_loss': kl_fg,
          'lattent_loss2': kl_bg, 'loss': loss}
    return loss, tb
