"""ImageVFE: CaDDN's camera-to-voxel feature encoder.

Rebuild of ``vfe/image_vfe.py`` + ``image_vfe_modules/``:
- ``DDN`` (``ffn/ddn/ddn_template.py``): image backbone producing stride-4
  features plus per-pixel depth-bin logits. The reference wraps torchvision's
  deeplabv3_resnet101 with ImageNet weights pulled from the hub; offline and
  framework-native, we use a compact flax residual encoder with a dilated
  (ASPP-lite) classifier head trained from scratch — same interface
  (features (B, H/4, W/4, C), logits (B, H/4, W/4, D+1)), documented
  deviation.
- ``DepthFFN.create_frustum_features`` (:70-93): softmax over D+1 bins, drop
  the beyond-range bin, outer-product with the reduced image features.
- ``FrustumGridGenerator``/``Sampler`` (``f2v/``): voxel centers -> lidar ->
  camera -> image plane; continuous depth -> bin index (UD/LID/SID,
  ``transform_utils.bin_depths``); trilinear grid-sample of the frustum
  volume with zero padding (kornia-free jnp).
- ``DDNLoss`` + ``Balancer`` (``ffn/ddn_loss/``): focal CE on binned lidar
  depth maps with 2D-box foreground/background balancing.
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- depth bins
def bin_depths(depth_map, mode, depth_min, depth_max, num_bins, target=False):
    """Continuous depth -> bin index (``transform_utils.bin_depths``)."""
    if mode == 'UD':
        bin_size = (depth_max - depth_min) / num_bins
        indices = (depth_map - depth_min) / bin_size
    elif mode == 'LID':
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        indices = -0.5 + 0.5 * jnp.sqrt(
            1 + 8 * (depth_map - depth_min) / bin_size)
    elif mode == 'SID':
        indices = num_bins * (jnp.log(1 + depth_map) -
                              math.log(1 + depth_min)) / \
            (math.log(1 + depth_max) - math.log(1 + depth_min))
    else:
        raise NotImplementedError(mode)
    if target:
        # out-of-bounds -> the extra "beyond range" class, then floor
        bad = (indices < 0) | (indices > num_bins) | ~jnp.isfinite(indices)
        indices = jnp.where(bad, float(num_bins), indices)
        indices = jnp.floor(jnp.clip(indices, 0, num_bins)).astype(jnp.int32)
    return indices


# ------------------------------------------------------------------ backbone
class _ResBlock(nn.Module):
    ch: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train):
        h = nn.Conv(self.ch, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3)(h)
        h = nn.relu(h)
        h = nn.Conv(self.ch, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3)(h)
        if x.shape[-1] != self.ch or self.strides != 1:
            x = nn.Conv(self.ch, (1, 1), strides=(self.strides, self.strides),
                        use_bias=False, name='proj')(x)
        return nn.relu(h + x)


class DDN(nn.Module):
    """Depth distribution network (interface parity: ``ddn_template.py``)."""
    num_bins: int
    feat_channels: int = 64

    @nn.compact
    def __call__(self, images, train: bool = True):
        """images: (B, H, W, 3) NHWC -> features (B, H/4, W/4, C),
        logits (B, H/4, W/4, num_bins + 1)."""
        c = self.feat_channels
        x = nn.Conv(c // 2, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name='stem')(images)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, name='stem_bn')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feat = _ResBlock(c, name='layer1a')(x, train)       # stride 4
        feat = _ResBlock(c, name='layer1b')(feat, train)

        # deeper context path (dilated, stays at stride 4 like deeplab's
        # dilated layer3/4) + ASPP-lite classifier
        h = _ResBlock(c * 2, name='layer2')(feat, train)
        aspp = []
        for i, d in enumerate((1, 6, 12)):
            a = nn.Conv(c, (3, 3), kernel_dilation=(d, d),
                        padding=((d, d), (d, d)), use_bias=False,
                        name=f'aspp{i}')(h)
            a = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f'aspp{i}_bn')(a)
            aspp.append(nn.relu(a))
        h = jnp.concatenate(aspp, axis=-1)
        logits = nn.Conv(self.num_bins + 1, (1, 1), name='classifier')(h)
        return feat, logits


# ---------------------------------------------------------------- f2v sample
def trilinear_sample(volume, coords):
    """``F.grid_sample`` equivalent: volume (B, D, H, W, C); coords
    (B, X, Y, Z, 3) normalized to [-1, 1] in (u, v, d) order; zeros
    padding. Uses grid_sample's DEFAULT ``align_corners=False`` pixel
    mapping ``((c + 1) * size - 1) / 2`` — the reference's Sampler
    (``f2v/sampler.py:29``) relies on that default even though its
    ``normalize_coords`` divides by ``shape - 1``; reproducing the
    mismatch verbatim is the parity contract
    (test_caddn_forward_parity.py)."""
    B, D, H, W, C = volume.shape
    u = ((coords[..., 0] + 1) * W - 1) / 2
    v = ((coords[..., 1] + 1) * H - 1) / 2
    d = ((coords[..., 2] + 1) * D - 1) / 2

    def corner(ix, iy, iz, w):
        ok = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H) &
              (iz >= 0) & (iz < D))
        flat = (jnp.clip(iz, 0, D - 1) * H * W + jnp.clip(iy, 0, H - 1) * W +
                jnp.clip(ix, 0, W - 1))
        g = jnp.take_along_axis(
            volume.reshape(B, D * H * W, C),
            flat.reshape(B, -1)[..., None], axis=1).reshape(*flat.shape, C)
        return g * (w * ok)[..., None]

    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    z0 = jnp.floor(d).astype(jnp.int32)
    fx = u - x0
    fy = v - y0
    fz = d - z0
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (jnp.where(dx, fx, 1 - fx) * jnp.where(dy, fy, 1 - fy) *
                     jnp.where(dz, fz, 1 - fz))
                out = out + corner(x0 + dx, y0 + dy, z0 + dz, w)
    return out


def make_frustum_grid(grid_size, point_cloud_range, disc, num_bins,
                      lidar_to_cam, cam_to_img, image_shape):
    """(B, 4, 4) x (B, 3, 4) -> (B, X, Y, Z, 3) normalized sample grid.

    Reference-exact (``frustum_grid_generator.py:30-146`` +
    ``transform_utils.py``), parity-tested against the reference's own
    FrustumGridGenerator (test_caddn_forward_parity.py):
    - image coords are normalized by the FULL-RES image shape minus one
      (``normalize_coords`` divides by ``shape - 1``); the downsample
      factor deliberately does NOT enter here — it acts only through the
      sampler's feature resolution (the half-pixel offset this
      combination produces vs "divide u by the stride" is part of the
      trained-checkpoint contract);
    - dehomogenization follows kornia's ``1 / (z + eps)`` guarded form;
    - non-finite grid entries -> -2 (out of bounds).
    """
    X, Y, Z = [int(g) for g in grid_size]
    pcr = np.asarray(point_cloud_range, np.float32)
    vs = (pcr[3:] - pcr[:3]) / np.asarray([X, Y, Z], np.float32)
    ix, iy, iz = np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z),
                             indexing='ij')
    centers = np.stack([ix, iy, iz], axis=-1).astype(np.float32) + 0.5
    lidar = centers * vs + pcr[:3]                   # (X, Y, Z, 3)
    lidar_h = jnp.concatenate(
        [jnp.asarray(lidar), jnp.ones((X, Y, Z, 1))], axis=-1)

    cam = jnp.einsum('bij,xyzj->bxyzi', lidar_to_cam, lidar_h)[..., :3]
    cam_h = jnp.concatenate([cam, jnp.ones(cam.shape[:-1] + (1,))],
                            axis=-1)
    img_pts = jnp.einsum('bij,bxyzj->bxyzi', cam_to_img, cam_h)
    depth = img_pts[..., 2] - cam_to_img[:, 2, 3][:, None, None, None]
    z = img_pts[..., 2:3]
    scale = jnp.where(jnp.abs(z) > 1e-8, 1.0 / (z + 1e-8), 1.0)
    uv = img_pts[..., :2] * scale

    d_bin = bin_depths(depth, disc['mode'], float(disc['depth_min']),
                       float(disc['depth_max']), num_bins)
    H_img, W_img = [float(s) for s in image_shape]
    norm_u = uv[..., 0] / (W_img - 1) * 2 - 1
    norm_v = uv[..., 1] / (H_img - 1) * 2 - 1
    norm_d = d_bin / (num_bins - 1) * 2 - 1
    grid = jnp.stack([norm_u, norm_v, norm_d], axis=-1)
    return jnp.where(jnp.isfinite(grid), grid, -2.0)


# ------------------------------------------------------------------- ImageVFE
class ImageVFE(nn.Module):
    model_cfg: Any
    num_point_features: int = 3
    voxel_size: Any = (0.16, 0.16, 0.16)
    point_cloud_range: Any = (2, -30.08, -3.0, 46.8, 30.08, 1.0)
    grid_size: Any = (280, 376, 25)       # (X, Y, Z)

    def setup(self):
        ffn = self.model_cfg.FFN
        self.disc = dict(ffn.DDN.DISCRETIZE) if 'DISCRETIZE' in ffn.DDN \
            else dict(ffn.DISCRETIZE)
        self.num_bins = int(self.disc['num_bins'])
        self.downsample = int(self.model_cfg.get('DOWNSAMPLE_FACTOR', 4))
        self.ddn = DDN(num_bins=self.num_bins,
                       feat_channels=int(ffn.DDN.get('FEAT_CHANNELS', 64)),
                       name='ddn')
        cr = ffn.CHANNEL_REDUCE
        self.reduce_conv = nn.Conv(int(cr['out_channels']),
                                   (int(cr.get('kernel_size', 1)),) * 2,
                                   use_bias=bool(cr.get('bias', False)),
                                   name='channel_reduce')
        self.reduce_bn = nn.BatchNorm(momentum=0.99, epsilon=1e-3,
                                      name='channel_reduce_bn')

    def _frustum_grid(self, lidar_to_cam, cam_to_img, image_shape):
        return make_frustum_grid(self.grid_size, self.point_cloud_range,
                                 self.disc, self.num_bins,
                                 lidar_to_cam, cam_to_img, image_shape)

    def __call__(self, batch, train: bool = True):
        images = batch['images']                     # (B, H, W, 3) NHWC
        feat, logits = self.ddn(images, train=train)
        feat = self.reduce_conv(feat)
        feat = nn.relu(self.reduce_bn(feat, use_running_average=not train))

        # frustum volume: softmax over D+1, drop beyond-range, outer product
        probs = jax.nn.softmax(logits, axis=-1)[..., :self.num_bins]
        # (B, Hf, Wf, D, C) -> (B, D, Hf, Wf, C) for sampling
        frustum = probs[..., None] * feat[..., None, :]
        frustum = jnp.transpose(frustum, (0, 3, 1, 2, 4))

        grid = self._frustum_grid(batch['trans_lidar_to_cam'],
                                  batch['trans_cam_to_img'],
                                  [int(s) for s in self.model_cfg.IMAGE_SHAPE])
        voxels = trilinear_sample(frustum, grid)     # (B, X, Y, Z, C)
        batch = dict(batch)
        batch['voxel_features_3d'] = voxels
        batch['image_vfe_ret'] = {'depth_logits': logits}
        return batch


def image_vfe_loss(ret, batch, loss_cfg, disc_cfg, downsample):
    """Focal CE on binned depth + fg/bg balancing (``ddn_loss.py`` +
    ``balancer.py``). depth_maps (B, H, W); gt_boxes2d (B, N, 4) zero-padded
    [x1, y1, x2, y2] in full-res pixels."""
    logits = ret['depth_logits']                     # (B, Hf, Wf, D+1)
    B, Hf, Wf, Dp1 = logits.shape
    depth = batch['depth_maps']
    # downsample the depth map by striding (reference bins at feature res)
    depth_ds = depth[:, ::downsample, ::downsample][:, :Hf, :Wf]
    target = bin_depths(depth_ds, disc_cfg['mode'],
                        float(disc_cfg['depth_min']),
                        float(disc_cfg['depth_max']),
                        int(disc_cfg['num_bins']), target=True)
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    onehot = jax.nn.one_hot(target, Dp1)
    alpha = float(loss_cfg.get('alpha', 0.25))
    gamma = float(loss_cfg.get('gamma', 2.0))
    focal = -alpha * jnp.power(1 - p, gamma) * logp
    pix_loss = jnp.sum(focal * onehot, axis=-1)      # (B, Hf, Wf)

    boxes = batch['gt_boxes2d'] / downsample         # (B, N, 4)
    ys = jnp.arange(Hf, dtype=jnp.float32)[None, :, None, None]
    xs = jnp.arange(Wf, dtype=jnp.float32)[None, None, :, None]
    valid_box = (boxes[..., 2] > boxes[..., 0])
    inside = ((xs >= boxes[:, None, None, :, 0]) &
              (xs < boxes[:, None, None, :, 2]) &
              (ys >= boxes[:, None, None, :, 1]) &
              (ys < boxes[:, None, None, :, 3]) &
              valid_box[:, None, None, :])
    fg = inside.any(-1)
    fg_w = float(loss_cfg.get('fg_weight', 13.0))
    bg_w = float(loss_cfg.get('bg_weight', 1.0))
    weights = jnp.where(fg, fg_w, bg_w)
    num_pix = float(B * Hf * Wf)
    loss = jnp.sum(pix_loss * weights) / num_pix
    loss = loss * float(loss_cfg.get('weight', 3.0))
    return loss, {'ddn_loss': loss}
