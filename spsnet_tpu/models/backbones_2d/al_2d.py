"""2D blocks for the AL range-view/BEV dual-branch family.

Rebuild of ``backbones_2d/AL_2D.py`` (``BasicBlock``, ``BasicBlock_CP``,
``EncBlock``, ``DecBlock``, ``CP_Unet``) and the attention/fusion pieces in
``backbones_3d/AL_3D.py`` (``ChannelAttention`` :22, ``SpatialAttention``
:52, ``CBAM`` :66, ``Space2Depth`` :105, ``FusionBlock`` :130).

All NHWC so XLA tiles the convolutions onto the MXU. BatchNorm follows the
reference's ``norm_fn`` (eps=1e-3, torch momentum 0.01 -> flax 0.99).

Known reference defect, fixed here: the base ``AL_3D`` builds its range-view
``CP_Unet`` WITHOUT ``range_view=True`` (``AL_3D.py:314``), so its encoder
halves the 32-row range image to 4 rows while ``FusionBlock`` upsamples width
only — the channel concat at ``AL_3D.py:187-189`` would crash on the height
mismatch. ``AL_3D_V3`` (:371) passes ``range_view=True``; we follow the
working variant (width-only pooling in the range branch) everywhere.
"""
from __future__ import annotations

from typing import Sequence

import einops
import flax.linen as nn
import jax.numpy as jnp


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                        epsilon=1e-3, name=name)


class BasicBlock(nn.Module):
    """Two plain conv+BN+relu (``AL_2D.BasicBlock``; its residual add is
    commented out in the reference, so none here either)."""
    planes: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                    name='conv1')(x)
        x = _bn(train, 'bn1')(x)
        x = nn.relu(x)
        x = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                    name='conv2')(x)
        x = _bn(train, 'bn2')(x)
        return nn.relu(x)


class BasicBlockCP(nn.Module):
    """Conv(+dilation) + BN + relu (``AL_2D.BasicBlock_CP``)."""
    out_channels: int
    kernel_size: Sequence[int] = (3, 3)
    dilation: int = 1
    padding: int = 1
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        p = int(self.padding)
        x = nn.Conv(self.out_channels, tuple(self.kernel_size),
                    strides=(self.strides, self.strides),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=((p, p), (p, p)), name='conv')(x)
        x = _bn(train, 'bn')(x)
        return nn.relu(x)


class EncBlock(nn.Module):
    """Dilated conv trio + 1x1 merge + shortcut, then avg-pool downsample
    (``AL_2D.EncBlock``). ``range_view`` pools width only."""
    input_channels: int
    range_view: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = self.input_channels
        o1 = BasicBlockCP(c, (3, 3), 1, 1, name='conv1')(x, train)
        o2 = BasicBlockCP(c, (3, 3), 2, 2, name='conv2')(o1, train)
        o3 = BasicBlockCP(c, (2, 2), 2, 1, name='conv3')(o2, train)
        merged = BasicBlockCP(2 * c, (1, 1), 1, 0, name='conv4')(
            jnp.concatenate([o1, o2, o3], axis=-1), train)
        short = BasicBlockCP(2 * c, (1, 1), 1, 0, name='conv5')(x, train)
        out = merged + short
        win = (1, 2) if self.range_view else (2, 2)
        return nn.avg_pool(out, win, strides=win)


class DecBlock(nn.Module):
    """Transposed-conv upsample + dilated trio + merge (``AL_2D.DecBlock``)."""
    input_channels: int
    range_view: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = self.input_channels // 2
        s = (1, 2) if self.range_view else (2, 2)
        up = nn.ConvTranspose(c, (3, 3), strides=s, padding='SAME',
                              name='transconv')(x)
        up = _bn(train, 'trans_bn')(up)
        up = nn.relu(up)
        o2 = BasicBlockCP(c, (3, 3), 1, 1, name='conv1')(up, train)
        o3 = BasicBlockCP(c, (3, 3), 2, 2, name='conv2')(o2, train)
        o4 = BasicBlockCP(c, (2, 2), 2, 1, name='conv3')(o3, train)
        merged = BasicBlockCP(c, (1, 1), 1, 0, name='conv4')(
            jnp.concatenate([o2, o3, o4], axis=-1), train)
        short = BasicBlockCP(c, (1, 1), 1, 0, name='conv5')(up, train)
        return merged + short


class CPUnet(nn.Module):
    """4-level CPGNet-style U-Net (``AL_2D.CP_Unet``, layers_num=4).

    Returns (out, {'e1','e2','e3','d0'}) like the reference forward.
    """
    input_channels: int
    output_channels: int
    range_view: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = self.input_channels
        e0 = BasicBlock(c, name='pre_conv')(x, train)
        e1 = EncBlock(c, self.range_view, name='enc0')(e0, train)
        e2 = EncBlock(2 * c, self.range_view, name='enc1')(e1, train)
        e3 = EncBlock(4 * c, self.range_view, name='enc2')(e2, train)

        d0 = DecBlock(8 * c, self.range_view, name='dec0')(e3, train)
        d0 = BasicBlock(4 * c, name='basic0')(
            jnp.concatenate([e2, d0], axis=-1), train)
        d1 = DecBlock(4 * c, self.range_view, name='dec1')(d0, train)
        d1 = BasicBlock(2 * c, name='basic1')(
            jnp.concatenate([e1, d1], axis=-1), train)
        d2 = DecBlock(2 * c, self.range_view, name='dec2')(d1, train)
        d2 = BasicBlock(c, name='basic2')(
            jnp.concatenate([e0, d2], axis=-1), train)
        out = nn.Conv(self.output_channels, (1, 1), name='out_conv')(d2)
        return out, {'e1': e1, 'e2': e2, 'e3': e3, 'd0': d0}


class ChannelAttention(nn.Module):
    """Squeeze-excite over global avg+max pools (``AL_3D.ChannelAttention``)."""
    channels: int
    ratio: int = 16

    @nn.compact
    def __call__(self, x):
        hidden = max(self.channels // self.ratio, 1)
        fc1 = nn.Dense(hidden, use_bias=False, name='fc1')
        fc2 = nn.Dense(self.channels, use_bias=False, name='fc2')
        avg = x.mean(axis=(1, 2))
        mx = x.max(axis=(1, 2))
        out = fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx)))
        return nn.sigmoid(out)[:, None, None, :]


class SpatialAttention(nn.Module):
    """7x7 conv over channel avg/max maps (``AL_3D.SpatialAttention``)."""
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        stat = jnp.stack([x.mean(axis=-1), x.max(axis=-1)], axis=-1)
        att = nn.Conv(1, (k, k), padding=((k // 2, k // 2), (k // 2, k // 2)),
                      use_bias=False, name='conv')(stat)
        return nn.sigmoid(att)


class CBAM(nn.Module):
    """Residual conv block with channel+spatial attention (``AL_3D.CBAM``)."""
    planes: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name='conv1')(x)
        out = _bn(train, 'bn1')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name='conv2')(out)
        out = _bn(train, 'bn2')(out)
        out = ChannelAttention(self.planes, name='ca')(out) * out
        out = SpatialAttention(name='sa')(out) * out
        return nn.relu(out + x)


class Space2Depth(nn.Module):
    """Space-to-depth then 1x1 compress (``AL_3D.Space2Depth``). The torch
    ``unfold`` channel order differs only by a fixed permutation the learned
    1x1 conv absorbs."""
    output_channels: int

    @nn.compact
    def __call__(self, x, down_scale: int, train: bool = True):
        if down_scale > 1:
            x = einops.rearrange(x, 'b (h s1) (w s2) c -> b h w (c s1 s2)',
                                 s1=down_scale, s2=down_scale)
        x = nn.Conv(self.output_channels, (1, 1), name='compress')(x)
        x = _bn(train, 'bn')(x)
        return nn.relu(x)


class FusionBlock(nn.Module):
    """Range-decoder + RV->PW->BEV re-projection (``AL_3D.FusionBlock``).

    Takes the range encoder's pyramid {e1,e2,e3}, decodes it back to full
    range resolution with CBAM-gated width-only transposed convs, projects the
    result through the points onto the BEV lattice, then space-to-depth
    downsamples to the detection stride.
    """
    input_channels: int       # channels of the deepest range feature (e3)
    bev_shape: Sequence[int]  # full-resolution BEV (h, w)

    @nn.compact
    def __call__(self, range_dict, range_uvk, bev_uvk, train: bool = True):
        from . import projection

        c = self.input_channels
        e1 = range_dict['e3']
        e2 = range_dict['e2']
        e3 = range_dict['e1']

        x = CBAM(c, name='cbam1')(e1, train)
        x = nn.ConvTranspose(c // 2, (3, 3), strides=(1, 2), padding='SAME',
                             name='transconv1')(x)
        x = nn.relu(_bn(train, 'trans_bn1')(x))

        x = jnp.concatenate([x, e2], axis=-1)
        x = CBAM(c, name='cbam2')(x, train)
        x = nn.Conv(c // 2, (3, 3), padding=((1, 1), (1, 1)),
                    name='cbam2_conv')(x)
        x = nn.relu(_bn(train, 'cbam2_bn')(x))
        x = nn.ConvTranspose(c // 4, (3, 3), strides=(1, 2), padding='SAME',
                             name='transconv2')(x)
        x = nn.relu(_bn(train, 'trans_bn2')(x))

        x = jnp.concatenate([x, e3], axis=-1)
        x = CBAM(c // 2, name='cbam3')(x, train)
        x = nn.Conv(c // 4, (3, 3), padding=((1, 1), (1, 1)),
                    name='cbam3_conv')(x)
        x = nn.relu(_bn(train, 'cbam3_bn')(x))
        x = nn.ConvTranspose(c // 8, (3, 3), strides=(1, 2), padding='SAME',
                             name='transconv3')(x)
        x = nn.relu(_bn(train, 'trans_bn3')(x))

        # RV -> point-wise -> BEV
        ru, rv, rkeep = range_uvk
        bu, bv, bkeep = bev_uvk
        pw = projection.g2p_bilinear(x, ru, rv, rkeep)
        bev = projection.p2g_max(pw, bu, bv, bkeep, self.bev_shape)

        sd1 = Space2Depth(c // 4, name='sd1')(bev, 2, train)
        sd2 = Space2Depth(c // 2, name='sd2')(sd1, 2, train)
        sd3 = Space2Depth(c // 2, name='sd3')(sd2, 1, train)
        return sd3
