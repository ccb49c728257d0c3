"""Generic image U-Net registered as a BACKBONE_2D slot.

Rebuild of ``backbones_2d/unets.py:46-122`` (``U_Net``): 5-level
encoder-decoder, ``conv_block`` = 2x(conv3x3 + BN + ReLU) (``:7-26``),
``up_conv`` = nearest-2x upsample + conv3x3 + BN + ReLU (``:28-44``),
final 1x1 conv to ``out_ch``. The reference constructor overrides its
``in_ch`` argument to 16 (``:54``) so the filter pyramid is always
[16, 32, 64, 128, 256]; we keep that quirk for weight-shape parity.

Like the reference this module is registered but exercised by no shipped
config (the reference's forward takes/returns raw NCHW tensors, not the
``data_dict`` contract); it exists for registry parity and as a reusable
block. NHWC here so XLA tiles the convs onto the MXU. The sibling variants
in the reference file (R2U_Net, AttU_Net, R2AttU_Net, NestedUNet,
``unets.py:167-661``) are neither registered nor referenced anywhere and
are intentionally not rebuilt.
"""
from __future__ import annotations

import flax.linen as nn
import jax


class ConvBlock(nn.Module):
    """2x (conv3x3 + BN + ReLU) — ``unets.py:7-26``."""
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(2):
            x = nn.Conv(self.out_ch, (3, 3), padding=1, name=f'conv{i}')(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5, name=f'bn{i}')(x)
            x = nn.relu(x)
        return x


class UpConv(nn.Module):
    """nearest-2x upsample + conv3x3 + BN + ReLU — ``unets.py:28-44``."""
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method='nearest')
        x = nn.Conv(self.out_ch, (3, 3), padding=1, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=0.9, epsilon=1e-5, name='bn')(x)
        return nn.relu(x)


class UNet(nn.Module):
    """``U_Net`` (``unets.py:46-122``): NHWC in, NHWC out (``out_ch``)."""
    out_ch: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        filters = [16, 32, 64, 128, 256]

        skips = []
        for i, f in enumerate(filters):
            if i > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = ConvBlock(f, name=f'enc{i + 1}')(x, train)
            skips.append(x)

        for i in range(len(filters) - 1, 0, -1):
            x = UpConv(filters[i - 1], name=f'up{i + 1}')(x, train)
            x = jax.numpy.concatenate([skips[i - 1], x], axis=-1)
            x = ConvBlock(filters[i - 1], name=f'dec{i + 1}')(x, train)

        return nn.Conv(self.out_ch, (1, 1), name='out_conv')(x)
