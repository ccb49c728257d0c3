"""3-NN search + inverse-distance-weighted interpolation.

Replaces ``interpolate_gpu.cu:16-177``. Note the CUDA ``three_nn`` returns
*squared* distances (consumers build weights as ``1/(d+1e-8)`` on squared d:
``pointnet2_modules.py:561-565``); we keep that convention.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .sampling import calc_square_dist


def three_nn(unknown, known):
    """Find the 3 nearest ``known`` points for each ``unknown`` point.

    Args:
        unknown: (B, N, 3); known: (B, M, 3).
    Returns:
        dist2: (B, N, 3) squared distances (ascending);
        idx: (B, N, 3) int32 indices into M.
    """
    d2 = calc_square_dist(unknown, known)          # (B, N, M)
    neg, idx = jax.lax.top_k(-d2, 3)
    return -neg, idx.astype(jnp.int32)


def three_interpolate(features, idx, weight):
    """Weighted sum of 3 neighbor features.

    Args:
        features: (B, M, C) channel-last; idx: (B, N, 3); weight: (B, N, 3).
    Returns:
        (B, N, C).

    Channel-last equivalent of ``three_interpolate_kernel``
    (``interpolate_gpu.cu:99-177``); backward is JAX autodiff.
    """
    B, N, _ = idx.shape
    flat = idx.reshape(B, N * 3).astype(jnp.int32)
    gathered = jnp.take_along_axis(features, flat[..., None], axis=1)
    gathered = gathered.reshape(B, N, 3, features.shape[-1])
    return jnp.sum(gathered * weight[..., None], axis=2)


def three_interpolate_weights(dist2, eps=1e-8):
    """Normalized inverse-distance weights (``pointnet2_modules.py:561-565``)."""
    recip = 1.0 / (dist2 + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
