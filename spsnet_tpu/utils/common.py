"""Shared geometry helpers usable inside jit (jnp) and on host (numpy in).

Conventions follow the reference (``pcdet/utils/common_utils.py:35-57``):
boxes are ``[x, y, z, dx, dy, dz, heading]`` with (x, y, z) the box center and
heading a rotation about +z (x toward y).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rotate_points_along_z(points, angle):
    """Rotate points about +z by `angle`.

    Args:
        points: (B, N, 3 + C)
        angle: (B,) radians; x rotates toward y for positive angle.
    Returns:
        (B, N, 3 + C) rotated points (extra channels passed through).

    Matches the row-vector convention of the reference
    (``common_utils.rotate_points_along_z``): ``p_rot = p @ R`` with
    ``R = [[cos, sin, 0], [-sin, cos, 0], [0, 0, 1]]``.
    """
    cosa = jnp.cos(angle)
    sina = jnp.sin(angle)
    zeros = jnp.zeros_like(angle)
    ones = jnp.ones_like(angle)
    rot = jnp.stack([
        cosa, sina, zeros,
        -sina, cosa, zeros,
        zeros, zeros, ones,
    ], axis=1).reshape(-1, 3, 3)
    xyz = jnp.einsum('bnj,bjk->bnk', points[..., 0:3], rot)
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def limit_period(val, offset=0.5, period=np.pi * 2):
    """Wrap angle so that ``val - k*period`` lies in ``[-offset*period, (1-offset)*period)``."""
    return val - jnp.floor(val / period + offset) * period


def angle_in_limit_numpy(angle):
    """Normalize heading to [-pi, pi) (numpy, host side)."""
    return angle - np.floor(angle / (2 * np.pi) + 0.5) * 2 * np.pi
