"""Point <-> grid projections for the AL/MLT-SSD range-view family.

Rebuild of ``backbones_2d/map_to_bev/projection.py`` (class ``Projection``):
the reference keeps ragged per-batch point lists, filters them with ``keep``
masks and runs ``torch_scatter.scatter_max`` / gather loops. Here everything
is dense fixed-shape ``(B, N, ...)``:

- out-of-range points are routed to a dump row of the scatter target instead
  of being compacted away (same max result, no dynamic shapes);
- ``scatter_max`` initialises empty cells to 0 like the reference (its
  scatter output is zero-padded to B*H*W, ``projection.py:158-161``);
- the bilinear gather pads the grid by one zero row/col exactly like the
  reference's ``grid_map_`` copy (``projection.py:179-183``), so points whose
  ceil cell falls off the edge blend with zeros;
- gathered features for out-of-range points are zeroed, mirroring the
  reference's ``cmplt_*`` zero buffers (``AL_3D.py:196-201``).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

_EPS = 0.1


def bev_coords(points_xyz, pc_range, bev_shape):
    """Continuous BEV (u, v) + in-range mask (``init_bev_coord``).

    Args:
        points_xyz: (B, N, 3+).
        pc_range: (6,) [x_min, y_min, z_min, x_max, y_max, z_max].
        bev_shape: (h, w).
    Returns:
        u, v: (B, N) float32; keep: (B, N) bool.
    """
    h_bev, w_bev = int(bev_shape[0]), int(bev_shape[1])
    x_min, y_min, _, x_max, y_max, _ = [float(v) for v in pc_range]
    x = points_xyz[..., 0]
    y = points_xyz[..., 1]
    keep = (x > x_min) & (x < x_max) & (y > y_min) & (y < y_max)
    u = (x - x_min) / (x_max - x_min) * w_bev
    v = (y - y_min) / (y_max - y_min) * h_bev
    u = jnp.clip(u, 0.0, w_bev - _EPS)
    v = jnp.clip(v, 0.0, h_bev - _EPS)
    return u, v, keep


def range_coords(points_xyz, v_fov, range_shape):
    """Spherical range-image (u, v) + FOV mask (``init_range_coord``).

    Args:
        points_xyz: (B, N, 3+).
        v_fov: (v_down, v_up) vertical field of view in radians.
        range_shape: (h, w).
    Returns:
        u, v: (B, N) float32; keep: (B, N) bool.
    """
    h_rng, w_rng = int(range_shape[0]), int(range_shape[1])
    v_down, v_up = float(v_fov[0]), float(v_fov[1])
    x = points_xyz[..., 0]
    y = points_xyz[..., 1]
    z = points_xyz[..., 2]
    r_sqr = x * x + y * y + z * z
    theta = jnp.arcsin(z / jnp.sqrt(r_sqr + 1e-8))
    phi = jnp.arctan2(y, x)
    keep = (theta > v_down) & (theta < v_up)
    u = 0.5 * (1.0 - phi / math.pi) * w_rng
    v = (1.0 - (theta - v_down) / (v_up - v_down)) * h_rng
    u = jnp.clip(u, 0.0, w_rng - _EPS)
    v = jnp.clip(v, 0.0, h_rng - _EPS)
    return u, v, keep


def p2g_max(feats, u, v, keep, grid_shape):
    """Scatter-max point features onto a grid (``Projection._scatter``).

    Args:
        feats: (B, N, C); u, v: (B, N); keep: (B, N) bool; grid_shape (h, w).
    Returns:
        (B, H, W, C) NHWC grid, empty cells 0.
    """
    H, W = int(grid_shape[0]), int(grid_shape[1])
    B, N, C = feats.shape
    flat = v.astype(jnp.int32) * W + u.astype(jnp.int32)
    flat = jnp.where(keep, flat, H * W)                 # dump row
    grid = jnp.zeros((B, H * W + 1, C), dtype=feats.dtype)
    grid = grid.at[jnp.arange(B)[:, None], flat].max(feats)
    return grid[:, :H * W].reshape(B, H, W, C)


def g2p_bilinear(grid, u, v, keep):
    """Bilinear gather of grid features back to points (``Projection._gather``).

    Args:
        grid: (B, H, W, C); u, v: (B, N); keep: (B, N) bool.
    Returns:
        (B, N, C); zero where ``keep`` is False.
    """
    B, H, W, C = grid.shape
    # one zero row/col of slack so floor+1 never wraps (reference pads too)
    padded = jnp.pad(grid, ((0, 0), (0, 1), (0, 1), (0, 0)))
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    iu0 = u0.astype(jnp.int32)
    iv0 = v0.astype(jnp.int32)
    fu = u - u0
    fv = v - v0

    flat = padded.reshape(B, (H + 1) * (W + 1), C)

    def at(iy, ix):
        idx = iy * (W + 1) + ix
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    out = (at(iv0, iu0) * ((1 - fv) * (1 - fu))[..., None]
           + at(iv0, iu0 + 1) * ((1 - fv) * fu)[..., None]
           + at(iv0 + 1, iu0) * (fv * (1 - fu))[..., None]
           + at(iv0 + 1, iu0 + 1) * (fv * fu)[..., None])
    return jnp.where(keep[..., None], out, 0.0)


def process_fov(fov_degrees):
    """Degrees -> radians for the (v_down, v_up) pair (``AL_3D.process_fov``)."""
    return tuple(float(d) / 180.0 * math.pi for d in fov_degrees[:2])
