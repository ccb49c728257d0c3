"""Box geometry (jit-friendly jnp).

Capability parity with ``pcdet/utils/box_utils.py``: corner extraction,
box enlargement (incl. the per-class variant the reference *calls* but never
defines — ``IASSD_head.py`` references ``enlarge_box3d_for_class``), and
KITTI camera<->lidar conversions live in ``spsnet_tpu.data.kitti.calibration``
for the host-side pipeline.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .common import rotate_points_along_z

# Corner templates match the reference diagram (``box_utils.py:28-53``):
#   bottom face 0-3 (z = -dz/2), top face 4-7 (z = +dz/2).
_CORNER_TEMPLATE = np.array([
    [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
    [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
], dtype=np.float32) / 2.0


def boxes_to_corners_3d(boxes3d):
    """(N, 7) [x, y, z, dx, dy, dz, heading] -> (N, 8, 3) corners."""
    template = jnp.asarray(_CORNER_TEMPLATE, dtype=boxes3d.dtype)
    corners = boxes3d[:, None, 3:6] * template[None, :, :]
    corners = rotate_points_along_z(corners, boxes3d[:, 6])
    return corners + boxes3d[:, None, 0:3]


def boxes_to_corners_3d_np(boxes3d):
    """Pure-numpy twin of :func:`boxes_to_corners_3d` for the host-side data
    pipeline — the loader must never dispatch to the device (a per-frame jnp
    call costs a device round-trip and a per-shape recompile)."""
    boxes3d = np.asarray(boxes3d, dtype=np.float32)
    corners = boxes3d[:, None, 3:6] * _CORNER_TEMPLATE[None, :, :]
    cosa = np.cos(boxes3d[:, 6])[:, None]
    sina = np.sin(boxes3d[:, 6])[:, None]
    x = corners[..., 0] * cosa - corners[..., 1] * sina
    y = corners[..., 0] * sina + corners[..., 1] * cosa
    corners = np.stack([x, y, corners[..., 2]], axis=-1)
    return corners + boxes3d[:, None, 0:3]


def enlarge_box3d(boxes3d, extra_width=(0.0, 0.0, 0.0)):
    """Add ``extra_width`` to (dx, dy, dz); other fields pass through."""
    extra = jnp.asarray(extra_width, dtype=boxes3d.dtype)
    return boxes3d.at[..., 3:6].add(extra)


def enlarge_box3d_for_class(boxes3d, extra_width):
    """Per-class box enlargement.

    Args:
        boxes3d: (..., 8) with the last column the 1-based class label
            (0 = padding).
        extra_width: (num_class, 3) or (3,) widths added per class.

    The reference *calls* ``box_utils.enlarge_box3d_for_class``
    (``IASSD_head.py:261``) but never defines it; this implements the evident
    intent: class-dependent growth, padding boxes untouched.
    """
    extra = jnp.asarray(extra_width, dtype=boxes3d.dtype)
    if extra.ndim == 1:
        extra = jnp.broadcast_to(extra[None], (16, 3))
    cls_idx = jnp.clip(boxes3d[..., -1].astype(jnp.int32) - 1, 0, extra.shape[0] - 1)
    grow = jnp.where(boxes3d[..., -1:] > 0, extra[cls_idx], 0.0)
    return boxes3d.at[..., 3:6].add(grow)


def in_canonical_box(local_xyz, dims, margin=1e-5):
    """Point-in-axis-aligned-box test in the box's canonical frame.

    Mirrors ``check_pt_in_box3d`` (``roiaware_pool3d_kernel.cu:23-37``):
    strict z-test ``|z| <= dz/2`` and xy-test with a small margin.
    """
    zs = jnp.abs(local_xyz[..., 2]) <= dims[..., 2] / 2.0
    xs = jnp.abs(local_xyz[..., 0]) < dims[..., 0] / 2.0 + margin
    ys = jnp.abs(local_xyz[..., 1]) < dims[..., 1] / 2.0 + margin
    return zs & xs & ys


def points_to_box_local(points, boxes):
    """Transform points to each box's canonical frame.

    Args:
        points: (..., N, 3)
        boxes: (..., T, 7)
    Returns:
        (..., N, T, 3) local coordinates.
    """
    shift = points[..., :, None, :] - boxes[..., None, :, 0:3]  # (..., N, T, 3)
    rz = boxes[..., None, :, 6]
    cosa = jnp.cos(-rz)
    sina = jnp.sin(-rz)
    lx = shift[..., 0] * cosa - shift[..., 1] * sina
    ly = shift[..., 0] * sina + shift[..., 1] * cosa
    return jnp.stack([lx, ly, shift[..., 2]], axis=-1)


def mask_boxes_outside_range_numpy(boxes, limit_range, min_num_corners=1):
    """Host-side: keep boxes with >= min_num_corners corners inside BEV range."""
    boxes = np.asarray(boxes)
    if boxes.shape[1] > 7:
        geo = boxes[:, 0:7]
    else:
        geo = boxes
    corners = boxes_to_corners_3d_np(geo)
    mask = ((corners[:, :, 0] >= limit_range[0]) & (corners[:, :, 0] <= limit_range[3]) &
            (corners[:, :, 1] >= limit_range[1]) & (corners[:, :, 1] <= limit_range[4]))
    return mask.sum(axis=1) >= min_num_corners
