"""ctypes wrappers for the native host data-pipeline kernels.

Loaded lazily; every entry point returns None-equivalent behavior through
its caller's numpy fallback when the toolchain is unavailable or
``SPSNET_NATIVE=0``. A one-time parity self-check against the numpy twins
guards against a miscompiled library silently feeding training.
"""
from __future__ import annotations

import ctypes

import numpy as np

from . import build_lib, lib_cache_path, native_disabled

_lib = None
_failed = False
_loading = False  # re-entrancy guard: the parity self-check drives the
                  # numpy twins, whose native fast paths call back here

_i64 = ctypes.c_int64
_f32p = ctypes.POINTER(ctypes.c_float)
_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)


def _fp(a):
    return a.ctypes.data_as(_f32p)


def _self_check(lib):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (64, 4)).astype(np.float32)
    boxes = np.zeros((3, 7), dtype=np.float32)
    boxes[:, 0:3] = rng.uniform(-3, 3, (3, 3))
    boxes[:, 3:6] = rng.uniform(0.5, 4, (3, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 3)

    from ..data.processor.data_processor import points_in_boxes_cpu_np
    ref = points_in_boxes_cpu_np(pts[:, :3], boxes)
    out = np.zeros((3, 64), dtype=np.int32)
    cosa = np.cos(-boxes[:, 6])
    sina = np.sin(-boxes[:, 6])
    lib.points_in_boxes(_fp(pts), 64, 4, _fp(boxes), 3, _fp(cosa),
                        _fp(sina), out.ctypes.data_as(_i32p))
    if not np.array_equal(out, ref):
        raise RuntimeError('native points_in_boxes parity self-check failed')

    from ..data.augmentor.data_augmentor_geometry import boxes_bev_iou_cpu
    iou = np.zeros((3, 3), dtype=np.float32)
    lib.bev_iou(_fp(boxes), 3, _fp(boxes), 3, _fp(iou))
    if not np.allclose(iou, boxes_bev_iou_cpu(boxes, boxes), atol=1e-5):
        raise RuntimeError('native bev_iou parity self-check failed')


def get_lib():
    global _lib, _failed, _loading
    if native_disabled():          # checked every call: tests toggle it
        return None
    if _lib is not None:
        return _lib
    if _failed or _loading:
        return None
    try:
        _loading = True
        path = lib_cache_path('hostpipe_native.cpp')
        if not path.exists():
            build_lib('hostpipe_native.cpp', path)
        lib = ctypes.CDLL(str(path))
        lib.points_in_boxes.argtypes = [_f32p, _i64, _i64, _f32p, _i64,
                                        _f32p, _f32p, _i32p]
        lib.points_first_box.argtypes = lib.points_in_boxes.argtypes
        lib.fov_mask.argtypes = [_f32p, _i64, _i64, _f32p, _f32p,
                                 ctypes.c_float, ctypes.c_float,
                                 ctypes.c_float, _u8p]
        lib.range_xy_mask.argtypes = [_f32p, _i64, _i64, _f32p, _u8p]
        lib.near_mask.argtypes = [_f32p, _i64, _i64, ctypes.c_float, _u8p]
        lib.bev_iou.argtypes = [_f32p, _i64, _f32p, _i64, _f32p]
        lib.rot_z_inplace.argtypes = [_f32p, _i64, _i64, ctypes.c_float,
                                      ctypes.c_float]
        lib.scale_xyz_inplace.argtypes = [_f32p, _i64, _i64, ctypes.c_double]
        lib.negate_col_inplace.argtypes = [_f32p, _i64, _i64, _i64]
        _self_check(lib)
        _lib = lib
        return _lib
    except Exception:
        _failed = True
        return None
    finally:
        _loading = False


def _contig_f32(points):
    """(n, k) f32 rows for the C kernels without copying: a column slice of
    a contiguous base (e.g. ``points[:, :3]`` of an (n, 4) array) is passed
    via its row stride; anything else is made contiguous."""
    a = np.asarray(points)
    if (a.ndim == 2 and a.dtype == np.float32 and a.strides[1] == 4 and
            a.strides[0] > 0 and a.strides[0] % 4 == 0 and
            a.strides[0] >= a.shape[1] * 4):
        return a, a.shape[0], a.strides[0] // 4
    a = np.ascontiguousarray(a, dtype=np.float32)
    return a, a.shape[0], a.shape[1]


def points_in_boxes_native(points, boxes):
    """(N, >=3) x (T, 7) -> (T, N) int32, or None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts, n, stride = _contig_f32(points)
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    t = boxes.shape[0]
    out = np.zeros((t, n), dtype=np.int32)
    if n and t:
        cosa = np.cos(-boxes[:, 6])
        sina = np.sin(-boxes[:, 6])
        lib.points_in_boxes(_fp(pts), n, stride, _fp(boxes), t,
                            _fp(cosa), _fp(sina),
                            out.ctypes.data_as(_i32p))
    return out


def points_first_box_native(points, boxes):
    """(N, >=3) x (T, 7) -> (N,) int32 first-hit box index (-1 = none),
    or None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts, n, stride = _contig_f32(points)
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    t = boxes.shape[0]
    out = np.full(n, -1, dtype=np.int32)
    if n and t:
        cosa = np.cos(-boxes[:, 6])
        sina = np.sin(-boxes[:, 6])
        lib.points_first_box(_fp(pts), n, stride, _fp(boxes), t,
                             _fp(cosa), _fp(sina),
                             out.ctypes.data_as(_i32p))
    return out


def fov_mask_native(points, calib, img_shape):
    """Camera-FOV bool mask for (N, >=3) lidar points, or None.

    ``m1 = (V2C.T @ R0.T)`` extended with the hom row so the C kernel's
    ``x*m1[0] + y*m1[1] + z*m1[2] + m1[3]`` equals numpy's
    ``cart_to_hom(pts) @ (V2C.T @ R0.T)`` (the hom column of V2C/R0 is 0/1).
    """
    lib = get_lib()
    if lib is None:
        return None
    pts, n, stride = _contig_f32(points)
    m1 = np.ascontiguousarray(calib.V2C.T @ calib.R0.T, dtype=np.float32)
    p2t = np.ascontiguousarray(calib.P2.T, dtype=np.float32)  # (4, 3)
    out = np.zeros(n, dtype=np.uint8)
    if n:
        lib.fov_mask(_fp(pts), n, stride, _fp(m1), _fp(p2t),
                     float(calib.P2[2, 3]), float(img_shape[0]),
                     float(img_shape[1]), out.ctypes.data_as(_u8p))
    return out.astype(bool)


def range_xy_mask_native(points, pcr):
    lib = get_lib()
    if lib is None:
        return None
    pts, n, stride = _contig_f32(points)
    pcr = np.ascontiguousarray(pcr, dtype=np.float32)
    out = np.zeros(n, dtype=np.uint8)
    if n:
        lib.range_xy_mask(_fp(pts), n, stride, _fp(pcr),
                          out.ctypes.data_as(_u8p))
    return out.astype(bool)


def near_mask_native(points, thresh=40.0):
    lib = get_lib()
    if lib is None:
        return None
    pts, n, stride = _contig_f32(points)
    out = np.zeros(n, dtype=np.uint8)
    if n:
        lib.near_mask(_fp(pts), n, stride, float(thresh),
                      out.ctypes.data_as(_u8p))
    return out.astype(bool)


def _writable_f32(points):
    a = np.asarray(points)
    if (a.ndim == 2 and a.dtype == np.float32 and a.flags.writeable and
            a.flags.c_contiguous):
        return a, a.shape[0], a.shape[1]
    return None, 0, 0


def rot_z_inplace_native(points, cosa, sina):
    """Rotate xy of a contiguous writable (n, >=3) f32 array in place.
    Returns True on success; caller falls back to numpy otherwise."""
    lib = get_lib()
    if lib is None:
        return False
    pts, n, stride = _writable_f32(points)
    if pts is None:
        return False
    lib.rot_z_inplace(_fp(pts), n, stride, float(cosa), float(sina))
    return True


def scale_xyz_inplace_native(points, scale):
    lib = get_lib()
    if lib is None:
        return False
    pts, n, stride = _writable_f32(points)
    if pts is None:
        return False
    lib.scale_xyz_inplace(_fp(pts), n, stride, float(scale))
    return True


def negate_col_inplace_native(points, col):
    lib = get_lib()
    if lib is None:
        return False
    pts, n, stride = _writable_f32(points)
    if pts is None or col >= stride:
        return False
    lib.negate_col_inplace(_fp(pts), n, stride, int(col))
    return True


def bev_iou_native(boxes_a, boxes_b):
    """(N, 7) x (M, 7) -> (N, M) float32 rotated BEV IoU, or None."""
    lib = get_lib()
    if lib is None:
        return None
    ba = np.ascontiguousarray(boxes_a, dtype=np.float32)
    bb = np.ascontiguousarray(boxes_b, dtype=np.float32)
    n, m = ba.shape[0], bb.shape[0]
    out = np.zeros((n, m), dtype=np.float32)
    if n and m:
        lib.bev_iou(_fp(ba), n, _fp(bb), m, _fp(out))
    return out
