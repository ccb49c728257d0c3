"""Native (C++) components, loaded via ctypes with graceful numpy fallback.

Where the reference ships CUDA/numba for host-side hot loops (the KITTI
evaluator's rotated IoU + statistics, ``kitti_object_eval_python``), we build
a small C++ shared library at first use with the system toolchain. The
binary lives in a per-source-hash cache directory (never in the source tree
or git); a one-time numpy parity self-check guards against a stale or
miscompiled library silently computing the official metrics.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_lib = None
_build_failed = False


_FLAGS = ['-O3', '-ffp-contract=off', '-shared', '-fPIC', '-std=c++17']


def native_disabled():
    """Global kill switch (also how parity tests reach the numpy twins)."""
    return os.environ.get('SPSNET_NATIVE', '1') == '0'


def lib_cache_path(src_name: str):
    """Cache path keyed by source hash: a changed .cpp always rebuilds,
    a fresh checkout never trusts a stale binary."""
    src = (_DIR / src_name).read_bytes() + b'|' + ' '.join(_FLAGS).encode()
    h = hashlib.sha256(src).hexdigest()[:16]
    cache = Path(os.environ.get('SPSNET_NATIVE_CACHE',
                                Path(tempfile.gettempdir()) /
                                'spsnet_tpu_native'))
    cache.mkdir(parents=True, exist_ok=True)
    stem = src_name.rsplit('.', 1)[0]
    return cache / f'lib{stem}-{h}.so'


def build_lib(src_name: str, lib_path):
    """g++ the single-file library. -ffp-contract=off keeps float32 kernels
    bit-identical to their numpy twins (FMA contraction changes rounding)."""
    src = _DIR / src_name
    cmd = ['g++', *_FLAGS, '-o', str(lib_path), str(src)]
    subprocess.run(cmd, check=True, capture_output=True)


def _lib_path():
    return lib_cache_path('kitti_eval_native.cpp')


def _build(lib_path):
    build_lib('kitti_eval_native.cpp', lib_path)


def _self_check(lib):
    """Native rotated IoU must match the numpy reference on a fixed case."""
    from ..eval.rotate_iou import rotate_iou_eval as rotate_iou_eval_numpy
    rng = np.random.default_rng(0)
    boxes = np.zeros((4, 5), dtype=np.float32)
    boxes[:, 0:2] = rng.uniform(-2, 2, (4, 2))
    boxes[:, 2:4] = rng.uniform(1, 3, (4, 2))
    boxes[:, 4] = rng.uniform(-np.pi, np.pi, 4)
    n, k = 4, 4
    out = np.zeros((n, k), dtype=np.float32)
    lib.rotate_iou_eval(_fptr(boxes), n, _fptr(boxes), k, -1, _fptr(out))
    ref = rotate_iou_eval_numpy(boxes, boxes)
    if not np.allclose(out, ref, atol=1e-4):
        raise RuntimeError('native kitti_eval parity self-check failed')


def get_lib():
    """Returns the loaded library or None if the toolchain is unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    try:
        lib_path = _lib_path()
        if not lib_path.exists():
            _build(lib_path)
        lib = ctypes.CDLL(str(lib_path))
        lib.rotate_iou_eval.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.d3_box_overlap.argtypes = lib.rotate_iou_eval.argtypes
        lib.compute_statistics.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64)]
        _self_check(lib)
        _lib = lib
        return _lib
    except Exception:
        _build_failed = True
        return None


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rotate_iou_eval_native(boxes, qboxes, criterion=-1):
    lib = get_lib()
    assert lib is not None
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    qboxes = np.ascontiguousarray(qboxes, dtype=np.float32)
    n, k = boxes.shape[0], qboxes.shape[0]
    out = np.zeros((n, k), dtype=np.float32)
    if n and k:
        lib.rotate_iou_eval(_fptr(boxes), n, _fptr(qboxes), k, criterion,
                            _fptr(out))
    return out


def d3_box_overlap_native(boxes, qboxes, criterion=-1):
    lib = get_lib()
    assert lib is not None
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    qboxes = np.ascontiguousarray(qboxes, dtype=np.float32)
    n, k = boxes.shape[0], qboxes.shape[0]
    out = np.zeros((n, k), dtype=np.float32)
    if n and k:
        lib.d3_box_overlap(_fptr(boxes), n, _fptr(qboxes), k, criterion,
                           _fptr(out))
    return out


def compute_statistics_native(overlaps, gt_datas, dt_datas, ignored_gt,
                              ignored_det, dc_bboxes, metric, min_overlap,
                              thresh=0.0, compute_fp=False, compute_aos=False):
    lib = get_lib()
    assert lib is not None
    overlaps = np.ascontiguousarray(overlaps, dtype=np.float32)
    gt_datas = np.ascontiguousarray(gt_datas, dtype=np.float32).reshape(-1, 5)
    dt_datas = np.ascontiguousarray(dt_datas, dtype=np.float32).reshape(-1, 6)
    ignored_gt = np.ascontiguousarray(ignored_gt, dtype=np.int32)
    ignored_det = np.ascontiguousarray(ignored_det, dtype=np.int32)
    dc_bboxes = np.ascontiguousarray(dc_bboxes, dtype=np.float32).reshape(-1, 4)
    det_size, gt_size = dt_datas.shape[0], gt_datas.shape[0]
    tp = ctypes.c_int64()
    fp = ctypes.c_int64()
    fn = ctypes.c_int64()
    sim = ctypes.c_double()
    thresholds = np.zeros(max(gt_size, 1), dtype=np.float32)
    n_thresh = ctypes.c_int64()
    lib.compute_statistics(
        _fptr(overlaps), det_size, gt_size, _fptr(gt_datas), _fptr(dt_datas),
        ignored_gt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ignored_det.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _fptr(dc_bboxes), dc_bboxes.shape[0],
        int(metric), float(min_overlap), float(thresh),
        int(bool(compute_fp)), int(bool(compute_aos)),
        ctypes.byref(tp), ctypes.byref(fp), ctypes.byref(fn),
        ctypes.byref(sim), _fptr(thresholds), ctypes.byref(n_thresh))
    return (int(tp.value), int(fp.value), int(fn.value), float(sim.value),
            thresholds[:n_thresh.value].copy())
