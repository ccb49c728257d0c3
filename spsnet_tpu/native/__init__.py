"""Native (C++) components, loaded via ctypes with graceful numpy fallback.

Where the reference ships CUDA/numba for host-side hot loops (the KITTI
evaluator's rotated IoU + statistics, ``kitti_object_eval_python``), we build
a small C++ shared library at first use with the system toolchain.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / 'libkitti_eval.so'
_lib = None
_build_failed = False


def _build():
    src = _DIR / 'kitti_eval_native.cpp'
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
           '-o', str(_LIB_PATH), str(src)]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Returns the loaded library or None if the toolchain is unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    try:
        if not _LIB_PATH.exists() or \
                _LIB_PATH.stat().st_mtime < (_DIR / 'kitti_eval_native.cpp').stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB_PATH))
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
