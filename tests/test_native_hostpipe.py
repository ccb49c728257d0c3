"""Native host-pipeline kernels vs their numpy twins.

The native C++ kernels (``spsnet_tpu/native/hostpipe_native.cpp``) replace
the per-point numpy passes in the training loader. Selection-gating kernels
(points_in_boxes, range mask, near mask) must be BIT-identical — they decide
which points feed training. The FOV mask tolerates float32-boundary
disagreements (numpy's BLAS sgemm has unspecified 4-term summation order);
bev_iou tolerates 1e-5 (numpy evaluates corner trig in float32).
"""
import numpy as np
import pytest

from spsnet_tpu.native import hostpipe


def _require_lib():
    lib = hostpipe.get_lib()
    if lib is None:
        pytest.skip('native toolchain unavailable')
    return lib


def _scan(rng, n=20000):
    pts = np.zeros((n, 4), dtype=np.float32)
    pts[:, 0] = rng.uniform(0, 72, n)
    pts[:, 1] = pts[:, 0] * rng.uniform(-0.6, 0.6, n)
    pts[:, 2] = rng.uniform(-2.5, 1.2, n)
    pts[:, 3] = rng.uniform(0, 1, n)
    return pts


def _boxes(rng, t=24):
    boxes = np.zeros((t, 7), dtype=np.float32)
    boxes[:, 0] = rng.uniform(2, 68, t)
    boxes[:, 1] = rng.uniform(-25, 25, t)
    boxes[:, 2] = rng.uniform(-1.5, 0.0, t)
    boxes[:, 3:6] = rng.uniform(0.4, 5.0, (t, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, t)
    return boxes


def test_points_in_boxes_bit_exact():
    _require_lib()
    from spsnet_tpu.data.processor.data_processor import points_in_boxes_cpu_np
    rng = np.random.default_rng(1)
    pts = _scan(rng)
    boxes = _boxes(rng)
    got = hostpipe.points_in_boxes_native(pts[:, :3], boxes)
    # numpy twin via the kill switch
    import os
    os.environ['SPSNET_NATIVE'] = '0'
    try:
        ref = points_in_boxes_cpu_np(pts[:, :3], boxes)
    finally:
        os.environ['SPSNET_NATIVE'] = '1'
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)
    # degenerate: zero boxes / zero points
    assert hostpipe.points_in_boxes_native(pts[:0, :3], boxes).shape == (24, 0)


def test_points_in_boxes_stride_and_edge_cases():
    _require_lib()
    rng = np.random.default_rng(2)
    boxes = _boxes(rng, t=3)
    # a point exactly at a box center and one exactly on the z face
    pts = np.zeros((3, 4), dtype=np.float32)
    pts[0, :3] = boxes[0, :3]
    pts[1, :3] = boxes[1, :3]
    pts[1, 2] += boxes[1, 5] / 2.0            # on the <= boundary: inside
    pts[2, :3] = boxes[2, :3]
    pts[2, 2] += boxes[2, 5] / 2.0 + 1e-3     # beyond: outside
    got = hostpipe.points_in_boxes_native(pts[:, :3], boxes)
    assert got[0, 0] == 1 and got[1, 1] == 1 and got[2, 2] == 0


def test_range_and_near_mask_bit_exact():
    _require_lib()
    rng = np.random.default_rng(3)
    pts = _scan(rng)
    pcr = np.array([0, -40, -3, 70.4, 40, 1], dtype=np.float32)
    got = hostpipe.range_xy_mask_native(pts, pcr)
    ref = ((pts[:, 0] >= pcr[0]) & (pts[:, 0] <= pcr[3]) &
           (pts[:, 1] >= pcr[1]) & (pts[:, 1] <= pcr[4]))
    assert np.array_equal(got, ref)

    got_n = hostpipe.near_mask_native(pts, 40.0)
    ref_n = np.linalg.norm(pts[:, 0:3], axis=1) < 40.0
    assert np.array_equal(got_n, ref_n)


def test_fov_mask_boundary_tolerant():
    _require_lib()
    from spsnet_tpu.data.kitti.calibration import Calibration
    rng = np.random.default_rng(4)
    pts = _scan(rng)
    calib = Calibration({
        'P2': np.array([[720.0, 0.0, 620.0, 44.9],
                        [0.0, 720.0, 187.0, 0.2],
                        [0.0, 0.0, 1.0, 0.003]], dtype=np.float32),
        'R0': np.array([[1.0, 0.01, 0.0], [-0.01, 1.0, 0.0],
                        [0.0, 0.0, 1.0]], dtype=np.float32),
        'Tr_velo2cam': np.array([[0.0, -1.0, 0.0, 0.0],
                                 [0.0, 0.0, -1.0, -0.08],
                                 [1.0, 0.0, 0.0, -0.27]], dtype=np.float32),
    })
    img_shape = np.array([375, 1242])
    got = hostpipe.fov_mask_native(pts[:, :3], calib, img_shape)
    pts_rect = calib.lidar_to_rect(pts[:, 0:3])
    pts_img, depth = calib.rect_to_img(pts_rect)
    ref = ((pts_img[:, 0] >= 0) & (pts_img[:, 0] < img_shape[1]) &
           (pts_img[:, 1] >= 0) & (pts_img[:, 1] < img_shape[0]) &
           (depth >= 0))
    diff = got != ref
    if diff.any():
        # disagreements only within rounding distance of a boundary
        u, v = pts_img[diff, 0], pts_img[diff, 1]
        near_edge = (np.minimum(np.abs(u), np.abs(u - img_shape[1])) < 1e-2) \
            | (np.minimum(np.abs(v), np.abs(v - img_shape[0])) < 1e-2) \
            | (np.abs(depth[diff]) < 1e-4)
        assert near_edge.all()
    assert diff.mean() < 1e-3


def test_bev_iou_matches_numpy():
    _require_lib()
    import os
    from spsnet_tpu.data.augmentor import data_augmentor_geometry as g
    rng = np.random.default_rng(5)
    a, b = _boxes(rng, 40), _boxes(rng, 30)
    got = hostpipe.bev_iou_native(a, b)
    os.environ['SPSNET_NATIVE'] = '0'
    try:
        ref = g.boxes_bev_iou_cpu(a, b)
    finally:
        os.environ['SPSNET_NATIVE'] = '1'
    assert np.allclose(got, ref, atol=1e-5)
    # self-IoU diagonal is 1
    self_iou = hostpipe.bev_iou_native(a, a)
    assert np.allclose(np.diag(self_iou), 1.0, atol=1e-5)


def test_pipeline_consumers_use_native_transparently():
    """The wired call sites produce identical results with native on/off."""
    _require_lib()
    import os
    from spsnet_tpu.data.processor.data_processor import points_in_boxes_cpu_np
    rng = np.random.default_rng(6)
    pts = _scan(rng, 5000)
    boxes = _boxes(rng, 8)
    on = points_in_boxes_cpu_np(pts[:, :3], boxes)
    os.environ['SPSNET_NATIVE'] = '0'
    try:
        off = points_in_boxes_cpu_np(pts[:, :3], boxes)
    finally:
        os.environ['SPSNET_NATIVE'] = '1'
    assert np.array_equal(on, off)


def test_world_transforms_match_numpy():
    """Flip (exact), rotation and scaling (bit-exact if the numpy BLAS path
    uses no FMA; asserted exact here and relaxed only if a platform's BLAS
    disagrees — in that case tighten to 1-ulp)."""
    _require_lib()
    import os
    from spsnet_tpu.data.augmentor import augmentor_utils as au
    rng = np.random.default_rng(7)
    pts = _scan(rng)
    boxes = _boxes(rng, 6)

    def both(fn, *args, **kw):
        on = fn(*args, **kw)
        os.environ['SPSNET_NATIVE'] = '0'
        try:
            off = fn(*args, **kw)
        finally:
            os.environ['SPSNET_NATIVE'] = '1'
        return on, off

    (bx_on, p_on), (bx_off, p_off) = both(
        au.random_flip_along_x, boxes, pts, enable=True)
    assert np.array_equal(p_on, p_off) and np.array_equal(bx_on, bx_off)

    (bx_on, p_on), (bx_off, p_off) = both(
        au.random_flip_along_y, boxes, pts, enable=True)
    assert np.array_equal(p_on, p_off) and np.array_equal(bx_on, bx_off)

    (bx_on, p_on), (bx_off, p_off) = both(
        au.global_scaling, boxes, pts, [0.9, 1.1], scale=1.0371829)
    assert np.array_equal(p_on, p_off) and np.array_equal(bx_on, bx_off)

    (bx_on, p_on), (bx_off, p_off) = both(
        au.global_rotation, boxes, pts, [-1, 1], angle=0.61234)
    assert np.allclose(p_on, p_off, atol=0), \
        f'max delta {np.abs(p_on - p_off).max()}'
    assert np.array_equal(bx_on, bx_off)
