import numpy as np

from spsnet_tpu.data.augmentor import augmentor_utils as au


def _scene(rng):
    gt = np.zeros((2, 7), dtype=np.float32)
    gt[0] = [5, 0, 0, 4, 2, 1.5, 0.3]
    gt[1] = [20, 5, 0, 4, 2, 1.5, -0.5]
    pts = rng.uniform(-30, 30, size=(500, 4)).astype(np.float32)
    pts[:40, :3] = gt[0, :3] + rng.normal(scale=0.3, size=(40, 3))
    return gt, pts


def test_local_translation_moves_box_points_together():
    rng = np.random.default_rng(0)
    np.random.seed(0)
    gt, pts = _scene(rng)
    in0 = au._points_in_box_mask(pts, gt[0])
    g2, p2 = au.random_local_translation(gt, pts, [0.5, 1.5])
    # box 0 moved; its points moved by the same offset
    off = g2[0, :3] - gt[0, :3]
    assert np.abs(off).max() > 0
    np.testing.assert_allclose(p2[in0, :3] - pts[in0, :3],
                               np.broadcast_to(off, (in0.sum(), 3)),
                               atol=1e-5)


def test_local_rotation_preserves_box_frame_points():
    rng = np.random.default_rng(1)
    np.random.seed(1)
    gt, pts = _scene(rng)
    in0 = au._points_in_box_mask(pts, gt[0])
    g2, p2 = au.random_local_rotation(gt, pts, [0.3, 0.3])
    # distances to box center preserved under rotation about the center
    d_before = np.linalg.norm(pts[in0, :3] - gt[0, :3], axis=1)
    d_after = np.linalg.norm(p2[in0, :3] - g2[0, :3], axis=1)
    np.testing.assert_allclose(d_before, d_after, atol=1e-4)
    assert abs((g2[0, 6] - gt[0, 6]) - 0.3) < 1e-6


def test_local_scaling_scales_dims():
    rng = np.random.default_rng(2)
    np.random.seed(2)
    gt, pts = _scene(rng)
    g2, p2 = au.random_local_scaling(gt, pts, [1.2, 1.4])
    assert (g2[:, 3:6] > gt[:, 3:6]).all()


def test_frustum_dropout_removes_points():
    rng = np.random.default_rng(3)
    np.random.seed(3)
    gt, pts = _scene(rng)
    _, p2 = au.global_frustum_dropout(gt, pts, [0.2, 0.4], direction='top')
    assert len(p2) < len(pts)
    assert p2[:, 2].max() < pts[:, 2].max()
