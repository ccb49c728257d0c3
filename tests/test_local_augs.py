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


class TestPyramidAugs:
    def _scene(self, rng, n_in_box=200):
        """Two gt boxes, each densely filled, plus background points."""
        gt = np.array([[10.0, 0.0, 0.0, 4.0, 2.0, 2.0, 0.3],
                       [20.0, 5.0, 0.0, 4.0, 2.0, 2.0, -0.5]], np.float32)
        pts = []
        for b in gt:
            local = rng.uniform(-0.45, 0.45, (n_in_box, 3)) * b[3:6]
            c, s = np.cos(b[6]), np.sin(b[6])
            world = np.stack([local[:, 0] * c - local[:, 1] * s + b[0],
                              local[:, 0] * s + local[:, 1] * c + b[1],
                              local[:, 2] + b[2]], axis=1)
            pts.append(world)
        bg = rng.uniform(-5, 40, (300, 3)).astype(np.float32)
        bg[:, 2] = rng.uniform(3, 5, 300)          # well above the boxes
        pts = np.concatenate(pts + [bg], axis=0)
        inten = rng.uniform(0, 1, (pts.shape[0], 1)).astype(np.float32)
        return gt, np.concatenate([pts, inten], axis=1).astype(np.float32)

    def test_get_pyramids_shape_and_apex(self):
        from spsnet_tpu.data.augmentor import pyramid_augs
        gt, _ = self._scene(np.random.default_rng(0))
        pyr = pyramid_augs.get_pyramids(gt)
        assert pyr.shape == (2, 6, 15)
        # apex of every frustum is the box center
        assert np.allclose(pyr[:, :, 0:3], gt[:, None, 0:3])

    def test_pyramids_partition_box_points(self):
        """Every point inside a box lies in >= 1 of its 6 frustums."""
        from spsnet_tpu.data.augmentor import pyramid_augs
        rng = np.random.default_rng(1)
        gt, pts = self._scene(rng)
        pyr = pyramid_augs.get_pyramids(gt[:1]).reshape(-1, 5, 3)
        in_box = pts[:200]                          # first box's points
        m = pyramid_augs.points_in_pyramids_mask(in_box, pyr)
        assert m.any(-1).mean() > 0.98              # hull tolerance slack

    def test_dropout_removes_points(self):
        from spsnet_tpu.data.augmentor import pyramid_augs
        rng = np.random.default_rng(2)
        gt, pts = self._scene(rng)
        np.random.seed(0)
        _, new_pts, _ = pyramid_augs.local_pyramid_dropout(gt, pts, 1.0)
        assert new_pts.shape[0] < pts.shape[0]
        assert new_pts.shape[0] >= 300              # background untouched

    def test_sparsify_caps_counts(self):
        from spsnet_tpu.data.augmentor import pyramid_augs
        rng = np.random.default_rng(3)
        gt, pts = self._scene(rng)
        np.random.seed(1)
        _, new_pts, _ = pyramid_augs.local_pyramid_sparsify(gt, pts, 1.0, 10)
        assert new_pts.shape[0] < pts.shape[0]

    def test_swap_preserves_count_and_moves_points(self):
        from spsnet_tpu.data.augmentor import pyramid_augs
        rng = np.random.default_rng(4)
        gt, pts = self._scene(rng)
        np.random.seed(2)
        _, new_pts = pyramid_augs.local_pyramid_swap(gt, pts, 1.0, 5)
        # swap replaces distributions but keeps total point count
        assert new_pts.shape[0] == pts.shape[0]
        assert not np.allclose(np.sort(new_pts[:, 0]), np.sort(pts[:, 0]))

    def test_augmentor_queue_hook(self):
        from spsnet_tpu.config import EDict
        from spsnet_tpu.data.augmentor.data_augmentor import DataAugmentor
        aug = DataAugmentor(
            root_path=None,
            augmentor_configs=EDict({'DISABLE_AUG_LIST': ['placeholder'],
                'AUG_CONFIG_LIST': [EDict({
                    'NAME': 'random_local_pyramid_aug',
                    'DROP_PROB': 0.5, 'SPARSIFY_PROB': 0.5,
                    'SPARSIFY_MAX_NUM': 20, 'SWAP_PROB': 0.5,
                    'SWAP_MAX_NUM': 20})]}),
            class_names=['Car'])
        rng = np.random.default_rng(5)
        gt, pts = self._scene(rng)
        np.random.seed(3)
        out = aug.forward({'gt_boxes': gt, 'points': pts,
                           'gt_names': np.array(['Car', 'Car'])})
        assert out['points'].shape[1] == 4
        assert np.isfinite(out['points']).all()
