"""Host data-pipeline units: processors, augmentors, collation."""
import numpy as np

from spsnet_tpu.config import EDict
from spsnet_tpu.data.dataset import collate_batch
from spsnet_tpu.data.augmentor import augmentor_utils
from spsnet_tpu.data.processor.data_processor import (DataProcessor,
                                                      points_in_boxes_cpu_np)
from tests.reference_impls import points_in_boxes_ref


def _frame(rng, n=2000, n_gt=4):
    points = rng.uniform(-50, 50, size=(n, 4)).astype(np.float32)
    gt = np.zeros((n_gt, 7), dtype=np.float32)
    gt[:, 0:2] = rng.uniform(-30, 30, size=(n_gt, 2))
    gt[:, 2] = rng.uniform(-1, 1, n_gt)
    gt[:, 3:6] = rng.uniform(1, 4, size=(n_gt, 3))
    gt[:, 6] = rng.uniform(-np.pi, np.pi, n_gt)
    return {'points': points, 'gt_boxes': gt,
            'gt_names': np.array(['Car'] * n_gt)}


def _processor(training=True):
    cfgs = [
        EDict({'NAME': 'mask_points_and_boxes_outside_range',
               'REMOVE_OUTSIDE_BOXES': True}),
        EDict({'NAME': 'sample_points',
               'NUM_POINTS': {'train': 512, 'test': 512}}),
        EDict({'NAME': 'shuffle_points',
               'SHUFFLE_ENABLED': {'train': True, 'test': False}}),
        EDict({'NAME': 'add_fake_sem_label'}),
    ]
    return DataProcessor(cfgs, np.array([0, -40, -3, 70.4, 40, 1]),
                         training=training)


def test_processor_fixed_shape_output():
    rng = np.random.default_rng(0)
    proc = _processor()
    out = proc.forward(_frame(rng))
    assert out['points'].shape == (512, 4)
    assert out['fake_labels'].shape == (512,)
    pcr = [0, -40, 70.4, 40]
    assert (out['points'][:, 0] >= 0).all() and \
        (out['points'][:, 0] <= 70.4).all()


def test_sample_points_keeps_far_points():
    rng = np.random.default_rng(1)
    frame = _frame(rng, n=2000)
    # bulk of the cloud near (<40 m depth), 100 points far but in range
    frame['points'][:, 0] = rng.uniform(0, 25, 2000)
    frame['points'][:, 1] = rng.uniform(-20, 20, 2000)
    frame['points'][:, 2] = rng.uniform(-2, 0.9, 2000)
    frame['points'][:100, 0] = rng.uniform(45, 70, 100)
    far_pts = frame['points'][:100].copy()
    proc = _processor()
    out = proc.forward(dict(frame))
    depths = np.linalg.norm(out['points'][:, :3], axis=1)
    # all surviving far (>40 m) originals must be present
    far_sel = np.linalg.norm(far_pts[:, :3], axis=1) >= 40
    out_set = {tuple(p) for p in out['points'][depths >= 40].round(4).tolist()}
    kept = sum(tuple(p) in out_set for p in far_pts[far_sel].round(4).tolist())
    assert kept == far_sel.sum()


def test_fake_labels_match_reference_assignment():
    rng = np.random.default_rng(2)
    points = rng.uniform(-10, 10, size=(300, 4)).astype(np.float32)
    gt = np.zeros((3, 8), dtype=np.float32)
    gt[:, 0:3] = rng.uniform(-5, 5, (3, 3))
    gt[:, 3:6] = rng.uniform(2, 5, (3, 3))
    gt[:, 6] = rng.uniform(-np.pi, np.pi, 3)
    gt[:, 7] = [1, 2, 3]
    ind = points_in_boxes_cpu_np(points[:, :3], gt[:, :7])
    ref = points_in_boxes_ref(points[None, :, :3], gt[None, :, :7])[0]
    # indicator agrees with the first-match reference on membership
    member = ind.sum(axis=0) > 0
    assert ((ref >= 0) == member).all()


def test_flip_rotation_scaling_consistency():
    rng = np.random.default_rng(3)
    frame = _frame(rng, n=100)
    gt, pts = frame['gt_boxes'], frame['points']
    g2, p2 = augmentor_utils.random_flip_along_x(gt, pts, enable=True)
    np.testing.assert_allclose(g2[:, 1], -gt[:, 1])
    np.testing.assert_allclose(p2[:, 1], -pts[:, 1])
    g3, p3 = augmentor_utils.global_rotation(gt, pts, [0.5, 0.5])
    # rotation preserves radii
    np.testing.assert_allclose(np.linalg.norm(p3[:, :2], axis=1),
                               np.linalg.norm(pts[:, :2], axis=1), atol=1e-3)
    np.testing.assert_allclose(g3[:, 6], gt[:, 6] + 0.5, atol=1e-6)
    # [2.0, 2.0] is a degenerate range: the reference skips scaling entirely
    g4, p4 = augmentor_utils.global_scaling(gt, pts, [2.0, 2.0])
    np.testing.assert_allclose(g4[:, 3:6], gt[:, 3:6], rtol=1e-6)
    g5, p5 = augmentor_utils.global_scaling(gt, pts, [1.9, 2.1], scale=2.0)
    np.testing.assert_allclose(g5[:, 3:6], gt[:, 3:6] * 2.0, rtol=1e-6)


def test_collate_batch_shapes():
    rng = np.random.default_rng(4)
    frames = []
    for i in range(3):
        f = {'points': rng.normal(size=(128, 4)).astype(np.float32),
             'gt_boxes': rng.normal(size=(2 + i, 8)).astype(np.float32),
             'frame_id': f'{i:06d}'}
        frames.append(f)
    batch = collate_batch(frames, max_gt=10)
    assert batch['points'].shape == (3, 128, 4)
    assert batch['gt_boxes'].shape == (3, 10, 8)
    assert batch['batch_size'] == 3
    assert (batch['gt_boxes'][0, 2:] == 0).all()


def test_points_in_boxes_prefilter_exact():
    """The coarse-AABB candidate prefilter must be bit-identical to the naive
    (T, N) broadcast — including strongly rotated, elongated boxes where the
    AABB over-approximates the rotated footprint the most."""
    from spsnet_tpu.data.processor.data_processor import _points_in_boxes_exact
    rng = np.random.default_rng(11)
    pts = rng.uniform(-60, 60, size=(20000, 3)).astype(np.float32)
    boxes = np.zeros((24, 7), dtype=np.float32)
    boxes[:, 0:2] = rng.uniform(-50, 50, size=(24, 2))
    boxes[:, 2] = rng.uniform(-2, 2, 24)
    boxes[:, 3] = rng.uniform(0.5, 18, 24)   # long boxes
    boxes[:, 4] = rng.uniform(0.5, 3, 24)
    boxes[:, 5] = rng.uniform(0.5, 3, 24)
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 24)
    fast = points_in_boxes_cpu_np(pts, boxes)
    naive = _points_in_boxes_exact(pts, boxes).astype(np.int32)
    np.testing.assert_array_equal(fast, naive)


def test_boxes_to_corners_np_matches_jnp():
    """Host-side numpy corners twin must match the in-jit jnp version."""
    import jax.numpy as jnp
    from spsnet_tpu.utils import box_utils
    rng = np.random.default_rng(12)
    boxes = np.concatenate([
        rng.uniform(-40, 40, size=(32, 3)),
        rng.uniform(0.5, 5, size=(32, 3)),
        rng.uniform(-np.pi, np.pi, size=(32, 1)),
    ], axis=1).astype(np.float32)
    np.testing.assert_allclose(
        box_utils.boxes_to_corners_3d_np(boxes),
        np.asarray(box_utils.boxes_to_corners_3d(jnp.asarray(boxes))),
        atol=1e-4)


def test_host_pipeline_never_dispatches_to_device(monkeypatch):
    """The loader's numpy pipeline must not issue ANY jax primitive: a per-frame
    jnp call costs a device round-trip plus a per-shape recompile (measured
    780 ms/scene before this guard; 37 ms/scene after)."""
    import jax._src.dispatch as jdispatch

    def _boom(*a, **k):
        raise AssertionError('host data pipeline dispatched a jax primitive')

    rng = np.random.default_rng(13)
    proc = _processor(training=True)
    frame = _frame(rng, n=4000)
    monkeypatch.setattr(jdispatch, 'apply_primitive', _boom)
    out = proc.forward(frame)
    batch = collate_batch([out])
    assert batch['points'].shape[1] == 512


def test_collate_batch_ragged_points():
    """Voxel-family frames (no sample_points stage) have ragged clouds:
    collate pads by CYCLING the frame's own points and emits points_valid."""
    rng = np.random.default_rng(7)
    frames = []
    for n in (100, 250, 130):
        f = {'points': rng.normal(size=(n, 4)).astype(np.float32),
             'fake_labels': np.arange(n, dtype=np.int32)}
        frames.append(f)
    batch = collate_batch(frames, max_gt=10)
    N = batch['points'].shape[1]
    assert N == 8192 and N % 8192 == 0           # coarse bucket (recompile
    # granularity: each new bucket recompiles the donated train/eval step)
    assert batch['points_valid'].shape == (3, N)
    assert batch['points_valid'].sum(axis=1).tolist() == [100, 250, 130]
    # pad rows are cycled copies, so labels cycle identically
    np.testing.assert_array_equal(batch['points'][0, 100:200],
                                  batch['points'][0, :100])
    np.testing.assert_array_equal(batch['fake_labels'][0],
                                  np.arange(N) % 100)
    # explicit cap: over-cap frames are subsampled at evenly-spaced scan
    # positions (covers the whole sweep; NOT a head truncation)
    batch2 = collate_batch(frames, max_gt=10, max_points=128)
    assert batch2['points'].shape[1] == 128
    idx = np.linspace(0, 249, 128).astype(np.int64)
    np.testing.assert_array_equal(batch2['points'][1],
                                  frames[1]['points'][idx])
    np.testing.assert_array_equal(batch2['fake_labels'][1],
                                  frames[1]['fake_labels'][idx])
    assert bool(batch2['points_valid'][1].all())
    # per-point labels must be all-or-none across a ragged batch
    import pytest as _pytest
    bad = [dict(frames[0]), {'points': frames[1]['points']}]
    with _pytest.raises(ValueError, match='all-or-none'):
        collate_batch(bad, max_gt=10, max_points=128)
