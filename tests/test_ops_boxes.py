import numpy as np
import jax.numpy as jnp

from spsnet_tpu import ops
from tests.reference_impls import (
    points_in_boxes_ref, iou3d_ref, rotated_overlap_ref, nms_ref)


def _random_boxes(rng, n):
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0:2] = rng.uniform(-10, 10, size=(n, 2))
    boxes[:, 2] = rng.uniform(-1, 1, size=n)
    boxes[:, 3:6] = rng.uniform(0.5, 4.0, size=(n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, size=n)
    return boxes


def test_points_in_boxes():
    rng = np.random.default_rng(0)
    points = rng.uniform(-12, 12, size=(2, 300, 3)).astype(np.float32)
    boxes = np.stack([_random_boxes(rng, 12), _random_boxes(rng, 12)])
    got = np.asarray(ops.points_in_boxes(jnp.asarray(points), jnp.asarray(boxes)))
    want = points_in_boxes_ref(points, boxes)
    np.testing.assert_array_equal(got, want)


def test_points_in_boxes_ignores_zero_padding():
    points = np.zeros((1, 4, 3), dtype=np.float32)
    boxes = np.zeros((1, 3, 7), dtype=np.float32)  # all padding
    got = np.asarray(ops.points_in_boxes(jnp.asarray(points), jnp.asarray(boxes)))
    np.testing.assert_array_equal(got, -1)


def test_rotated_overlap_identical_boxes():
    box = np.array([1.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.7], dtype=np.float32)
    got = np.asarray(ops.boxes_overlap_bev(jnp.asarray(box[None]), jnp.asarray(box[None])))
    np.testing.assert_allclose(got[0, 0], 8.0, rtol=1e-4)


def test_rotated_overlap_matches_reference():
    rng = np.random.default_rng(1)
    a = _random_boxes(rng, 12)
    b = _random_boxes(rng, 10)
    got = np.asarray(ops.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
    for i in range(len(a)):
        for j in range(len(b)):
            want = rotated_overlap_ref(a[i], b[j])
            np.testing.assert_allclose(got[i, j], want, atol=1e-3)


def test_iou3d_matches_reference():
    rng = np.random.default_rng(2)
    a = _random_boxes(rng, 8)
    b = _random_boxes(rng, 8)
    got = np.asarray(ops.boxes_iou3d(jnp.asarray(a), jnp.asarray(b)))
    want = iou3d_ref(a, b)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_nms_matches_reference():
    rng = np.random.default_rng(3)
    boxes = _random_boxes(rng, 60)
    # Cluster boxes to force overlaps
    boxes[30:, 0:2] = boxes[:30, 0:2] + rng.normal(scale=0.4, size=(30, 2))
    scores = rng.uniform(size=60).astype(np.float32)
    keep_idx, num = ops.nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.1)
    keep_idx = np.asarray(keep_idx)
    num = int(num)
    want = nms_ref(boxes, scores, 0.1)
    np.testing.assert_array_equal(keep_idx[:num], want)
    assert (keep_idx[num:] == -1).all()


def test_nms_respects_valid_mask():
    rng = np.random.default_rng(4)
    boxes = _random_boxes(rng, 20)
    scores = rng.uniform(size=20).astype(np.float32)
    valid = np.zeros(20, dtype=bool)
    valid[:5] = True
    keep_idx, num = ops.nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.01,
                                valid=jnp.asarray(valid))
    keep_idx = np.asarray(keep_idx)
    assert (keep_idx[:int(num)] < 5).all()


def test_nms_post_maxsize_cap():
    rng = np.random.default_rng(5)
    boxes = _random_boxes(rng, 50)
    boxes[:, 0] = np.arange(50) * 100.0  # no overlaps: all kept
    scores = rng.uniform(size=50).astype(np.float32)
    keep_idx, num = ops.nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.1,
                                post_maxsize=10)
    assert int(num) == 10
    order = np.argsort(-scores, kind='stable')[:10]
    np.testing.assert_array_equal(np.asarray(keep_idx), order)


def test_nms_circle_matches_numpy_reference():
    """Center-distance NMS vs the reference's numpy greedy loop."""
    from spsnet_tpu.ops.boxes import nms_circle
    rng = np.random.default_rng(0)
    K = 64
    boxes = np.zeros((K, 7), np.float32)
    boxes[:, 0] = rng.uniform(0, 20, K)
    boxes[:, 1] = rng.uniform(0, 20, K)
    boxes[:, 3:6] = 1.0
    scores = rng.uniform(size=K).astype(np.float32)
    thresh = 4.0     # squared distance

    # reference greedy (centernet_utils.circle_nms)
    order = scores.argsort()[::-1]
    suppressed = np.zeros(K, bool)
    want = []
    for _i in range(K):
        i = order[_i]
        if suppressed[i]:
            continue
        want.append(i)
        for _j in range(_i + 1, K):
            j = order[_j]
            if suppressed[j]:
                continue
            d = (boxes[i, 0] - boxes[j, 0]) ** 2 + \
                (boxes[i, 1] - boxes[j, 1]) ** 2
            if d <= thresh:
                suppressed[j] = True

    keep, num = nms_circle(jnp.asarray(boxes), jnp.asarray(scores), thresh,
                           post_maxsize=K)
    got = list(np.asarray(keep)[:int(num)])
    assert got == want
