import numpy as np
import jax.numpy as jnp

from spsnet_tpu.models.detectors.detector3d import multi_classes_nms_batch


def test_multi_class_nms_keeps_per_class_winners():
    # two overlapping boxes of DIFFERENT classes must both survive
    boxes = np.zeros((1, 4, 7), dtype=np.float32)
    boxes[0, 0] = [0, 0, 0, 4, 2, 1.5, 0.0]
    boxes[0, 1] = [0.2, 0, 0, 4, 2, 1.5, 0.0]   # overlaps box 0
    boxes[0, 2] = [20, 0, 0, 4, 2, 1.5, 0.0]
    boxes[0, 3] = [40, 0, 0, 4, 2, 1.5, 0.0]
    logits = np.full((1, 4, 2), -10.0, dtype=np.float32)
    logits[0, 0, 0] = 5.0    # class 1, high
    logits[0, 1, 1] = 4.0    # class 2, overlapping but different class
    logits[0, 2, 0] = 3.0
    logits[0, 3, 1] = 2.0
    dets = multi_classes_nms_batch(
        jnp.asarray(boxes), jnp.asarray(logits),
        score_thresh=0.1, nms_thresh=0.1, nms_pre=4, nms_post=4)
    count = int(dets['count'][0])
    labels = np.asarray(dets['labels'][0, :count])
    assert count == 4  # overlap across classes not suppressed
    assert set(labels.tolist()) == {1, 2}

    # same boxes as ONE class: the overlap IS suppressed
    logits2 = np.full((1, 4, 2), -10.0, dtype=np.float32)
    logits2[0, :, 0] = [5.0, 4.0, 3.0, 2.0]
    dets2 = multi_classes_nms_batch(
        jnp.asarray(boxes), jnp.asarray(logits2),
        score_thresh=0.1, nms_thresh=0.1, nms_pre=4, nms_post=4)
    assert int(dets2['count'][0]) == 3
