"""Waymo->KITTI anno conversion for kitti-style evaluation
(parity: ``waymo_dataset.py`` kitti-eval branch: lidar boxes re-expressed in
the camera-frame layout the KITTI evaluator expects)."""
from __future__ import annotations

import numpy as np


def waymo_annos_to_kitti(annos):
    """Map lidar-frame annos into the KITTI evaluator's camera-frame layout:
    location = (-y, -z, x), dims (l, h, w), fake bbox tall enough for the
    'easy' gate, full-visibility flags."""
    names = np.asarray(annos['name'])
    n = len(names)
    name_map = {'Vehicle': 'Car'}
    out = {
        'name': np.array([name_map.get(x, x) for x in names]),
        'truncated': np.zeros(n),
        'occluded': np.zeros(n),
        'alpha': -10 * np.ones(n),
        # fake image boxes tall enough (100 px) for every difficulty gate
        'bbox': np.tile(np.array([0, 0, 100, 100], dtype=np.float64), (n, 1)),
        'score': np.asarray(annos.get('score', -np.ones(n))),
        'difficulty': np.zeros(n, dtype=np.int32),
    }
    boxes = np.asarray(annos.get('boxes_lidar',
                                 annos.get('gt_boxes_lidar',
                                           np.zeros((n, 7)))))
    boxes = boxes.reshape(-1, boxes.shape[-1]) if boxes.size else \
        np.zeros((0, 7))
    if len(boxes):
        loc = np.stack([-boxes[:, 1], -boxes[:, 2], boxes[:, 0]], axis=1)
        dims = boxes[:, [3, 5, 4]]                 # l, h, w
        loc[:, 1] += dims[:, 1] / 2                # bottom of box
        out['location'] = loc
        out['dimensions'] = dims
        out['rotation_y'] = -boxes[:, 6] - np.pi / 2
    else:
        out['location'] = np.zeros((0, 3))
        out['dimensions'] = np.zeros((0, 3))
        out['rotation_y'] = np.zeros(0)
    return out
