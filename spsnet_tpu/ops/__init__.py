"""TPU-native point-cloud op library.

Each op replaces a CUDA kernel family from the reference (``pcdet/ops/*``)
with an XLA-expressible dense formulation over fixed-shape padded tensors,
optionally backed by a fused Pallas kernel on TPU. Semantics (tie-breaking,
padding rules, empty-neighborhood behavior) replicate the CUDA kernels — see
per-function docstrings for the file:line citations.
"""
from .sampling import (
    farthest_point_sample,
    farthest_point_sample_with_dist,
    calc_square_dist,
    fps_seed_config,
    fps_seed_k0,
    fps_seeding_active,
)
from .grouping import (
    ball_query,
    ball_query_dilated,
    gather_points,
    group_points,
    query_and_group,
    zero_empty_balls,
)
from .interpolate import three_nn, three_interpolate
from .boxes import (
    points_in_boxes,
    boxes_overlap_bev,
    boxes_iou_bev,
    boxes_iou3d,
    nms_bev,
    nms_normal,
)

__all__ = [
    'farthest_point_sample', 'farthest_point_sample_with_dist', 'calc_square_dist',
    'fps_seed_config', 'fps_seed_k0', 'fps_seeding_active',
    'ball_query', 'ball_query_dilated', 'gather_points', 'group_points',
    'query_and_group', 'zero_empty_balls', 'three_nn', 'three_interpolate',
    'points_in_boxes', 'boxes_overlap_bev', 'boxes_iou_bev', 'boxes_iou3d',
    'nms_bev', 'nms_normal',
]
