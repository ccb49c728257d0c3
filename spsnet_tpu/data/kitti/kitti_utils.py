"""Camera<->lidar box conversions and KITTI label parsing (host numpy).

Parity: ``pcdet/utils/box_utils.py:92-247`` and ``object3d_kitti.py``.
Conventions: camera boxes ``[x, y, z, l, h, w, ry]`` (rect frame, y down,
box bottom at y); lidar boxes ``[x, y, z, dx, dy, dz, heading]`` (z center);
``heading = -(ry + pi/2)``.
"""
from __future__ import annotations

import numpy as np


def boxes3d_kitti_camera_to_lidar(boxes3d_camera, calib):
    boxes = boxes3d_camera.copy()
    xyz_camera, r = boxes[:, 0:3], boxes[:, 6:7]
    l, h, w = boxes[:, 3:4], boxes[:, 4:5], boxes[:, 5:6]
    xyz_lidar = calib.rect_to_lidar(xyz_camera)
    xyz_lidar[:, 2] += h[:, 0] / 2
    return np.concatenate([xyz_lidar, l, w, h, -(r + np.pi / 2)], axis=-1)


def boxes3d_lidar_to_kitti_camera(boxes3d_lidar, calib):
    boxes = boxes3d_lidar.copy()
    xyz_lidar = boxes[:, 0:3]
    l, w, h = boxes[:, 3:4], boxes[:, 4:5], boxes[:, 5:6]
    r = boxes[:, 6:7]
    xyz_lidar[:, 2] -= h.reshape(-1) / 2
    xyz_cam = calib.lidar_to_rect(xyz_lidar)
    r = -r - np.pi / 2
    return np.concatenate([xyz_cam, l, h, w, r], axis=-1)


def boxes3d_to_corners3d_kitti_camera(boxes3d, bottom_center=True):
    """Camera-frame corners (N, 8, 3); y down, ry about +y."""
    n = boxes3d.shape[0]
    l, h, w = boxes3d[:, 3], boxes3d[:, 4], boxes3d[:, 5]
    x_c = np.stack([l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2], axis=1)
    z_c = np.stack([w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2], axis=1)
    if bottom_center:
        y_c = np.zeros((n, 8), dtype=np.float32)
        y_c[:, 4:8] = -h.reshape(n, 1)
    else:
        y_c = np.stack([h / 2] * 4 + [-h / 2] * 4, axis=1)
    ry = boxes3d[:, 6]
    zeros, ones = np.zeros(n, dtype=np.float32), np.ones(n, dtype=np.float32)
    rot = np.array([[np.cos(ry), zeros, -np.sin(ry)],
                    [zeros, ones, zeros],
                    [np.sin(ry), zeros, np.cos(ry)]])
    rot = np.transpose(rot, (2, 0, 1))
    corners = np.stack([x_c, y_c, z_c], axis=2) @ rot
    return (corners + boxes3d[:, None, 0:3]).astype(np.float32)


def boxes3d_kitti_camera_to_imageboxes(boxes3d, calib, image_shape=None):
    corners3d = boxes3d_to_corners3d_kitti_camera(boxes3d)
    pts_img, _ = calib.rect_to_img(corners3d.reshape(-1, 3))
    corners_in_image = pts_img.reshape(-1, 8, 2)
    min_uv = corners_in_image.min(axis=1)
    max_uv = corners_in_image.max(axis=1)
    boxes2d = np.concatenate([min_uv, max_uv], axis=1)
    if image_shape is not None:
        boxes2d[:, 0] = np.clip(boxes2d[:, 0], 0, image_shape[1] - 1)
        boxes2d[:, 1] = np.clip(boxes2d[:, 1], 0, image_shape[0] - 1)
        boxes2d[:, 2] = np.clip(boxes2d[:, 2], 0, image_shape[1] - 1)
        boxes2d[:, 3] = np.clip(boxes2d[:, 3], 0, image_shape[0] - 1)
    return boxes2d


class Object3d:
    """One KITTI label line (parity: ``object3d_kitti.py``)."""

    def __init__(self, line):
        label = line.strip().split(' ')
        self.src = line
        self.cls_type = label[0]
        self.truncation = float(label[1])
        self.occlusion = float(label[2])
        self.alpha = float(label[3])
        self.box2d = np.array(
            (float(label[4]), float(label[5]), float(label[6]), float(label[7])),
            dtype=np.float32)
        self.h = float(label[8])
        self.w = float(label[9])
        self.l = float(label[10])
        self.loc = np.array(
            (float(label[11]), float(label[12]), float(label[13])),
            dtype=np.float32)
        self.dis_to_cam = np.linalg.norm(self.loc)
        self.ry = float(label[14])
        self.score = float(label[15]) if len(label) == 16 else -1.0
        self.level = self.get_kitti_obj_level()

    def get_kitti_obj_level(self):
        height = float(self.box2d[3]) - float(self.box2d[1]) + 1
        if height >= 40 and self.truncation <= 0.15 and self.occlusion <= 0:
            self.level_str = 'Easy'
            return 0
        if height >= 25 and self.truncation <= 0.3 and self.occlusion <= 1:
            self.level_str = 'Moderate'
            return 1
        if height >= 25 and self.truncation <= 0.5 and self.occlusion <= 2:
            self.level_str = 'Hard'
            return 2
        self.level_str = 'UnKnown'
        return -1


def get_objects_from_label(label_file):
    with open(label_file, 'r') as f:
        lines = f.readlines()
    return [Object3d(line) for line in lines]


def drop_info_with_name(info, name):
    ret_info = {}
    keep = [i for i, x in enumerate(info['name']) if x != name]
    for key in info.keys():
        if isinstance(info[key], np.ndarray) and len(info[key]) == len(info['name']):
            ret_info[key] = info[key][keep]
        else:
            ret_info[key] = info[key]
    # 'name' handled above; keep order
    return ret_info


def calib_to_matricies(calib):
    """Calibration -> (lidar->rect-camera (4, 4), projection P2 (3, 4))
    (parity: ``datasets/kitti/kitti_utils.py:52-66``)."""
    V2C = np.vstack((calib.V2C,
                     np.array([0, 0, 0, 1], dtype=np.float32)))
    R0 = np.hstack((calib.R0, np.zeros((3, 1), dtype=np.float32)))
    R0 = np.vstack((R0, np.array([0, 0, 0, 1], dtype=np.float32)))
    return (R0 @ V2C).astype(np.float32), calib.P2.astype(np.float32)
