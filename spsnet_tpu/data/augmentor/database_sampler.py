"""GT-database sampling augmentation ("gt_sampling" / copy-paste).

Parity: ``pcdet/datasets/augmentor/database_sampler.py`` — per-class
round-robin sampling from a pre-built crop database, BEV-IoU collision
rejection against the scene and already-placed samples, carve-out of scene
points inside sampled boxes, and concat of crop points.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from .data_augmentor_geometry import boxes_bev_iou_cpu
from ..processor.data_processor import points_first_box_np


class DataBaseSampler:
    def __init__(self, root_path, sampler_cfg, class_names, logger=None):
        self.root_path = Path(root_path)
        self.sampler_cfg = sampler_cfg
        self.class_names = class_names
        self.logger = logger
        self.db_infos = {name: [] for name in class_names}
        for db_info_path in sampler_cfg.DB_INFO_PATH:
            path = self.root_path / db_info_path
            if not path.exists():
                if logger:
                    logger.warning('db info missing: %s', path)
                continue
            with open(path, 'rb') as f:
                infos = pickle.load(f)
                for cur_class in class_names:
                    self.db_infos[cur_class].extend(infos.get(cur_class, []))

        for func_name, val in sampler_cfg.get('PREPARE', {}).items():
            self.db_infos = getattr(self, func_name)(self.db_infos, val)

        self.sample_groups = {}
        self.sample_class_num = {}
        self.limit_whole_scene = sampler_cfg.get('LIMIT_WHOLE_SCENE', False)
        for x in sampler_cfg.SAMPLE_GROUPS:
            class_name, sample_num = x.split(':')
            if class_name not in class_names:
                continue
            self.sample_class_num[class_name] = int(sample_num)
            self.sample_groups[class_name] = {
                'sample_num': int(sample_num),
                'pointer': len(self.db_infos[class_name]),
                'indices': np.arange(len(self.db_infos[class_name])),
            }

    def filter_by_difficulty(self, db_infos, removed_difficulty):
        new_db_infos = {}
        for key, dinfos in db_infos.items():
            new_db_infos[key] = [info for info in dinfos
                                 if info['difficulty'] not in removed_difficulty]
        return new_db_infos

    def filter_by_min_points(self, db_infos, min_gt_points_list):
        for name_num in min_gt_points_list:
            name, min_num = name_num.split(':')
            min_num = int(min_num)
            if min_num > 0 and name in db_infos:
                db_infos[name] = [info for info in db_infos[name]
                                  if info['num_points_in_gt'] >= min_num]
        return db_infos

    def sample_with_fixed_number(self, class_name, sample_group):
        """Round-robin epoch-shuffled sampling (``database_sampler.py:117-134``)."""
        sample_num = sample_group['sample_num']
        pointer, indices = sample_group['pointer'], sample_group['indices']
        total = len(self.db_infos[class_name])
        if total == 0:
            return []
        if pointer >= total:
            indices = np.random.permutation(total)
            pointer = 0
        sampled = [self.db_infos[class_name][idx]
                   for idx in indices[pointer:pointer + sample_num]]
        sample_group['pointer'] = pointer + sample_num
        sample_group['indices'] = indices
        return sampled

    @staticmethod
    def put_boxes_on_road_planes(gt_boxes, road_plane, calib):
        """Snap sampled boxes' bottoms to the rect-frame ground plane
        (``database_sampler.py:137-154``). Returns (boxes, mv_height)."""
        a, b, c, d = road_plane
        center_cam = calib.lidar_to_rect(gt_boxes[:, 0:3])
        cur_height_cam = (-d - a * center_cam[:, 0] - c * center_cam[:, 2]) / b
        center_cam[:, 1] = cur_height_cam
        cur_lidar_height = calib.rect_to_lidar(center_cam)[:, 2]
        mv_height = gt_boxes[:, 2] - gt_boxes[:, 5] / 2 - cur_lidar_height
        gt_boxes[:, 2] -= mv_height
        return gt_boxes, mv_height

    def add_sampled_boxes_to_scene(self, data_dict, sampled_gt_boxes,
                                   total_valid_sampled_dict):
        gt_boxes = data_dict['gt_boxes']
        gt_names = data_dict['gt_names']
        points = data_dict['points']

        use_road_plane = (self.sampler_cfg.get('USE_ROAD_PLANE', False)
                          and data_dict.get('road_plane') is not None
                          and data_dict.get('calib') is not None)
        # deviation from the reference (which KeyErrors): USE_ROAD_PLANE
        # degrades to no-snap when the optional planes/ data is absent
        if use_road_plane:
            sampled_gt_boxes, mv_height = self.put_boxes_on_road_planes(
                sampled_gt_boxes, data_dict['road_plane'], data_dict['calib'])
            data_dict.pop('road_plane', None)

        obj_points_list = []
        kept_mask = np.ones(len(total_valid_sampled_dict), dtype=bool)
        for idx, info in enumerate(total_valid_sampled_dict):
            file_path = self.root_path / info['path']
            if not file_path.exists():
                kept_mask[idx] = False
                continue
            obj_points = np.fromfile(str(file_path), dtype=np.float32).reshape(
                [-1, self.sampler_cfg.NUM_POINT_FEATURES])
            obj_points[:, :3] += info['box3d_lidar'][:3]
            if use_road_plane:
                obj_points[:, 2] -= mv_height[idx]
            obj_points_list.append(obj_points)
        sampled_gt_boxes = sampled_gt_boxes[kept_mask]
        total_valid_sampled_dict = [d for d, k in
                                    zip(total_valid_sampled_dict, kept_mask) if k]
        if len(obj_points_list) == 0:
            return data_dict

        obj_points = np.concatenate(obj_points_list, axis=0)
        sampled_gt_names = np.array([x['name'] for x in total_valid_sampled_dict])

        # carve out scene points inside the sampled boxes, enlarged by
        # REMOVE_EXTRA_WIDTH (``database_sampler.py:195-198``); first-hit
        # native kernel: no (T, N) indicator materialized
        carve_boxes = sampled_gt_boxes[:, :7].copy()
        extra = np.asarray(self.sampler_cfg.get(
            'REMOVE_EXTRA_WIDTH', [0.0, 0.0, 0.0]), dtype=carve_boxes.dtype)
        carve_boxes[:, 3:6] += extra
        first_box = points_first_box_np(points[:, :3], carve_boxes)
        points = points[first_box < 0]

        data_dict['points'] = np.concatenate([obj_points, points], axis=0)
        data_dict['gt_names'] = np.concatenate([gt_names, sampled_gt_names])
        data_dict['gt_boxes'] = np.concatenate(
            [gt_boxes, sampled_gt_boxes[:, :gt_boxes.shape[1]]], axis=0)
        return data_dict

    def __call__(self, data_dict):
        gt_boxes = data_dict['gt_boxes']
        gt_names = data_dict['gt_names'].astype(str)
        existed_boxes = gt_boxes
        total_valid_sampled_dict = []
        for class_name, sample_group in self.sample_groups.items():
            if self.limit_whole_scene:
                num_gt = np.sum(class_name == gt_names)
                sample_group['sample_num'] = \
                    self.sample_class_num[class_name] - num_gt
            if sample_group['sample_num'] <= 0:
                continue
            sampled_dict = self.sample_with_fixed_number(class_name, sample_group)
            if len(sampled_dict) == 0:
                continue
            sampled_boxes = np.stack(
                [x['box3d_lidar'] for x in sampled_dict], axis=0).astype(np.float32)

            # BEV-IoU collision rejection vs scene + each other
            # (``database_sampler.py:232-238``)
            iou1 = boxes_bev_iou_cpu(sampled_boxes[:, 0:7], existed_boxes[:, 0:7])
            iou2 = boxes_bev_iou_cpu(sampled_boxes[:, 0:7], sampled_boxes[:, 0:7])
            iou2[range(sampled_boxes.shape[0]), range(sampled_boxes.shape[0])] = 0
            iou1 = iou1 if iou1.shape[1] > 0 else iou2
            valid = ((iou1.max(axis=1) + iou2.max(axis=1)) == 0).nonzero()[0]
            valid_sampled_dict = [sampled_dict[x] for x in valid]
            valid_sampled_boxes = sampled_boxes[valid]
            existed_boxes = np.concatenate(
                (existed_boxes, valid_sampled_boxes[:, :existed_boxes.shape[1]]),
                axis=0)
            total_valid_sampled_dict.extend(valid_sampled_dict)

        sampled_gt_boxes = existed_boxes[gt_boxes.shape[0]:, :]
        if total_valid_sampled_dict:
            data_dict = self.add_sampled_boxes_to_scene(
                data_dict, sampled_gt_boxes, total_valid_sampled_dict)
        return data_dict
