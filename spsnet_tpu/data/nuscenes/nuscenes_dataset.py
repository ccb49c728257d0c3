"""NuScenes dataset: OpenPCDet-format infos, multi-sweep accumulation,
class-balanced resampling.

Parity target: ``pcdet/datasets/nuscenes/nuscenes_dataset.py``. The official
nuscenes-devkit metric needs the devkit (absent); evaluation falls back to
the kitti-style protocol on lidar boxes.
"""
from __future__ import annotations

import copy
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate
from .nuscenes_utils import default_attribute


class NuScenesDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        # The dataset lives under <DATA_PATH>/<VERSION> (reference
        # ``nuscenes_dataset.py:85``): infos and lidar paths are relative to
        # the versioned directory, matching where create_nuscenes_info writes.
        root_path = (root_path if root_path is not None
                     else Path(dataset_cfg.DATA_PATH)) / dataset_cfg.VERSION
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.infos = []
        self.include_nuscenes_data(self.mode)
        if self.training and self.dataset_cfg.get('BALANCED_RESAMPLING', False):
            self.infos = self.balanced_infos_resampling(self.infos)

    def include_nuscenes_data(self, mode):
        infos = []
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            info_path = self.root_path / info_path
            if not info_path.exists():
                continue
            with open(info_path, 'rb') as f:
                infos.extend(pickle.load(f))
        self.infos.extend(infos)
        if self.logger:
            self.logger.info('Total samples for NuScenes dataset: %d',
                             len(infos))

    def balanced_infos_resampling(self, infos):
        """Class-balanced duplication (``nuscenes_dataset.py:113-148``):
        resample so every class appears in ~1/num_class of the frames."""
        if self.class_names is None:
            return infos
        cls_infos = {name: [] for name in self.class_names}
        for info in infos:
            for name in set(info['gt_names']):
                if name in self.class_names:
                    cls_infos[name].append(info)
        duplicated_samples = sum(len(v) for v in cls_infos.values())
        if duplicated_samples == 0:
            return infos
        cls_dist = {k: len(v) / duplicated_samples
                    for k, v in cls_infos.items()}
        sampled_infos = []
        frac = 1.0 / len(self.class_names)
        ratios = [frac / v if v > 0 else 0 for v in cls_dist.values()]
        for cur_cls_infos, ratio in zip(cls_infos.values(), ratios):
            sampled_infos += np.random.choice(
                cur_cls_infos, int(len(cur_cls_infos) * ratio)).tolist()
        if self.logger:
            self.logger.info('Total samples after balanced resampling: %d',
                             len(sampled_infos))
        return sampled_infos

    def get_sweep(self, sweep_info):
        def remove_ego_points(points, center_radius=1.0):
            mask = ~((np.abs(points[:, 0]) < center_radius) &
                     (np.abs(points[:, 1]) < center_radius))
            return points[mask]

        lidar_path = self.root_path / sweep_info['lidar_path']
        points_sweep = np.fromfile(str(lidar_path), dtype=np.float32,
                                   count=-1).reshape([-1, 5])[:, :4]
        points_sweep = remove_ego_points(points_sweep).T
        if sweep_info['transform_matrix'] is not None:
            num_points = points_sweep.shape[1]
            points_sweep[:3, :] = sweep_info['transform_matrix'].dot(
                np.vstack((points_sweep[:3, :], np.ones(num_points))))[:3, :]
        cur_times = sweep_info['time_lag'] * np.ones((1, points_sweep.shape[1]))
        return points_sweep.T, cur_times.T

    def get_lidar_with_sweeps(self, index, max_sweeps=1):
        info = self.infos[index]
        lidar_path = self.root_path / info['lidar_path']
        points = np.fromfile(str(lidar_path), dtype=np.float32,
                             count=-1).reshape([-1, 5])[:, :4]
        sweep_points_list = [points]
        sweep_times_list = [np.zeros((points.shape[0], 1))]
        n_pick = min(max_sweeps - 1, len(info.get('sweeps', [])))
        if n_pick > 0:
            for k in np.random.choice(len(info['sweeps']), n_pick,
                                      replace=False):
                pts, times = self.get_sweep(info['sweeps'][k])
                sweep_points_list.append(pts)
                sweep_times_list.append(times)
        points = np.concatenate(sweep_points_list, axis=0)
        times = np.concatenate(sweep_times_list, axis=0).astype(points.dtype)
        return np.concatenate((points, times), axis=1)

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * getattr(self, 'total_epochs', 1)
        return len(self.infos)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = copy.deepcopy(self.infos[index])
        points = self.get_lidar_with_sweeps(
            index, max_sweeps=self.dataset_cfg.get('MAX_SWEEPS', 1))
        input_dict = {'points': points,
                      'frame_id': Path(info['lidar_path']).stem,
                      'metadata': {'token': info.get('token')}}
        if 'gt_boxes' in info:
            if self.dataset_cfg.get('FILTER_MIN_POINTS_IN_GT', False):
                mask = info['num_lidar_pts'] > \
                    self.dataset_cfg.FILTER_MIN_POINTS_IN_GT - 1
            else:
                mask = np.ones(len(info['gt_boxes']), dtype=bool)
            input_dict.update({
                'gt_names': info['gt_names'][mask],
                'gt_boxes': info['gt_boxes'][mask],
            })
        data_dict = self.prepare_data(data_dict=input_dict)
        if self.dataset_cfg.get('SET_NAN_VELOCITY_TO_ZEROS', False) and \
                'gt_boxes' in data_dict:
            gt = data_dict['gt_boxes']
            data_dict['gt_boxes'] = np.nan_to_num(gt)
        return data_dict

    def create_groundtruth_database(self, used_classes=None, max_sweeps=10):
        """GT-crop database for gt_sampling (parity:
        ``nuscenes_dataset.py:337-380``): per-object point crops centered at
        the box, ``nuscenes_dbinfos_{N}sweeps_withvelo.pkl`` index."""
        from ..processor.data_processor import points_in_boxes_cpu_np

        database_save_path = self.root_path / \
            f'gt_database_{max_sweeps}sweeps_withvelo'
        db_info_save_path = self.root_path / \
            f'nuscenes_dbinfos_{max_sweeps}sweeps_withvelo.pkl'
        database_save_path.mkdir(parents=True, exist_ok=True)
        all_db_infos = {}
        for idx in range(len(self.infos)):
            info = self.infos[idx]
            points = self.get_lidar_with_sweeps(idx, max_sweeps=max_sweeps)
            gt_boxes = np.asarray(info['gt_boxes'])
            gt_names = np.asarray(info['gt_names'])
            if len(gt_boxes) == 0:
                continue
            ind = points_in_boxes_cpu_np(points[:, :3], gt_boxes[:, :7])
            box_idxs = np.where(ind.any(axis=0), ind.argmax(axis=0), -1)
            for i in range(gt_boxes.shape[0]):
                filename = f'{idx}_{gt_names[i]}_{i}.bin'
                filepath = database_save_path / filename
                gt_points = points[box_idxs == i].copy()
                gt_points[:, :3] -= gt_boxes[i, :3]
                gt_points.astype(np.float32).tofile(filepath)
                if used_classes is None or gt_names[i] in used_classes:
                    db_info = {
                        'name': gt_names[i],
                        'path': str(filepath.relative_to(self.root_path)),
                        'image_idx': idx, 'gt_idx': i,
                        'box3d_lidar': gt_boxes[i],
                        'num_points_in_gt': gt_points.shape[0],
                    }
                    all_db_infos.setdefault(gt_names[i], []).append(db_info)
        for k, v in all_db_infos.items():
            print(f'Database {k}: {len(v)}')
        with open(db_info_save_path, 'wb') as f:
            pickle.dump(all_db_infos, f)

    @staticmethod
    def generate_prediction_dicts(batch_dict, pred_dicts, class_names,
                                  output_path=None):
        annos = []
        for index, box_dict in enumerate(pred_dicts):
            labels = np.asarray(box_dict['pred_labels']).astype(np.int64)
            names = (np.array(class_names)[labels - 1] if len(labels)
                     else np.array([]))
            boxes = np.asarray(box_dict['pred_boxes'])
            annos.append({
                'name': names,
                'score': np.asarray(box_dict['pred_scores']),
                'boxes_lidar': boxes,
                'attr_name': np.array([
                    default_attribute(n, b) for n, b in zip(names, boxes)]),
                'frame_id': batch_dict['frame_id'][index],
                'metadata': batch_dict.get('metadata', [None] * 100)[index],
            })
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        """Native numpy nuScenes protocol (center-distance mAP + TP errors
        + NDS, ``eval/nuscenes_eval.py``); pass eval_metric='kitti' for the
        kitti-style fallback."""
        if kwargs.get('eval_metric', 'nuscenes') != 'kitti':
            from ...eval.nuscenes_eval import nuscenes_evaluation
            gt_annos = [{
                'name': info.get('gt_names', np.array([])),
                'boxes_lidar': np.asarray(
                    info.get('gt_boxes', np.zeros((0, 7)))),
                **({'attr_name': np.asarray(info['gt_attr_names'])}
                   if 'gt_attr_names' in info else {}),
            } for info in self.infos]
            return nuscenes_evaluation(gt_annos, det_annos,
                                       list(class_names))
        from ..waymo.waymo_eval_utils import waymo_annos_to_kitti
        from ...eval.kitti_eval import get_official_eval_result
        eval_det = [waymo_annos_to_kitti(copy.deepcopy(a)) for a in det_annos]
        gt_annos = []
        for info in self.infos:
            gt_annos.append(waymo_annos_to_kitti({
                'name': info.get('gt_names', np.array([])),
                'gt_boxes_lidar': np.asarray(
                    info.get('gt_boxes', np.zeros((0, 7))))[:, :7],
            }))
        classes = [c for c in class_names if c in ('car', 'Car', 'pedestrian',
                                                   'Pedestrian', 'Cyclist')]
        if not classes:
            classes = ['Car']
        result_str, result_dict = get_official_eval_result(
            gt_annos, eval_det, [c.capitalize() if c.islower() else c
                                 for c in classes])
        return result_str, result_dict
