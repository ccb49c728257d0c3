"""Waymo dataset: OpenPCDet-format sequence infos + .npy point clouds.

Parity target: ``pcdet/datasets/waymo/waymo_dataset.py``. Evaluation supports
the kitti-style protocol (``waymo_dataset.py:268-319`` offers both; the TF
``waymo_open_dataset`` metric needs tensorflow, which is not in this image —
gated behind availability).
"""
from __future__ import annotations

import copy
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class WaymoDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.data_path = self.root_path / \
            dataset_cfg.get('PROCESSED_DATA_TAG', 'waymo_processed_data')
        self.split = dataset_cfg.DATA_SPLIT[self.mode]
        split_file = self.root_path / 'ImageSets' / (self.split + '.txt')
        self.sample_sequence_list = [x.strip() for x in
                                     open(split_file).readlines()] \
            if split_file.exists() else []
        self.infos = []
        self.include_waymo_data(self.mode)

    def include_waymo_data(self, mode):
        infos = []
        for k, sequence_name in enumerate(self.sample_sequence_list):
            seq = Path(sequence_name).stem
            info_path = self.data_path / seq / f'{seq}.pkl'
            if not info_path.exists():
                continue
            with open(info_path, 'rb') as f:
                infos.extend(pickle.load(f))
        interval = int(self.dataset_cfg.get('SAMPLED_INTERVAL', {}).get(
            self.mode, 1)) if self.dataset_cfg.get('SAMPLED_INTERVAL') else 1
        self.infos.extend(infos[::interval])
        if self.logger:
            self.logger.info('Total samples for Waymo dataset: %d',
                             len(self.infos))

    def get_lidar(self, sequence_name, sample_idx):
        lidar_file = self.data_path / sequence_name / f'{sample_idx:04d}.npy'
        point_features = np.load(lidar_file)  # (N, 7) [x,y,z,int,elong,nlz,?]
        points_all = point_features[:, 0:5]
        nlz_flag = point_features[:, 5]
        points_all = points_all[nlz_flag == -1]
        points_all[:, 3] = np.tanh(points_all[:, 3])
        return points_all

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * getattr(self, 'total_epochs', 1)
        return len(self.infos)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = copy.deepcopy(self.infos[index])
        pc_info = info['point_cloud']
        sequence_name = pc_info['lidar_sequence']
        sample_idx = pc_info['sample_idx']
        points = self.get_lidar(sequence_name, sample_idx)

        input_dict = {'points': points,
                      'frame_id': info['frame_id']}
        if 'annos' in info:
            annos = info['annos']
            from ..kitti.kitti_utils import drop_info_with_name
            annos = drop_info_with_name(annos, name='unknown')
            gt_boxes_lidar = annos['gt_boxes_lidar']
            if self.dataset_cfg.get('FILTER_EMPTY_BOXES_FOR_TRAIN', False) \
                    and self.training:
                mask = annos.get('num_points_in_gt',
                                 np.ones(len(gt_boxes_lidar))) > 0
                annos = {k: (v[mask] if isinstance(v, np.ndarray)
                             and len(v) == len(mask) else v)
                         for k, v in annos.items()}
                gt_boxes_lidar = annos['gt_boxes_lidar']
            input_dict.update({'gt_names': annos['name'],
                               'gt_boxes': gt_boxes_lidar[:, :7]})
        data_dict = self.prepare_data(data_dict=input_dict)
        data_dict.pop('metadata', None)
        return data_dict

    @staticmethod
    def generate_prediction_dicts(batch_dict, pred_dicts, class_names,
                                  output_path=None):
        annos = []
        for index, box_dict in enumerate(pred_dicts):
            boxes = np.asarray(box_dict['pred_boxes'])
            labels = np.asarray(box_dict['pred_labels']).astype(np.int64)
            annos.append({
                'name': np.array(class_names)[labels - 1] if len(labels)
                else np.array([]),
                'score': np.asarray(box_dict['pred_scores']),
                'boxes_lidar': boxes,
                'frame_id': batch_dict['frame_id'][index],
            })
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        """Native numpy Waymo protocol (3D-IoU mAP/mAPH at L1/L2,
        ``eval/waymo_eval.py``); pass eval_metric='kitti' for the
        kitti-style fallback."""
        if 'annos' not in self.infos[0]:
            return 'no labels', {}
        if kwargs.get('eval_metric', 'waymo') != 'kitti':
            from ...eval.waymo_eval import waymo_evaluation
            gt_annos = []
            for info in self.infos:
                a = info['annos']
                gt_annos.append({
                    'name': np.asarray(a['name']),
                    'boxes_lidar': np.asarray(
                        a.get('gt_boxes_lidar', a.get('boxes_lidar',
                                                      np.zeros((0, 7))))),
                    'difficulty': np.asarray(
                        a.get('difficulty', np.zeros(len(a['name'])))),
                })
            return waymo_evaluation(gt_annos, det_annos, list(class_names))
        from ...eval.kitti_eval import get_official_eval_result
        from ..waymo.waymo_eval_utils import waymo_annos_to_kitti
        eval_det = [waymo_annos_to_kitti(copy.deepcopy(a)) for a in det_annos]
        eval_gt = [waymo_annos_to_kitti(copy.deepcopy(info['annos']))
                   for info in self.infos]
        name_map = {'Vehicle': 'Car', 'Pedestrian': 'Pedestrian',
                    'Cyclist': 'Cyclist'}
        classes = [name_map.get(c, c) for c in class_names]
        result_str, result_dict = get_official_eval_result(
            eval_gt, eval_det, classes)
        return result_str, result_dict
