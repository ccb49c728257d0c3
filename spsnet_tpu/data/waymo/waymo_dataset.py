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
        self._load_split()
        self.infos = []
        self.include_waymo_data(self.mode)
        # node-local point-cloud cache in shared memory (parity:
        # waymo_dataset.py:34-37,77-120 — the reference uses SharedArray;
        # here each frame's npy is copied once into /dev/shm and then
        # mmap-read by every dataloader worker, same effect without the dep)
        self.use_shared_memory = bool(
            dataset_cfg.get('USE_SHARED_MEMORY', False)) and self.training
        self.shared_memory_file_limit = int(
            dataset_cfg.get('SHARED_MEMORY_FILE_LIMIT', 0x7FFFFFFF))
        self._shm_base = Path(dataset_cfg.get('SHARED_MEMORY_DIR', '/dev/shm'))
        self._rekey_shm()

    def _rekey_shm(self):
        self._shm_dir = self._shm_base / f'spsnet_tpu_waymo_{self.split}'
        # lazily-initialized cached-file count: None until the first miss,
        # then maintained in-process so the hot loader path never re-lists
        # the (potentially 30k-entry) cache directory per frame
        self._shm_count = None
        if self.use_shared_memory:
            self._shm_dir.mkdir(parents=True, exist_ok=True)

    def _load_split(self):
        split_file = self.root_path / 'ImageSets' / (self.split + '.txt')
        self.sample_sequence_list = [x.strip() for x in
                                     open(split_file).readlines()] \
            if split_file.exists() else []

    def set_split(self, split):
        """Re-point at another split without rebuilding the pipeline
        (parity: ``waymo_dataset.py set_split`` — which reloads the split's
        infos). The shared-memory cache is re-keyed to the new split."""
        self.split = split
        self._load_split()
        self.infos = []
        self.include_waymo_data(self.mode)
        self._rekey_shm()

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

    def _shm_path(self, sequence_name, sample_idx):
        return self._shm_dir / f'{sequence_name}_{sample_idx:04d}.npy'

    def clean_shared_memory(self):
        """Remove this split's cached frames (parity:
        ``waymo_dataset.py clean_shared_memory``). Call once per node after
        training; caches are keyed by split so concurrent jobs on different
        splits do not collide."""
        if self._shm_dir.exists():
            # '*' (not '*.npy') so crash-orphaned .tmp<pid> files go too
            for f in self._shm_dir.glob('*'):
                f.unlink(missing_ok=True)
            try:
                self._shm_dir.rmdir()
            except OSError:
                pass
        self._shm_count = None

    def get_lidar(self, sequence_name, sample_idx):
        lidar_file = self.data_path / sequence_name / f'{sample_idx:04d}.npy'
        if self.use_shared_memory:
            shm = self._shm_path(sequence_name, sample_idx)
            if shm.exists():
                lidar_file = shm
            else:
                if self._shm_count is None:  # first miss: count once
                    self._shm_count = sum(
                        1 for _ in self._shm_dir.glob('*.npy'))
                if self._shm_count < self.shared_memory_file_limit:
                    # one worker wins the copy race; the atomic rename means
                    # readers never see a partial file (the in-process count
                    # is approximate across processes — the limit is a cache
                    # size bound, not an exact quota)
                    import os
                    tmp = shm.with_suffix(f'.tmp{os.getpid()}')
                    tmp.write_bytes(Path(lidar_file).read_bytes())
                    tmp.rename(shm)
                    self._shm_count += 1
                    lidar_file = shm
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

    def get_infos(self, raw_data_path, save_path, num_workers=8,
                  has_label=True, sampled_interval=1):
        """Aggregate per-sequence infos for the current split (parity:
        ``waymo_dataset.py:137 get_infos``).

        Documented deviation: the reference decodes raw TFRecords via
        ``waymo_open_dataset``'s TF range-image utils; that toolchain
        (tensorflow) is absent from TPU training hosts, so THIS
        implementation consumes only the intermediate per-sequence layout
        the reference's decoder produces (``<seq>/<seq>.pkl`` +
        ``<seq>/NNNN.npy``) — the format every published OpenPCDet Waymo
        setup already ships. Missing sequences raise with a pointer to the
        decode step. ``num_points_in_gt`` is filled in when missing.
        """
        raw_data_path = Path(raw_data_path)
        save_path = Path(save_path)
        all_infos = []
        for sequence_file in self.sample_sequence_list:
            seq = Path(sequence_file).stem
            info_path = save_path / seq / f'{seq}.pkl'
            if not info_path.exists():
                raise FileNotFoundError(
                    f'{info_path} not found: decode the raw TFRecords with '
                    'the waymo_open_dataset toolchain first (per-sequence '
                    'pkl + npy layout), then re-run create_infos. Raw '
                    'TFRecord decoding is intentionally not reimplemented '
                    'here (needs tensorflow; see docstring).')
            with open(info_path, 'rb') as f:
                seq_infos = pickle.load(f)
            for info in seq_infos[::sampled_interval]:
                if has_label and 'annos' in info and \
                        'num_points_in_gt' not in info['annos'] and \
                        len(info['annos'].get('name', [])):
                    pts = self.get_lidar(
                        info['point_cloud']['lidar_sequence'],
                        info['point_cloud']['sample_idx'])
                    from ..processor.data_processor import points_in_boxes_cpu_np
                    ind = points_in_boxes_cpu_np(
                        pts[:, :3], info['annos']['gt_boxes_lidar'][:, :7])
                    info['annos']['num_points_in_gt'] = \
                        ind.sum(axis=1).astype(np.int32)
                all_infos.append(info)
        return all_infos

    def create_groundtruth_database(self, info_path, save_path,
                                    used_classes=None, split='train',
                                    sampled_interval=10,
                                    processed_data_tag=None):
        """GT-crop database for gt_sampling augmentation (parity:
        ``waymo_dataset.py:321-400`` including its Vehicle-every-4th /
        Pedestrian-every-2nd frame subsampling quirks)."""
        from ..processor.data_processor import points_in_boxes_cpu_np

        tag = processed_data_tag or 'waymo_processed_data'
        database_save_path = save_path / (
            f'{tag}_gt_database_{split}_sampled_{sampled_interval}')
        db_info_save_path = save_path / (
            f'{tag}_waymo_dbinfos_{split}_sampled_{sampled_interval}.pkl')
        database_save_path.mkdir(parents=True, exist_ok=True)
        all_db_infos = {}
        with open(info_path, 'rb') as f:
            infos = pickle.load(f)

        for k in range(0, len(infos), sampled_interval):
            info = infos[k]
            pc_info = info['point_cloud']
            sequence_name = pc_info['lidar_sequence']
            sample_idx = pc_info['sample_idx']
            points = self.get_lidar(sequence_name, sample_idx)

            annos = info['annos']
            names = np.asarray(annos['name'])
            difficulty = np.asarray(annos['difficulty'])
            gt_boxes = np.asarray(annos['gt_boxes_lidar'])

            # reference keeps Vehicles only every 4th frame and Pedestrians
            # only every 2nd frame to bound database size
            if k % 4 != 0 and len(names) > 0:
                mask = names == 'Vehicle'
                names, difficulty, gt_boxes = \
                    names[~mask], difficulty[~mask], gt_boxes[~mask]
            if k % 2 != 0 and len(names) > 0:
                mask = names == 'Pedestrian'
                names, difficulty, gt_boxes = \
                    names[~mask], difficulty[~mask], gt_boxes[~mask]

            num_obj = gt_boxes.shape[0]
            if num_obj == 0:
                continue
            ind = points_in_boxes_cpu_np(points[:, :3], gt_boxes[:, :7])
            # per-point first-box index (points_in_boxes_gpu semantics)
            box_idxs = np.where(ind.any(axis=0), ind.argmax(axis=0), -1)
            for i in range(num_obj):
                filename = f'{sequence_name}_{sample_idx:04d}_{names[i]}_{i}.bin'
                filepath = database_save_path / filename
                gt_points = points[box_idxs == i].copy()
                gt_points[:, :3] -= gt_boxes[i, :3]
                if used_classes is None or names[i] in used_classes:
                    gt_points.astype(np.float32).tofile(filepath)
                    db_info = {
                        'name': names[i],
                        'path': str(filepath.relative_to(self.root_path)),
                        'sequence_name': sequence_name,
                        'sample_idx': sample_idx, 'gt_idx': i,
                        'box3d_lidar': gt_boxes[i],
                        'num_points_in_gt': gt_points.shape[0],
                        'difficulty': difficulty[i],
                    }
                    all_db_infos.setdefault(names[i], []).append(db_info)
        for k2, v in all_db_infos.items():
            print(f'Database {k2}: {len(v)}')
        with open(db_info_save_path, 'wb') as f:
            pickle.dump(all_db_infos, f)

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

    def evaluation(self, det_annos, class_names, **kwargs):  # noqa: C901
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


def create_waymo_infos(dataset_cfg, class_names, data_path, save_path,
                       raw_data_tag='raw_data',
                       processed_data_tag='waymo_processed_data',
                       workers=8, with_gt_database=True):
    """Info + gt-database generation driver (parity:
    ``waymo_dataset.py:403-445``): train/val info aggregation then the
    train-split gt database."""
    dataset = WaymoDataset(dataset_cfg=dataset_cfg, class_names=class_names,
                           root_path=data_path, training=False)
    train_filename = save_path / f'{processed_data_tag}_infos_train.pkl'
    val_filename = save_path / f'{processed_data_tag}_infos_val.pkl'

    for split, filename in [('train', train_filename),
                            ('val', val_filename)]:
        dataset.set_split(split)
        infos = dataset.get_infos(
            raw_data_path=data_path / raw_data_tag,
            save_path=save_path / processed_data_tag,
            num_workers=workers, has_label=True, sampled_interval=1)
        with open(filename, 'wb') as f:
            pickle.dump(infos, f)
        print(f'Waymo info {split} file saved to {filename} '
              f'({len(infos)} frames)')

    if with_gt_database:
        dataset.set_split('train')
        dataset.create_groundtruth_database(
            info_path=train_filename, save_path=save_path, split='train',
            sampled_interval=1,
            used_classes=['Vehicle', 'Pedestrian', 'Cyclist'],
            processed_data_tag=processed_data_tag)
    print('Waymo data preparation done')
