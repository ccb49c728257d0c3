"""KITTI dataset: infos pkl loading, FOV filtering, prediction conversion,
evaluation hookup, and info/gt-database generation tooling.

Parity: ``pcdet/datasets/kitti/kitti_dataset.py``. The infos pkl format is
OpenPCDet-compatible so existing preprocessed KITTI artifacts drop in.
"""
from __future__ import annotations

import copy
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate
from . import kitti_utils
from .calibration import Calibration


class KittiDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.split = dataset_cfg.DATA_SPLIT[self.mode]
        self.root_split_path = self.root_path / (
            'training' if self.split != 'test' else 'testing')
        split_file = self.root_path / 'ImageSets' / (self.split + '.txt')
        self.sample_id_list = [x.strip() for x in open(split_file).readlines()] \
            if split_file.exists() else None

        self.kitti_infos = []
        self.include_kitti_data(self.mode)

    def include_kitti_data(self, mode):
        kitti_infos = []
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            info_path = self.root_path / info_path
            if not info_path.exists():
                continue
            with open(info_path, 'rb') as f:
                kitti_infos.extend(pickle.load(f))
        self.kitti_infos.extend(kitti_infos)
        if self.logger:
            self.logger.info('Total samples for KITTI dataset: %d',
                             len(kitti_infos))

    def set_split(self, split):
        self.split = split
        self.root_split_path = self.root_path / (
            'training' if self.split != 'test' else 'testing')
        split_file = self.root_path / 'ImageSets' / (self.split + '.txt')
        self.sample_id_list = [x.strip() for x in open(split_file).readlines()] \
            if split_file.exists() else None

    def get_lidar(self, idx):
        lidar_file = self.root_split_path / 'velodyne' / f'{idx}.bin'
        return np.fromfile(str(lidar_file), dtype=np.float32).reshape(-1, 4)

    def get_calib(self, idx):
        return Calibration(str(self.root_split_path / 'calib' / f'{idx}.txt'))

    def get_label(self, idx):
        return kitti_utils.get_objects_from_label(
            str(self.root_split_path / 'label_2' / f'{idx}.txt'))

    def get_image(self, idx):
        """(H, W, 3) float32 in [0, 1] (parity: reference ``get_image``)."""
        from PIL import Image
        img = Image.open(str(self.root_split_path / 'image_2' / f'{idx}.png'))
        return np.asarray(img, dtype=np.float32) / 255.0

    def get_depth_map(self, idx):
        """(H, W) float32 metres. Loads ``depth_2`` maps like the reference
        (uint16 png / 256); if absent, projects the lidar sweep instead —
        a sparse but dependency-free fallback."""
        depth_file = self.root_split_path / 'depth_2' / f'{idx}.png'
        if depth_file.exists():
            from PIL import Image
            d = np.asarray(Image.open(str(depth_file)), dtype=np.float32)
            return d / 256.0
        calib = self.get_calib(idx)
        shape = self.get_image_shape(idx)
        pts = self.get_lidar(idx)[:, :3]
        pts_rect = calib.lidar_to_rect(pts)
        pts_img, depth = calib.rect_to_img(pts_rect)
        u = np.round(pts_img[:, 0]).astype(np.int64)
        v = np.round(pts_img[:, 1]).astype(np.int64)
        ok = (u >= 0) & (u < shape[1]) & (v >= 0) & (v < shape[0]) & \
            (depth > 0)
        out = np.zeros((int(shape[0]), int(shape[1])), np.float32)
        out[v[ok], u[ok]] = depth[ok]
        return out

    def get_image_shape(self, idx):
        try:
            from PIL import Image
            img = Image.open(str(self.root_split_path / 'image_2' / f'{idx}.png'))
            return np.array([img.size[1], img.size[0]], dtype=np.int32)
        except Exception:
            return np.array([375, 1242], dtype=np.int32)

    @staticmethod
    def get_fov_flag(pts_rect, img_shape, calib):
        pts_img, pts_rect_depth = calib.rect_to_img(pts_rect)
        val_flag_1 = np.logical_and(pts_img[:, 0] >= 0, pts_img[:, 0] < img_shape[1])
        val_flag_2 = np.logical_and(pts_img[:, 1] >= 0, pts_img[:, 1] < img_shape[0])
        val_flag_merge = np.logical_and(val_flag_1, val_flag_2)
        return np.logical_and(val_flag_merge, pts_rect_depth >= 0)

    @staticmethod
    def get_fov_flag_lidar(points, img_shape, calib):
        """FOV mask straight from lidar points: the native single-pass
        kernel when available (skips materializing pts_rect / pts_img),
        else the two-step numpy path. Differences vs numpy are confined
        to points within float32 rounding of the image boundary (the
        BLAS-vs-sequential 4-term dot product); see
        tests/test_native_hostpipe.py."""
        from ...native.hostpipe import fov_mask_native
        flag = fov_mask_native(points[:, 0:3], calib, img_shape)
        if flag is not None:
            return flag
        pts_rect = calib.lidar_to_rect(points[:, 0:3])
        return KittiDataset.get_fov_flag(pts_rect, img_shape, calib)

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.kitti_infos) * getattr(self, 'total_epochs', 1)
        return len(self.kitti_infos)

    def get_road_plane(self, idx):
        """Rect-frame ground plane [a, b, c, d] from planes/<idx>.txt
        (``kitti_dataset.py:113-129``); None when the optional planes data
        is absent."""
        plane_file = self.root_split_path / 'planes' / f'{idx}.txt'
        if not plane_file.exists():
            return None
        lines = plane_file.read_text().splitlines()
        plane = np.asarray([float(i) for i in lines[3].split()])
        if plane[1] > 0:      # normal always facing up (camera y is down)
            plane = -plane
        return plane / np.linalg.norm(plane[0:3])

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.kitti_infos)
        info = copy.deepcopy(self.kitti_infos[index])
        sample_idx = info['point_cloud']['lidar_idx']
        img_shape = info['image']['image_shape']
        calib = self.get_calib(sample_idx)

        input_dict = {'frame_id': sample_idx, 'calib': calib}

        if 'annos' in info:
            annos = kitti_utils.drop_info_with_name(info['annos'], name='DontCare')
            loc, dims, rots = annos['location'], annos['dimensions'], annos['rotation_y']
            gt_names = annos['name']
            gt_boxes_camera = np.concatenate(
                [loc, dims, rots[..., np.newaxis]], axis=1).astype(np.float32)
            gt_boxes_lidar = kitti_utils.boxes3d_kitti_camera_to_lidar(
                gt_boxes_camera, calib)
            input_dict.update({'gt_names': gt_names, 'gt_boxes': gt_boxes_lidar})
            # Unconditional like the reference (``kitti_dataset.py:431-433``):
            # get_road_plane returns None when planes/ is absent, and the
            # gt-sampling augmentor's own USE_ROAD_PLANE key decides usage.
            road_plane = self.get_road_plane(sample_idx)
            if road_plane is not None:
                input_dict['road_plane'] = road_plane

        get_item_list = list(self.dataset_cfg.get('GET_ITEM_LIST', ['points']))
        if 'annos' in info and 'gt_boxes2d' in get_item_list:
            input_dict['gt_boxes2d'] = \
                kitti_utils.drop_info_with_name(
                    info['annos'], name='DontCare')['bbox']

        if 'points' in get_item_list:
            points = self.get_lidar(sample_idx)
            if self.dataset_cfg.FOV_POINTS_ONLY:
                fov_flag = self.get_fov_flag_lidar(points, img_shape, calib)
                points = points[fov_flag]
            input_dict['points'] = points
        if 'images' in get_item_list:
            input_dict['images'] = self.get_image(sample_idx)
        if 'depth_maps' in get_item_list:
            input_dict['depth_maps'] = self.get_depth_map(sample_idx)
        if 'calib_matricies' in get_item_list:
            (input_dict['trans_lidar_to_cam'],
             input_dict['trans_cam_to_img']) = \
                kitti_utils.calib_to_matricies(calib)

        data_dict = self.prepare_data(data_dict=input_dict)
        data_dict['image_shape'] = img_shape
        data_dict['calib'] = calib
        return data_dict

    @staticmethod
    def generate_prediction_dicts(batch_dict, pred_dicts, class_names,
                                  output_path=None):
        """Convert lidar-frame dets to KITTI camera-frame annos
        (parity: ``kitti_dataset.py:276-351``).

        Args:
            pred_dicts: list per frame of {'pred_boxes' (N,7) np,
                'pred_scores' (N,), 'pred_labels' (N,) 1-based}.
        """
        def template(num):
            return {
                'name': np.zeros(num), 'truncated': np.zeros(num),
                'occluded': np.zeros(num), 'alpha': np.zeros(num),
                'bbox': np.zeros([num, 4]), 'dimensions': np.zeros([num, 3]),
                'location': np.zeros([num, 3]), 'rotation_y': np.zeros(num),
                'score': np.zeros(num), 'boxes_lidar': np.zeros([num, 7]),
            }

        annos = []
        for index, box_dict in enumerate(pred_dicts):
            pred_scores = np.asarray(box_dict['pred_scores'])
            pred_boxes = np.asarray(box_dict['pred_boxes'])
            pred_labels = np.asarray(box_dict['pred_labels']).astype(np.int64)
            pred_dict = template(pred_scores.shape[0])
            if pred_scores.shape[0] > 0:
                calib = batch_dict['calib'][index]
                image_shape = np.asarray(batch_dict['image_shape'][index])
                boxes_cam = kitti_utils.boxes3d_lidar_to_kitti_camera(
                    pred_boxes, calib)
                boxes_img = kitti_utils.boxes3d_kitti_camera_to_imageboxes(
                    boxes_cam, calib, image_shape=image_shape)
                pred_dict['name'] = np.array(class_names)[pred_labels - 1]
                pred_dict['alpha'] = (-np.arctan2(-pred_boxes[:, 1],
                                                  pred_boxes[:, 0])
                                      + boxes_cam[:, 6])
                pred_dict['bbox'] = boxes_img
                pred_dict['dimensions'] = boxes_cam[:, 3:6]
                pred_dict['location'] = boxes_cam[:, 0:3]
                pred_dict['rotation_y'] = boxes_cam[:, 6]
                pred_dict['score'] = pred_scores
                pred_dict['boxes_lidar'] = pred_boxes
            pred_dict['frame_id'] = batch_dict['frame_id'][index]
            annos.append(pred_dict)

            if output_path is not None:
                cur_det_file = Path(output_path) / f"{pred_dict['frame_id']}.txt"
                with open(cur_det_file, 'w') as f:
                    bbox, loc = pred_dict['bbox'], pred_dict['location']
                    dims = pred_dict['dimensions']
                    for k in range(len(bbox)):
                        print('%s -1 -1 %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f '
                              '%.4f %.4f %.4f %.4f %.4f'
                              % (pred_dict['name'][k], pred_dict['alpha'][k],
                                 bbox[k][0], bbox[k][1], bbox[k][2], bbox[k][3],
                                 dims[k][1], dims[k][2], dims[k][0],
                                 loc[k][0], loc[k][1], loc[k][2],
                                 pred_dict['rotation_y'][k],
                                 pred_dict['score'][k]), file=f)
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        if 'annos' not in self.kitti_infos[0]:
            return None, {}
        from ...eval.kitti_eval import get_official_eval_result
        eval_det_annos = copy.deepcopy(det_annos)
        eval_gt_annos = [copy.deepcopy(info['annos']) for info in self.kitti_infos]
        ap_result_str, ap_dict = get_official_eval_result(
            eval_gt_annos, eval_det_annos, class_names)
        return ap_result_str, ap_dict

    # ---- info / gt-database generation (parity: kitti_dataset.py:150-274) ----

    def get_infos(self, num_workers=4, has_label=True, count_inside_pts=True,
                  sample_id_list=None):
        import concurrent.futures as futures

        def process_single_scene(sample_idx):
            info = {'point_cloud': {'num_features': 4, 'lidar_idx': sample_idx},
                    'image': {'image_idx': sample_idx,
                              'image_shape': self.get_image_shape(sample_idx)}}
            calib = self.get_calib(sample_idx)
            info['calib'] = {'P2': calib.P2, 'R0_rect': calib.R0,
                             'Tr_velo_to_cam': calib.V2C}
            if has_label:
                obj_list = self.get_label(sample_idx)
                annotations = {
                    'name': np.array([obj.cls_type for obj in obj_list]),
                    'truncated': np.array([obj.truncation for obj in obj_list]),
                    'occluded': np.array([obj.occlusion for obj in obj_list]),
                    'alpha': np.array([obj.alpha for obj in obj_list]),
                    'bbox': np.array([obj.box2d for obj in obj_list]).reshape(-1, 4),
                    'dimensions': np.array(
                        [[obj.l, obj.h, obj.w] for obj in obj_list]).reshape(-1, 3),
                    'location': np.array(
                        [obj.loc for obj in obj_list]).reshape(-1, 3),
                    'rotation_y': np.array([obj.ry for obj in obj_list]),
                    'score': np.array([obj.score for obj in obj_list]),
                    'difficulty': np.array([obj.level for obj in obj_list],
                                           np.int32),
                }
                num_objects = len([obj for obj in obj_list
                                   if obj.cls_type != 'DontCare'])
                annotations['index'] = np.array(
                    list(range(num_objects)) +
                    [-1] * (len(obj_list) - num_objects), dtype=np.int32)
                loc = annotations['location'][:num_objects]
                dims = annotations['dimensions'][:num_objects]
                rots = annotations['rotation_y'][:num_objects]
                loc_lidar = calib.rect_to_lidar(loc)
                l, h, w = dims[:, 0:1], dims[:, 1:2], dims[:, 2:3]
                loc_lidar[:, 2] += h[:, 0] / 2
                annotations['gt_boxes_lidar'] = np.concatenate(
                    [loc_lidar, l, w, h, -(rots[..., None] + np.pi / 2)], axis=1)

                if count_inside_pts:
                    from ..processor.data_processor import points_in_boxes_cpu_np
                    points = self.get_lidar(sample_idx)
                    pts_rect = calib.lidar_to_rect(points[:, 0:3])
                    fov_flag = self.get_fov_flag(
                        pts_rect, info['image']['image_shape'], calib)
                    pts_fov = points[fov_flag]
                    indicator = points_in_boxes_cpu_np(
                        pts_fov[:, :3], annotations['gt_boxes_lidar'])
                    cnt = indicator.sum(axis=1)
                    num_points_in_gt = np.concatenate(
                        [cnt, -np.ones(len(obj_list) - num_objects)]).astype(np.int32)
                    annotations['num_points_in_gt'] = num_points_in_gt
                info['annos'] = annotations
            return info

        sample_id_list = sample_id_list or self.sample_id_list
        with futures.ThreadPoolExecutor(num_workers) as executor:
            infos = list(executor.map(process_single_scene, sample_id_list))
        return infos

    def create_groundtruth_database(self, info_path, used_classes=None,
                                    split='train'):
        from ..processor.data_processor import points_in_boxes_cpu_np
        database_save_path = self.root_path / f'gt_database' \
            if split == 'train' else self.root_path / f'gt_database_{split}'
        db_info_save_path = self.root_path / f'kitti_dbinfos_{split}.pkl'
        database_save_path.mkdir(parents=True, exist_ok=True)
        all_db_infos = {}
        with open(info_path, 'rb') as f:
            infos = pickle.load(f)
        for k, info in enumerate(infos):
            sample_idx = info['point_cloud']['lidar_idx']
            points = self.get_lidar(sample_idx)
            annos = info['annos']
            names = annos['name']
            difficulty = annos['difficulty']
            gt_boxes = annos['gt_boxes_lidar']
            num_obj = gt_boxes.shape[0]
            if num_obj == 0:
                continue
            indicator = points_in_boxes_cpu_np(points[:, :3], gt_boxes)
            for i in range(num_obj):
                filename = f'{sample_idx}_{names[i]}_{i}.bin'
                filepath = database_save_path / filename
                gt_points = points[indicator[i] > 0]
                gt_points[:, :3] -= gt_boxes[i, :3]
                with open(filepath, 'w') as f:
                    gt_points.tofile(f)
                if used_classes is None or names[i] in used_classes:
                    db_path = str(filepath.relative_to(self.root_path))
                    db_info = {'name': names[i], 'path': db_path,
                               'image_idx': sample_idx, 'gt_idx': i,
                               'box3d_lidar': gt_boxes[i],
                               'num_points_in_gt': gt_points.shape[0],
                               'difficulty': difficulty[i],
                               'bbox': annos['bbox'][i],
                               'score': annos['score'][i]}
                    all_db_infos.setdefault(names[i], []).append(db_info)
        with open(db_info_save_path, 'wb') as f:
            pickle.dump(all_db_infos, f)
        return all_db_infos


def create_kitti_infos(dataset_cfg, class_names, data_path, save_path,
                       workers=4, with_gt_database=True):
    """Generate train/val/test infos + gt database
    (parity: ``kitti_dataset.py:create_kitti_infos``)."""
    dataset = KittiDataset(dataset_cfg=dataset_cfg, class_names=class_names,
                           root_path=data_path, training=False)
    train_split, val_split = 'train', 'val'
    for split, fname in [(train_split, f'kitti_infos_{train_split}.pkl'),
                         (val_split, f'kitti_infos_{val_split}.pkl')]:
        dataset.set_split(split)
        infos = dataset.get_infos(num_workers=workers, has_label=True,
                                  count_inside_pts=True)
        with open(Path(save_path) / fname, 'wb') as f:
            pickle.dump(infos, f)
    if with_gt_database:
        dataset.set_split(train_split)
        dataset.create_groundtruth_database(
            Path(save_path) / f'kitti_infos_{train_split}.pkl',
            split=train_split)
