"""nuScenes info-generation helpers (parity:
``pcdet/datasets/nuscenes/nuscenes_utils.py:157-386``).

Everything here is devkit-gated: the functions import ``nuscenes`` /
``pyquaternion`` lazily and raise a clear error when the devkit is absent
(it is not in this image). The consumed artifacts (``nuscenes_infos_*`` /
``nuscenes_dbinfos_*`` pkls) are the standard OpenPCDet layout, so
pre-generated infos from any OpenPCDet setup work unchanged.
"""
from __future__ import annotations

from functools import reduce
from pathlib import Path

import numpy as np

map_name_from_general_to_detection = {
    'human.pedestrian.adult': 'pedestrian',
    'human.pedestrian.child': 'pedestrian',
    'human.pedestrian.wheelchair': 'ignore',
    'human.pedestrian.stroller': 'ignore',
    'human.pedestrian.personal_mobility': 'ignore',
    'human.pedestrian.police_officer': 'pedestrian',
    'human.pedestrian.construction_worker': 'pedestrian',
    'animal': 'ignore',
    'vehicle.car': 'car',
    'vehicle.motorcycle': 'motorcycle',
    'vehicle.bicycle': 'bicycle',
    'vehicle.bus.bendy': 'bus',
    'vehicle.bus.rigid': 'bus',
    'vehicle.truck': 'truck',
    'vehicle.construction': 'construction_vehicle',
    'vehicle.emergency.ambulance': 'ignore',
    'vehicle.emergency.police': 'ignore',
    'vehicle.trailer': 'trailer',
    'movable_object.barrier': 'barrier',
    'movable_object.trafficcone': 'traffic_cone',
    'movable_object.pushable_pullable': 'ignore',
    'movable_object.debris': 'ignore',
    'static_object.bicycle_rack': 'ignore',
}


# Most-frequent attribute per detection class (argmax of the reference's
# train-set attribute frequency table, ``nuscenes_utils.py:43-120
# cls_attr_dist``) — the fallback when the velocity rule below abstains.
# barrier / traffic_cone have no attributes; the reference's argmax over
# their all-zero rows degenerates to dict order ('cycle.with_rider'),
# reproduced here. Those classes are AAE-excluded in the eval anyway.
DEFAULT_ATTRIBUTE = {
    'barrier': 'cycle.with_rider',
    'bicycle': 'cycle.without_rider',
    'bus': 'vehicle.moving',
    'car': 'vehicle.parked',
    'construction_vehicle': 'vehicle.parked',
    'ignore': 'vehicle.parked',
    'motorcycle': 'cycle.without_rider',
    'pedestrian': 'pedestrian.moving',
    'traffic_cone': 'cycle.with_rider',
    'trailer': 'vehicle.parked',
    'truck': 'vehicle.parked',
}


def default_attribute(name, box):
    """Attribute for a predicted box, the reference's submission rule
    (``nuscenes_utils.py:443-458``): speed > 0.2 m/s makes vehicles
    'vehicle.moving' and cycles 'cycle.with_rider'; slow pedestrians are
    'pedestrian.standing', slow buses 'vehicle.stopped'; everything else
    falls back to the class's most frequent train-set attribute."""
    box = np.asarray(box)
    speed = float(np.linalg.norm(box[7:9])) if len(box) >= 9 else 0.0
    if speed > 0.2:
        if name in ('car', 'construction_vehicle', 'bus', 'truck',
                    'trailer'):
            return 'vehicle.moving'
        if name in ('bicycle', 'motorcycle'):
            return 'cycle.with_rider'
    else:
        if name == 'pedestrian':
            return 'pedestrian.standing'
        if name == 'bus':
            return 'vehicle.stopped'
    return DEFAULT_ATTRIBUTE.get(name, '')


def quaternion_yaw(q) -> float:
    """Yaw of a pyquaternion Quaternion in the xy plane
    (``nuscenes_utils.py:234-249``)."""
    v = np.dot(q.rotation_matrix, np.array([1.0, 0.0, 0.0]))
    return float(np.arctan2(v[1], v[0]))


def get_available_scenes(nusc):
    """Scenes whose lidar files actually exist on disk
    (``nuscenes_utils.py:157-182``)."""
    available_scenes = []
    for scene in nusc.scene:
        scene_token = scene['token']
        scene_rec = nusc.get('scene', scene_token)
        sample_rec = nusc.get('sample', scene_rec['first_sample_token'])
        sd_rec = nusc.get('sample_data', sample_rec['data']['LIDAR_TOP'])
        scene_not_exist = False
        while True:
            lidar_path, boxes, _ = nusc.get_sample_data(sd_rec['token'])
            if not Path(lidar_path).exists():
                scene_not_exist = True
            break
        if not scene_not_exist:
            available_scenes.append(scene)
    return available_scenes


def fill_trainval_infos(data_path, nusc, train_scenes, val_scenes,
                        test=False, max_sweeps=10):
    """Per-sample info dicts with sweep transform chains and 9-dim gt boxes
    [x,y,z,dx,dy,dz,yaw,vx,vy] (``nuscenes_utils.py:252-386``)."""
    from nuscenes.utils.geometry_utils import transform_matrix
    from pyquaternion import Quaternion

    train_nusc_infos, val_nusc_infos = [], []
    ref_chan = chan = 'LIDAR_TOP'

    for index, sample in enumerate(nusc.sample):
        ref_sd_token = sample['data'][ref_chan]
        ref_sd_rec = nusc.get('sample_data', ref_sd_token)
        ref_cs_rec = nusc.get('calibrated_sensor',
                              ref_sd_rec['calibrated_sensor_token'])
        ref_pose_rec = nusc.get('ego_pose', ref_sd_rec['ego_pose_token'])
        ref_time = 1e-6 * ref_sd_rec['timestamp']
        ref_lidar_path, ref_boxes, _ = nusc.get_sample_data(ref_sd_token)

        ref_cam_front_token = sample['data']['CAM_FRONT']
        ref_cam_path, _, ref_cam_intrinsic = nusc.get_sample_data(
            ref_cam_front_token)

        ref_from_car = transform_matrix(
            ref_cs_rec['translation'], Quaternion(ref_cs_rec['rotation']),
            inverse=True)
        car_from_global = transform_matrix(
            ref_pose_rec['translation'], Quaternion(ref_pose_rec['rotation']),
            inverse=True)

        info = {
            'lidar_path': str(Path(ref_lidar_path).relative_to(data_path)),
            'cam_front_path': str(Path(ref_cam_path).relative_to(data_path)),
            'cam_intrinsic': ref_cam_intrinsic,
            'token': sample['token'],
            'sweeps': [],
            'ref_from_car': ref_from_car,
            'car_from_global': car_from_global,
            'timestamp': ref_time,
        }

        sample_data_token = sample['data'][chan]
        curr_sd_rec = nusc.get('sample_data', sample_data_token)
        sweeps = []
        while len(sweeps) < max_sweeps - 1:
            if curr_sd_rec['prev'] == '':
                if len(sweeps) == 0:
                    sweeps.append({
                        'lidar_path': info['lidar_path'],
                        'sample_data_token': curr_sd_rec['token'],
                        'transform_matrix': None,
                        'time_lag': curr_sd_rec['timestamp'] * 0,
                    })
                else:
                    sweeps.append(sweeps[-1])
            else:
                curr_sd_rec = nusc.get('sample_data', curr_sd_rec['prev'])
                current_pose_rec = nusc.get('ego_pose',
                                            curr_sd_rec['ego_pose_token'])
                global_from_car = transform_matrix(
                    current_pose_rec['translation'],
                    Quaternion(current_pose_rec['rotation']), inverse=False)
                current_cs_rec = nusc.get(
                    'calibrated_sensor', curr_sd_rec['calibrated_sensor_token'])
                car_from_current = transform_matrix(
                    current_cs_rec['translation'],
                    Quaternion(current_cs_rec['rotation']), inverse=False)
                tm = reduce(np.dot, [ref_from_car, car_from_global,
                                     global_from_car, car_from_current])
                lidar_path = nusc.get_sample_data_path(curr_sd_rec['token'])
                sweeps.append({
                    'lidar_path': str(Path(lidar_path).relative_to(data_path)),
                    'sample_data_token': curr_sd_rec['token'],
                    'transform_matrix': tm,
                    'global_from_car': global_from_car,
                    'car_from_current': car_from_current,
                    'time_lag': ref_time - 1e-6 * curr_sd_rec['timestamp'],
                })
        info['sweeps'] = sweeps

        if not test:
            annotations = [nusc.get('sample_annotation', token)
                           for token in sample['anns']]
            num_lidar_pts = np.array([a['num_lidar_pts']
                                      for a in annotations])
            num_radar_pts = np.array([a['num_radar_pts']
                                      for a in annotations])
            mask = (num_lidar_pts + num_radar_pts > 0)

            locs = np.array([b.center for b in ref_boxes]).reshape(-1, 3)
            # wlh -> dx,dy,dz (lwh)
            dims = np.array([b.wlh for b in ref_boxes]
                            ).reshape(-1, 3)[:, [1, 0, 2]]
            velocity = np.array([b.velocity for b in ref_boxes]
                                ).reshape(-1, 3)
            rots = np.array([quaternion_yaw(b.orientation)
                             for b in ref_boxes]).reshape(-1, 1)
            names = np.array([b.name for b in ref_boxes])
            tokens = np.array([b.token for b in ref_boxes])
            gt_boxes = np.concatenate([locs, dims, rots, velocity[:, :2]],
                                      axis=1)
            info['gt_boxes'] = gt_boxes[mask, :]
            info['gt_boxes_velocity'] = velocity[mask, :]
            info['gt_names'] = np.array(
                [map_name_from_general_to_detection.get(n, n)
                 for n in names])[mask]
            info['gt_boxes_token'] = tokens[mask]
            info['num_lidar_pts'] = num_lidar_pts[mask]
            info['num_radar_pts'] = num_radar_pts[mask]
            # gt attribute names (for offline AAE): one per annotation,
            # '' when the annotation carries none (barrier, traffic_cone)
            info['gt_attr_names'] = np.array([
                nusc.get('attribute', a['attribute_tokens'][0])['name']
                if a['attribute_tokens'] else ''
                for a in annotations])[mask]

        if sample['scene_token'] in train_scenes:
            train_nusc_infos.append(info)
        else:
            val_nusc_infos.append(info)
    return train_nusc_infos, val_nusc_infos


def create_nuscenes_info(version, data_path, save_path, max_sweeps=10):
    """Generate ``nuscenes_infos_{N}sweeps_{split}.pkl``
    (``nuscenes_dataset.py:382-433``). Requires the nuscenes devkit."""
    import pickle
    try:
        from nuscenes.nuscenes import NuScenes
        from nuscenes.utils import splits
    except ImportError as e:
        raise ImportError(
            'nuScenes info generation needs the nuscenes-devkit '
            '(pip install nuscenes-devkit); pre-generated OpenPCDet info '
            'pkls are consumed as-is without it') from e

    data_path = Path(data_path) / version
    save_path = Path(save_path) / version
    save_path.mkdir(parents=True, exist_ok=True)
    assert version in ['v1.0-trainval', 'v1.0-test', 'v1.0-mini']
    if version == 'v1.0-trainval':
        train_scenes, val_scenes = splits.train, splits.val
    elif version == 'v1.0-test':
        train_scenes, val_scenes = splits.test, []
    else:
        train_scenes, val_scenes = splits.mini_train, splits.mini_val

    nusc = NuScenes(version=version, dataroot=str(data_path), verbose=True)
    available_scenes = get_available_scenes(nusc)
    names = [s['name'] for s in available_scenes]
    train_scenes = {available_scenes[names.index(s)]['token']
                    for s in train_scenes if s in names}
    val_scenes = {available_scenes[names.index(s)]['token']
                  for s in val_scenes if s in names}
    print(f'{version}: train scene({len(train_scenes)}), '
          f'val scene({len(val_scenes)})')

    train_infos, val_infos = fill_trainval_infos(
        data_path=data_path, nusc=nusc, train_scenes=train_scenes,
        val_scenes=val_scenes, test='test' in version, max_sweeps=max_sweeps)

    if version == 'v1.0-test':
        print(f'test sample: {len(train_infos)}')
        with open(save_path / f'nuscenes_infos_{max_sweeps}sweeps_test.pkl',
                  'wb') as f:
            pickle.dump(train_infos, f)
    else:
        print(f'train sample: {len(train_infos)}, '
              f'val sample: {len(val_infos)}')
        with open(save_path / f'nuscenes_infos_{max_sweeps}sweeps_train.pkl',
                  'wb') as f:
            pickle.dump(train_infos, f)
        with open(save_path / f'nuscenes_infos_{max_sweeps}sweeps_val.pkl',
                  'wb') as f:
            pickle.dump(val_infos, f)
