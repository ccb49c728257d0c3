"""Dataset info/gt-database generation CLI (parity: the reference's
``python -m pcdet.datasets.<name>.<name>_dataset create_<name>_infos ...``).

Usage:
    python tools/create_infos.py --dataset kitti \
        --cfg_file tools/cfgs/dataset_configs/kitti_dataset.yaml \
        --data_path data/kitti [--save_path data/kitti]
    python tools/create_infos.py --dataset waymo \
        --cfg_file tools/cfgs/dataset_configs/waymo_dataset.yaml \
        --data_path data/waymo
    python tools/create_infos.py --dataset nuscenes \
        --cfg_file tools/cfgs/dataset_configs/nuscenes_dataset.yaml \
        --data_path data/nuscenes [--version v1.0-trainval] [--max_sweeps 10]

Waymo consumes the standard per-sequence pkl+npy layout (raw-TFRecord
decoding needs waymo_open_dataset/TF, gated); nuScenes info generation
needs the nuscenes-devkit (gated), while its gt-database generation works
from existing info pkls without it.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--dataset', type=str, default='kitti',
                        choices=['kitti', 'waymo', 'nuscenes'])
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--data_path', type=str, required=True)
    parser.add_argument('--save_path', type=str, default=None)
    parser.add_argument('--workers', type=int, default=8)
    parser.add_argument('--version', type=str, default='v1.0-trainval',
                        help='nuscenes only')
    parser.add_argument('--max_sweeps', type=int, default=10,
                        help='nuscenes only')
    parser.add_argument('--with_gt_database',
                        action=argparse.BooleanOptionalAction, default=True,
                        help='build the gt-sampling database after infos '
                             '(disable with --no-with_gt_database)')
    args = parser.parse_args()

    from spsnet_tpu.config import EDict, cfg_from_yaml_file
    cfg = EDict()
    cfg_from_yaml_file(args.cfg_file, cfg)
    data_path = Path(args.data_path)
    save_path = Path(args.save_path or args.data_path)

    if args.dataset == 'kitti':
        from spsnet_tpu.data.kitti.kitti_dataset import create_kitti_infos
        create_kitti_infos(
            dataset_cfg=cfg,
            class_names=['Car', 'Pedestrian', 'Cyclist'],
            data_path=data_path, save_path=save_path, workers=args.workers,
            with_gt_database=args.with_gt_database)
    elif args.dataset == 'waymo':
        from spsnet_tpu.data.waymo.waymo_dataset import create_waymo_infos
        create_waymo_infos(
            dataset_cfg=cfg,
            class_names=['Vehicle', 'Pedestrian', 'Cyclist'],
            data_path=data_path, save_path=save_path,
            processed_data_tag=cfg.get('PROCESSED_DATA_TAG',
                                       'waymo_processed_data'),
            workers=args.workers, with_gt_database=args.with_gt_database)
    elif args.dataset == 'nuscenes':
        from spsnet_tpu.data.nuscenes.nuscenes_dataset import NuScenesDataset
        from spsnet_tpu.data.nuscenes.nuscenes_utils import (
            create_nuscenes_info)
        try:
            create_nuscenes_info(version=args.version, data_path=data_path,
                                 save_path=save_path,
                                 max_sweeps=args.max_sweeps)
        except ImportError as e:
            print(f'[create_infos] info generation skipped: {e}')
        cfg.VERSION = args.version
        # gt database from the TRAIN infos (devkit-free); eval-mode build
        # avoids the augmentor needing the not-yet-existing dbinfos
        import pickle
        dataset = NuScenesDataset(
            dataset_cfg=cfg, class_names=None, root_path=data_path,
            training=False)
        train_pkl = None
        # dataset.root_path is <data_path>/<version>; infos are written to
        # <save_path>/<version> by create_nuscenes_info
        for cand in (dataset.root_path, save_path / args.version):
            p = cand / f'nuscenes_infos_{args.max_sweeps}sweeps_train.pkl'
            if p.exists():
                train_pkl = p
                break
        if not args.with_gt_database:
            pass
        elif train_pkl is not None:
            with open(train_pkl, 'rb') as f:
                dataset.infos = pickle.load(f)
            dataset.create_groundtruth_database(max_sweeps=args.max_sweeps)
        else:
            print('[create_infos] no nuscenes train infos found; gt '
                  'database skipped')


if __name__ == '__main__':
    main()
