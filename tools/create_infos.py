"""Dataset info/gt-database generation CLI (parity: the reference's
``python -m pcdet.datasets.kitti.kitti_dataset create_kitti_infos ...``).

Usage:
    python tools/create_infos.py --dataset kitti \
        --cfg_file tools/cfgs/dataset_configs/kitti_dataset.yaml \
        --data_path data/kitti [--save_path data/kitti]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--dataset', type=str, default='kitti',
                        choices=['kitti'])
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--data_path', type=str, required=True)
    parser.add_argument('--save_path', type=str, default=None)
    parser.add_argument('--workers', type=int, default=8)
    args = parser.parse_args()

    from spsnet_tpu.config import EDict, cfg_from_yaml_file
    cfg = EDict()
    cfg_from_yaml_file(args.cfg_file, cfg)

    if args.dataset == 'kitti':
        from spsnet_tpu.data.kitti.kitti_dataset import create_kitti_infos
        create_kitti_infos(
            dataset_cfg=cfg,
            class_names=['Car', 'Pedestrian', 'Cyclist'],
            data_path=Path(args.data_path),
            save_path=Path(args.save_path or args.data_path),
            workers=args.workers)


if __name__ == '__main__':
    main()
