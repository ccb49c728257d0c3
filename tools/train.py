"""Training CLI (parity: ``tools/train.py``).

Usage:
    python tools/train.py --cfg_file tools/cfgs/kitti_models/IA-SSD.yaml \
        [--batch_size N] [--epochs N] [--extra_tag tag] [--set KEY VALUE ...]

Single program, SPMD over all visible devices; multi-host via
``jax.distributed.initialize`` (set JAX_COORDINATOR_ADDRESS etc.).
"""
import argparse
import datetime
import logging
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spsnet_tpu.utils.jax_setup import setup_jax


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--batch_size', type=int, default=None,
                        help='global batch size (default: cfg * n_devices)')
    parser.add_argument('--epochs', type=int, default=None)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--pretrained_model', type=str, default=None)
    parser.add_argument('--output_dir', type=str, default=None)
    parser.add_argument('--seed', type=int, default=42)
    parser.add_argument('--set', dest='set_cfgs', nargs=argparse.REMAINDER,
                        default=None)
    args = parser.parse_args()

    from spsnet_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = '/'.join(args.cfg_file.split('/')[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def create_logger(log_file=None):
    logger = logging.getLogger('spsnet_tpu')
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter('%(asctime)s  %(levelname)5s  %(message)s')
    console = logging.StreamHandler()
    console.setFormatter(fmt)
    logger.addHandler(console)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def main():
    args, cfg = parse_config()
    setup_jax()
    import jax

    from spsnet_tpu.data import build_dataloader
    from spsnet_tpu.models.detectors import build_detector_from_cfg
    from spsnet_tpu.runtime.trainer import Trainer

    output_dir = Path(args.output_dir) if args.output_dir else \
        Path(cfg.ROOT_DIR) / 'output' / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    output_dir.mkdir(parents=True, exist_ok=True)
    log_file = output_dir / f'log_train_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt'
    logger = create_logger(log_file)
    logger.info('devices: %s, processes: %d', jax.devices(),
                jax.process_count())

    n_dev = jax.device_count()
    batch_size = args.batch_size or \
        int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU) * n_dev
    epochs = args.epochs or int(cfg.OPTIMIZATION.NUM_EPOCHS)
    cfg.OPTIMIZATION.NUM_EPOCHS = epochs

    dataset, loader, sampler = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size // jax.process_count(),
        root_path=cfg.DATA_CONFIG.DATA_PATH, workers=args.workers,
        logger=logger, training=True, seed=args.seed,
        num_shards=jax.process_count(), shard_id=jax.process_index())

    model = build_detector_from_cfg(cfg)
    trainer = Trainer(cfg, model, output_dir, logger=logger,
                      total_iters_each_epoch=len(loader))

    example = next(iter(loader))
    state = trainer.init_state(example, seed=args.seed)
    if args.pretrained_model:
        from spsnet_tpu.runtime.checkpoint import load_pretrained_params
        import pickle
        with open(args.pretrained_model, 'rb') as f:
            pre = pickle.load(f)
        state = state.replace(params=load_pretrained_params(
            state.params, pre['params'], logger))
    state, start_epoch = trainer.maybe_resume(state)

    logger.info('start training: %d epochs x %d iters, global batch %d',
                epochs, len(loader), batch_size)
    trainer.train(loader, sampler=sampler, start_epoch=start_epoch,
                  state=state)
    logger.info('training finished')


if __name__ == '__main__':
    main()
