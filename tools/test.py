"""Evaluation CLI (parity: ``tools/test.py``): single-checkpoint eval or
--eval_all watcher over the checkpoint dir."""
import argparse
import datetime
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spsnet_tpu.utils.jax_setup import setup_jax


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--batch_size', type=int, default=None)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--ckpt_dir', type=str, default=None)
    parser.add_argument('--eval_all', action='store_true')
    parser.add_argument('--max_waiting_mins', type=int, default=30)
    parser.add_argument('--save_to_file', action='store_true')
    parser.add_argument('--output_dir', type=str, default=None,
                        help='run dir holding ckpt/ (default: derived from '
                             'the cfg path like the reference)')
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


def main():
    args, cfg = parse_config()
    setup_jax()
    import jax
    from tools.train import create_logger

    from spsnet_tpu.data import build_dataloader
    from spsnet_tpu.models.detectors import build_detector_from_cfg
    from spsnet_tpu.runtime.trainer import Trainer

    output_dir = Path(args.output_dir) if args.output_dir else \
        Path(cfg.ROOT_DIR) / 'output' / cfg.EXP_GROUP_PATH / \
        cfg.TAG / args.extra_tag
    eval_dir = output_dir / 'eval'
    eval_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(
        eval_dir / f'log_eval_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt')

    batch_size = args.batch_size or \
        int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU) * jax.device_count()
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size,
        root_path=cfg.DATA_CONFIG.DATA_PATH, workers=args.workers,
        logger=logger, training=False)

    model = build_detector_from_cfg(cfg)
    trainer = Trainer(cfg, model, output_dir, logger=logger,
                      total_iters_each_epoch=max(len(loader), 1))
    example = next(iter(loader))
    template = trainer.init_state(example)

    def eval_ckpt(step):
        state, _ = trainer.ckpt.restore(template, step=step)
        if state is None:
            logger.warning('no checkpoint found')
            return
        _, result_str, result_dict = trainer.evaluate(
            dataset, loader, state, cfg.CLASS_NAMES,
            save_to_file=args.save_to_file, result_dir=eval_dir)
        logger.info('epoch %s results:\n%s', step, result_str)
        for k, v in result_dict.items():
            logger.info('%s: %.4f', k, float(v))

    if args.eval_all:
        evaluated = set()
        idle_start = time.time()
        while True:
            steps = [s for s in trainer.ckpt.all_steps()
                     if s not in evaluated]
            if steps:
                idle_start = time.time()
                for s in sorted(steps):
                    eval_ckpt(s)
                    evaluated.add(s)
            elif (time.time() - idle_start) / 60 > args.max_waiting_mins:
                break
            else:
                time.sleep(30)
    else:
        eval_ckpt(None)


if __name__ == '__main__':
    main()
