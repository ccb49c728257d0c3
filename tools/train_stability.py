"""Train the SPSNet stability regressor (parity: ``stability_generate/train.py``).

Usage:
    python tools/train_stability.py --cfg_file tools/cfgs/stability/sf_unc.yaml
"""
import argparse
import datetime
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spsnet_tpu.utils.jax_setup import setup_jax


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--batch_size', type=int, default=None)
    parser.add_argument('--epochs', type=int, default=None)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--output_dir', type=str, default=None)
    parser.add_argument('--seed', type=int, default=42)
    parser.add_argument('--save_vis', action='store_true',
                        help='after training, dump stability heatmap txt '
                             'artifacts for the first batch frame '
                             '(<output_dir>/vis/, the reference\'s '
                             'save_vis_points layout)')
    args = parser.parse_args()

    from spsnet_tpu.config import EDict, StaticConfig, cfg_from_yaml_file
    cfg = EDict()
    cfg_from_yaml_file(args.cfg_file, cfg)

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tools.train import create_logger
    from spsnet_tpu.data import build_dataloader
    from spsnet_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from spsnet_tpu.runtime.checkpoint import CheckpointManager
    from spsnet_tpu.runtime.optimization import build_optimizer
    from spsnet_tpu.runtime.trainer import TrainState, device_batch
    from spsnet_tpu.stability.model import GenerateCenter, generate_center_loss

    output_dir = Path(args.output_dir) if args.output_dir else \
        Path('output/stability') / Path(args.cfg_file).stem / args.extra_tag
    output_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(
        output_dir / f'log_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt')

    batch_size = args.batch_size or \
        int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU) * jax.device_count()
    epochs = args.epochs or int(cfg.OPTIMIZATION.NUM_EPOCHS)

    dataset, loader, sampler = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size,
        root_path=cfg.DATA_CONFIG.DATA_PATH, workers=args.workers,
        logger=logger, training=True, seed=args.seed)

    model = GenerateCenter(model_cfg=StaticConfig(cfg.MODEL))
    mesh = make_mesh()
    tx = build_optimizer(cfg.OPTIMIZATION, len(loader), epochs)
    ckpt = CheckpointManager(output_dir / 'ckpt')

    example = next(iter(loader))
    db = {k: jnp.asarray(v) for k, v in device_batch(example).items()}
    variables = model.init(
        {'params': jax.random.PRNGKey(args.seed),
         'latent': jax.random.PRNGKey(args.seed + 1)}, db, train=True)
    state = TrainState(params=variables['params'],
                       batch_stats=variables.get('batch_stats', {}),
                       opt_state=tx.init(variables['params']),
                       step=jnp.zeros((), jnp.int32))
    state = jax.device_put(state, replicate(mesh))

    def train_step(state, batch):
        rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), state.step)

        def compute(params):
            ret, mut = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch, train=True, mutable=['batch_stats'],
                rngs={'latent': rng})
            loss, tb = generate_center_loss(params, ret, batch['gt_boxes'])
            return loss, (tb, mut.get('batch_stats', {}))

        (loss, (tb, bs)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, batch_stats=bs, opt_state=opt_state,
                          step=state.step + 1), tb

    train_step = jax.jit(train_step, donate_argnums=(0,))

    logger.info('training stability model: %d epochs x %d iters', epochs,
                len(loader))
    import time
    batch = example            # --save_vis frame_id fallback if 0 iterations
    for epoch in range(epochs):
        sampler.set_epoch(epoch)
        t0 = time.time()
        for i, batch in enumerate(loader):
            db = shard_batch(device_batch(batch), mesh)
            state, tb = train_step(state, db)
            if i % 50 == 0:
                logger.info('epoch %d iter %d loss %.4f', epoch, i,
                            float(tb['loss']))
        ckpt.save(epoch + 1, jax.device_get(state))
        logger.info('epoch %d done in %.1fs', epoch, time.time() - t0)

    if args.save_vis:
        from spsnet_tpu.stability.hook import save_vis_points
        ret = model.apply({'params': state.params,
                           'batch_stats': state.batch_stats},
                          db, train=False)
        # db is the LAST training batch — label the artifact with ITS
        # frame_id, not the warmup example's (they differ past one batch)
        out = save_vis_points(
            db, ret, output_dir / 'vis',
            frame_id=str(batch.get('frame_id', ['frame0'])[0]),
            gt_boxes=db.get('gt_boxes'))
        logger.info('visualization artifacts written to %s', out)


if __name__ == '__main__':
    main()
