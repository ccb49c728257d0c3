"""Optimizers + LR/momentum schedules.

Parity: ``tools/train_utils/optimization/`` — the ``adam_onecycle`` default is
fastai's OptimWrapper(Adam(betas=(0.9, 0.99)), true_wd) + OneCycle cosine
LR/momentum schedule (``learning_schedules_fastai.py:53-77``); alternatives
are adam/sgd with step-decay LambdaLR and optional cosine warmup. Rebuilt on
optax: decoupled weight decay == fastai true_wd, and the scheduled momentum
maps to Adam's b1 via ``inject_hyperparams``.
"""
from __future__ import annotations

import numpy as np
import optax


def annealing_cos(start, end, pct):
    cos_out = np.cos(np.pi * pct) + 1
    return end + (start - end) / 2 * cos_out


def onecycle_schedules(total_steps, lr_max, moms, div_factor, pct_start):
    """Returns (lr_fn, mom_fn) step->value (host-side float math is fine —
    optax schedules are traced with jnp, so use jnp ops)."""
    import jax.numpy as jnp

    low_lr = lr_max / div_factor
    split = pct_start

    def _cos(start, end, pct):
        return end + (start - end) / 2 * (jnp.cos(jnp.pi * pct) + 1)

    def lr_fn(step):
        pct = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        up = _cos(low_lr, lr_max, pct / split)
        down = _cos(lr_max, low_lr / 1e4, (pct - split) / (1 - split))
        return jnp.where(pct < split, up, down)

    def mom_fn(step):
        pct = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        up = _cos(moms[0], moms[1], pct / split)
        down = _cos(moms[1], moms[0], (pct - split) / (1 - split))
        return jnp.where(pct < split, up, down)

    return lr_fn, mom_fn


def step_decay_schedule(optim_cfg, total_iters_each_epoch):
    """LambdaLR step decay (``optimization/__init__.py:44-51``)."""
    import jax.numpy as jnp
    decay_steps = [x * total_iters_each_epoch for x in optim_cfg.DECAY_STEP_LIST]
    lr_decay = optim_cfg.LR_DECAY
    lr_clip = optim_cfg.LR_CLIP
    base_lr = optim_cfg.LR

    def lr_fn(step):
        decay = jnp.ones(())
        for ds in decay_steps:
            decay = jnp.where(step >= ds, decay * lr_decay, decay)
        return base_lr * jnp.maximum(decay, lr_clip / base_lr)

    return lr_fn


def build_optimizer(optim_cfg, total_iters_each_epoch, total_epochs):
    """Returns an optax GradientTransformation implementing the configured
    optimizer+schedule, with grad-norm clipping folded in
    (``train_utils.py:53``: clip 10 before step)."""
    total_steps = total_iters_each_epoch * total_epochs
    clip = optax.clip_by_global_norm(float(optim_cfg.get('GRAD_NORM_CLIP', 10)))

    name = optim_cfg.OPTIMIZER
    if name == 'adam_onecycle':
        lr_fn, mom_fn = onecycle_schedules(
            total_steps, optim_cfg.LR, list(optim_cfg.MOMS),
            optim_cfg.DIV_FACTOR, optim_cfg.PCT_START)
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr_fn, b1=mom_fn, b2=0.99,
            weight_decay=float(optim_cfg.WEIGHT_DECAY))
        return optax.chain(clip, opt)
    if name == 'adam':
        lr_fn = step_decay_schedule(optim_cfg, total_iters_each_epoch)
        # torch.optim.Adam's weight_decay is L2 added to the gradient
        opt = optax.chain(
            optax.add_decayed_weights(float(optim_cfg.WEIGHT_DECAY)),
            optax.inject_hyperparams(optax.adam)(learning_rate=lr_fn))
        return optax.chain(clip, opt)
    if name == 'sgd':
        lr_fn = step_decay_schedule(optim_cfg, total_iters_each_epoch)
        opt = optax.chain(
            optax.add_decayed_weights(float(optim_cfg.WEIGHT_DECAY)),
            optax.inject_hyperparams(optax.sgd)(
                learning_rate=lr_fn, momentum=float(optim_cfg.MOMENTUM)))
        return optax.chain(clip, opt)
    raise NotImplementedError(name)
