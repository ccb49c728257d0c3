"""SPSNet stability injection hook: frozen stds inference + point deletion.

Rebuild of ``PAGNet_encoding`` (``backbones_2d/map_to_bev/PAGNet_encoding.py``)
as a first-class jitted pipeline stage instead of a MAP_TO_BEV hack. The
reference deletes exactly ``delete_number`` (hardcoded 500) points per frame:

- if fg_count > 500: the 500 LOWEST-stds foreground points are deleted
  (``topk(stds, fg-500)`` KEEPS the highest-stds fg, ``PAGNet_encoding.py:55``);
- else: ALL foreground plus random background to reach 500 deletions
  (``:62-64``).

Both branches leave N-500 points — a fixed shape, which we exploit: one
vectorized sort per frame replaces the per-frame python loop. Semantics are
replicated as-is (including the surprising keep-most-unstable direction — it
is what the shipped code does; the config knob ``DELETE_METHOD: random``
matches the reference's alternative).

The config inconsistency noted in SURVEY.md §2.7 (SPSNet.yaml disables
``add_fake_sem_label`` but the hook requires ``fake_labels``) is resolved by
construction: our SPSNet config keeps the processor enabled.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e9


def load_generator_checkpoint(ckpt_path):
    """Restore frozen GenerateCenter variables from a checkpoint produced by
    ``tools/train_stability.py`` (a ``CheckpointManager`` tree: numeric step
    dirs each holding ``default/`` with ``{'state': TrainState}``). Accepts
    the manager root (picks the newest step), a step dir, or a raw
    StandardCheckpointer item dir; returns ``{'params', 'batch_stats'}``.
    """
    from pathlib import Path

    import orbax.checkpoint as ocp

    p = Path(ckpt_path).resolve()
    if p.is_dir():
        steps = [int(c.name) for c in p.iterdir()
                 if c.is_dir() and c.name.isdigit()]
        if steps:
            p = p / str(max(steps))
        if (p / 'default').is_dir():
            p = p / 'default'
    raw = ocp.StandardCheckpointer().restore(p)
    state = raw.get('state', raw) if isinstance(raw, dict) else raw
    if not isinstance(state, dict) or 'params' not in state:
        raise ValueError(
            f'unrecognized stability checkpoint layout at {ckpt_path}: '
            f'top-level keys {list(state) if isinstance(state, dict) else state}')
    gen_vars = {'params': state['params']}
    if state.get('batch_stats'):
        gen_vars['batch_stats'] = state['batch_stats']
    return gen_vars


@functools.partial(jax.jit, static_argnames=('delete_number', 'method'))
def stability_delete_points(points, stds, fake_labels, rng,
                            delete_number: int = 500,
                            method: str = 'stability'):
    """
    Args:
        points: (B, N, C); stds: (B, N); fake_labels: (B, N) int (0 = bg);
        rng: PRNGKey for the random-bg fallback / random method.
    Returns:
        new_points: (B, N - delete_number, C);
        keep_idx: (B, N - delete_number) indices into N.
    """
    B, N, _ = points.shape
    fg = fake_labels > 0

    if method == 'stability':
        # Deletion priority = ascending key; fg keys are stds (delete the
        # most-stable fg first), bg keys are BIG + uniform noise so that when
        # fg < delete_number, random bg points fill the remaining deletions.
        noise = jax.random.uniform(rng, (B, N))
        key = jnp.where(fg, stds, _BIG + noise)
    elif method == 'random':
        noise = jax.random.uniform(rng, (B, N))
        key = jnp.where(fg, noise, _BIG + noise)
    else:
        raise NotImplementedError(method)

    order = jnp.argsort(key, axis=-1)
    keep_idx = order[:, delete_number:]
    new_points = jnp.take_along_axis(points, keep_idx[..., None], axis=1)
    return new_points, keep_idx


def apply_stability_hook(generator_apply, generator_vars, batch, rng,
                         delete_number: int = 500, method: str = 'stability'):
    """Run the frozen stability model and the delete stage; returns an updated
    batch with 'points' (B, N-delete, C) and 'stds' gathered to the kept set.
    """
    ret = generator_apply(generator_vars, batch, train=False)
    stds = ret['stds']
    if 'fake_labels' in batch:
        fake_labels = batch['fake_labels']
    elif 'gt_boxes' in batch:
        # data pipelines produce fake_labels host-side (add_fake_sem_label);
        # for raw batches (bench/smoke/serving glue) derive the fg mask
        # on-device from the boxes — the same first-containing-box rule
        from .. import ops
        box_idx = ops.points_in_boxes(batch['points'][..., :3],
                                      batch['gt_boxes'][..., :7])
        fake_labels = jnp.where(
            box_idx >= 0,
            jnp.take_along_axis(
                batch['gt_boxes'][..., -1].astype(jnp.int32),
                jnp.maximum(box_idx, 0), axis=1), 0)
    else:
        raise KeyError(
            'stability hook needs fake_labels or gt_boxes in the batch')
    new_points, keep_idx = stability_delete_points(
        batch['points'], stds, fake_labels, rng,
        delete_number=delete_number, method=method)
    out = dict(batch)
    out['points'] = new_points
    out['stds'] = jnp.take_along_axis(stds, keep_idx, axis=1)
    if 'fake_labels' in out:
        out['fake_labels'] = jnp.take_along_axis(
            batch['fake_labels'], keep_idx, axis=1)
    if 'sem_labels' in batch:
        out['sem_labels'] = jnp.take_along_axis(
            batch['sem_labels'], keep_idx, axis=1)
    return out


def save_vis_points(batch, ret, output_dir, frame_id='frame0', b=0,
                    gt_boxes=None, topk=4096):
    """Dump the stability model's visualization artifacts for frame ``b`` —
    a working equivalent of the reference's dead-code debug dumper
    (``stability_generate/model.py:510-542``, invocation commented out at
    :585): four whitespace txt point lists loadable by any viewer.

    - ``points.txt``        raw xyz + fake_label (0 when absent)
    - ``heat_map.txt``      sampled xyz + stds (the stability heatmap)
    - ``instance_map.txt``  sampled fg points + stds (needs ``gt_boxes``)
    - ``centain_points.txt`` the ``topk`` most-stable (lowest-stds) samples
    """
    import os

    import numpy as np

    out = os.path.join(str(output_dir), str(frame_id))
    os.makedirs(out, exist_ok=True)
    pts = np.asarray(batch['points'][b])
    fake = np.asarray(batch['fake_labels'][b]) if 'fake_labels' in batch \
        else np.zeros(len(pts), np.int32)
    np.savetxt(os.path.join(out, 'points.txt'),
               np.concatenate([pts[:, :3], fake[:, None]], axis=-1))

    xyz = np.asarray(ret['layer_xyz'][b])
    stds = np.asarray(ret['stds'][b])
    heat = np.concatenate([xyz, stds[:, None]], axis=-1)
    np.savetxt(os.path.join(out, 'heat_map.txt'), heat)

    if gt_boxes is not None:
        from .model import assign_stability_targets
        fg_mask, _ = assign_stability_targets(
            ret['layer_xyz'][b:b + 1], gt_boxes[b:b + 1])
        np.savetxt(os.path.join(out, 'instance_map.txt'),
                   heat[np.asarray(fg_mask[0])])

    order = np.argsort(stds)[:min(topk, len(stds))]
    np.savetxt(os.path.join(out, 'centain_points.txt'), heat[order])
    return out
