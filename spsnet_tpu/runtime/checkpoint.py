"""Checkpointing: orbax ring buffer + auto-resume.

Parity: ``train_utils.py:125-172`` (epoch-granular saves, oldest-GC to
``max_ckpt_save_num``, resume restores optimizer state + iteration counter)
and ``detector3d_template.py:369-419`` (pretrained partial load).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir, max_to_keep=20):
        self.ckpt_dir = Path(ckpt_dir).resolve()
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self.manager = ocp.CheckpointManager(self.ckpt_dir, options=options)

    def save(self, step: int, state: Any, extra: Optional[dict] = None):
        payload = {'state': state}
        if extra:
            payload['extra'] = extra
        self.manager.save(step, args=ocp.args.StandardSave(payload))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore({'state': state_template}))
        return restored['state'], step

    def all_steps(self):
        return self.manager.all_steps()


def load_pretrained_params(params, pretrained_params, logger=None):
    """Shape-checked partial load (parity: ``detector3d_template.py:338-388``):
    keep pretrained leaves whose path+shape match, warn on mismatch."""
    flat_new = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_pre = dict(jax.tree_util.tree_flatten_with_path(pretrained_params)[0])
    updated, skipped = 0, []
    out = {}
    for path, leaf in flat_new:
        pre = flat_pre.get(path)
        if pre is not None and np.shape(pre) == np.shape(leaf):
            out[path] = pre
            updated += 1
        else:
            out[path] = leaf
            skipped.append(jax.tree_util.keystr(path))
    if logger:
        logger.info('pretrained load: %d/%d leaves, skipped %s',
                    updated, len(flat_new), skipped[:10])
    leaves = [out[path] for path, _ in flat_new]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, leaves)
