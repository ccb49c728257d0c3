"""Training/eval runtime: jitted SPMD train step, epoch loop, eval harness.

Parity targets: ``tools/train.py`` + ``tools/train_utils/train_utils.py``
(epoch loop, per-iter LR stepping, grad-clip, checkpoint ring buffer,
auto-resume) and ``tools/eval_utils/eval_utils.py`` (batched inference,
recall accumulation, det-annos generation, dataset.evaluation). The DDP
machinery disappears: one jit over a data mesh; XLA inserts the gradient
reductions.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models.dense_heads.iassd_head import iassd_head_loss
from ..models.detectors.detector3d import generate_recall_record, post_processing
from ..parallel.mesh import make_mesh, replicate, shard_batch
from .checkpoint import CheckpointManager
from .optimization import build_optimizer

# Host-only keys never shipped to device (strings / python metadata); every
# other numeric array in the collated batch goes through shard_batch, so all
# model families (point, voxel/pillar incl. sparse-conv plan tables, image)
# train through the same Trainer.
HOST_BATCH_KEYS = ('frame_id', 'metadata', 'calib', 'image_shape',
                   'use_lead_xyz', 'batch_size')


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def device_batch(batch):
    out = {}
    for k, v in batch.items():
        if k in HOST_BATCH_KEYS:
            continue
        if isinstance(v, (np.ndarray, jnp.ndarray)) and (
                np.issubdtype(v.dtype, np.number)
                or np.issubdtype(v.dtype, np.bool_)):
            out[k] = v
    return out


def make_loss_fn(model_cfg, num_class) -> Callable:
    """Pure IASSD-family loss fn(batch_out) -> (loss, tb) built from static
    config. Kept for direct use in tests; the Trainer dispatches to the
    detector's own ``.loss`` method instead, so every family in the zoo
    (anchor, center, two-stage, point) trains through the same CLI."""
    from ..utils.box_coder import build_box_coder
    head_cfg = model_cfg.POINT_HEAD
    coder = build_box_coder(head_cfg.TARGET_CONFIG.BOX_CODER,
                            **dict(head_cfg.TARGET_CONFIG.BOX_CODER_CONFIG))
    loss_cfg = head_cfg.LOSS_CONFIG
    sa_list = loss_cfg.get('SAMPLE_METHOD_LIST', None)
    if sa_list is None:
        sa_list = model_cfg.BACKBONE_3D.SA_CONFIG.SAMPLE_METHOD_LIST
    sa_cness = head_cfg.NAME != 'MLT_SSD_Head'

    def loss_fn(out):
        return iassd_head_loss(out['head_ret'], loss_cfg, num_class, coder,
                               sa_centerness_mask=sa_cness,
                               sample_method_list=sa_list)
    return loss_fn


def make_train_step(model, tx, preprocess=None, loss_fn=None):
    """``preprocess(batch, rng) -> batch`` runs inside the jitted step (e.g.
    the SPSNet stability hook: frozen stds inference + point deletion).

    The loss comes from the detector's own ``.loss(batch_out)`` method
    (every detector defines one), matching the reference where each detector
    assembles its own loss (``detectors/*.py get_training_loss``); pass
    ``loss_fn(out)`` to override."""
    def train_step(state: TrainState, batch):
        if preprocess is not None:
            rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
            batch = preprocess(batch, rng)

        # per-step rng streams: RoI target sampling (two-stage heads'
        # make_rng('roi_sampling')) and DP_RATIO dropout — without these
        # every two-stage family crashes in the CLI train path
        step_rngs = {
            'roi_sampling': jax.random.fold_in(jax.random.PRNGKey(17),
                                               state.step),
            'dropout': jax.random.fold_in(jax.random.PRNGKey(23),
                                          state.step),
        }

        def compute(params):
            variables = {'params': params, 'batch_stats': state.batch_stats}
            out, mut = model.apply(
                variables, batch, train=True, mutable=['batch_stats'],
                rngs=step_rngs)
            if loss_fn is not None:
                loss, tb = loss_fn(out)
            else:
                loss, tb = model.apply(variables, out, method='loss')
            return loss, (tb, mut['batch_stats'])

        (loss, (tb, new_bs)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_bs,
                               opt_state=new_opt, step=state.step + 1)
        metrics = {'loss': loss}
        metrics.update(tb)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model, post_cfg, preprocess=None, class_names=None):
    def eval_step(params, batch_stats, batch):
        if preprocess is not None:
            batch = preprocess(batch, jax.random.PRNGKey(0))
        out = model.apply({'params': params, 'batch_stats': batch_stats},
                          batch, train=False)
        dets = post_processing(out, post_cfg, class_names=class_names)
        return dets, out['batch_box_preds']

    return jax.jit(eval_step)


def make_stability_preprocess(hook_cfg, logger=None):
    """Build the frozen-generator preprocess fn from MODEL.STABILITY_HOOK.

    Loads a trained GenerateCenter checkpoint when ``CKPT`` is set; otherwise
    initializes randomly (useful for smoke tests — a warning is logged since
    random stds make the delete hook arbitrary).
    """
    import numpy as np
    from ..config import StaticConfig
    from ..stability.hook import apply_stability_hook
    from ..stability.model import GenerateCenter

    gen = GenerateCenter(model_cfg=StaticConfig(hook_cfg.MODEL))
    ckpt_path = hook_cfg.get('CKPT', None)
    if ckpt_path:
        from ..stability.hook import load_generator_checkpoint
        gen_vars = load_generator_checkpoint(ckpt_path)
        if logger:
            logger.info('stability hook: restored frozen generator from %s',
                        ckpt_path)
    else:
        if logger:
            logger.warning('STABILITY_HOOK.CKPT unset: random generator init')
        rngs = {'params': jax.random.PRNGKey(0),
                'latent': jax.random.PRNGKey(1)}
        n = int(hook_cfg.MODEL.SA_CONFIG.NPOINT_LIST[0][0])
        dummy = {'points': jnp.zeros((1, n, 4), jnp.float32)}
        gen_vars = gen.init(rngs, dummy, train=False)
    gen_vars = jax.lax.stop_gradient(gen_vars)
    delete_number = int(hook_cfg.get('DELETE_NUMBER', 500))
    method = str(hook_cfg.get('DELETE_METHOD', 'stability'))

    def preprocess(batch, rng):
        return apply_stability_hook(gen.apply, gen_vars, batch, rng,
                                    delete_number=delete_number, method=method)

    return preprocess


class Trainer:
    def __init__(self, cfg, model, output_dir, logger=None,
                 total_iters_each_epoch=None, mesh=None):
        self.cfg = cfg
        self.model = model
        self.logger = logger
        self.output_dir = Path(output_dir)
        self.ckpt = CheckpointManager(
            self.output_dir / 'ckpt',
            max_to_keep=int(cfg.OPTIMIZATION.get('MAX_CKPT_SAVE_NUM', 20)))
        self.mesh = mesh or make_mesh()
        self.total_epochs = int(cfg.OPTIMIZATION.NUM_EPOCHS)
        self.total_iters_each_epoch = total_iters_each_epoch
        self.tx = build_optimizer(cfg.OPTIMIZATION, total_iters_each_epoch,
                                  self.total_epochs)
        preprocess = None
        if cfg.MODEL.get('STABILITY_HOOK', None) is not None:
            preprocess = make_stability_preprocess(
                cfg.MODEL.STABILITY_HOOK, logger=logger)
        self.preprocess = preprocess
        self.train_step = make_train_step(model, self.tx,
                                          preprocess=preprocess)
        self.eval_step = make_eval_step(model, cfg.MODEL.POST_PROCESSING,
                                        preprocess=preprocess,
                                        class_names=list(
                                            cfg.get('CLASS_NAMES', [])))

    def init_state(self, example_batch, seed=42):
        db = device_batch(example_batch)
        db = {k: jnp.asarray(v) for k, v in db.items()}
        if self.preprocess is not None:
            db = self.preprocess(db, jax.random.PRNGKey(0))
        variables = jax.jit(self.model.init, static_argnames='train')(
            jax.random.PRNGKey(seed), db, train=False)
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})
        opt_state = self.tx.init(params)
        state = TrainState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state, step=jnp.zeros((), jnp.int32))
        rep = replicate(self.mesh)
        return jax.device_put(state, rep)

    def maybe_resume(self, state):
        restored, step = self.ckpt.restore(jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
            if hasattr(x, 'dtype') else x, state))
        if restored is None:
            return state, 0
        if self.logger:
            self.logger.info('auto-resumed from epoch %d', step)
        return jax.device_put(restored, replicate(self.mesh)), step

    def train(self, train_loader, sampler=None, start_epoch=0, state=None,
              log_every=50):
        assert state is not None, 'call init_state first'
        import signal
        from .metrics import AverageMeter, MetricsLogger
        mlog = MetricsLogger(self.output_dir / 'metrics')
        data_timer, batch_timer = AverageMeter(), AverageMeter()
        global_step = int(start_epoch) * (self.total_iters_each_epoch or 0)

        # Preemption handling: SIGTERM/SIGUSR1 — what preemptible TPU pods
        # and SLURM send before eviction — requests a graceful stop; the loop
        # exits cleanly at the next step boundary WITHOUT writing a
        # checkpoint (checkpoints are epoch-granular; mid-epoch state is
        # never saved). Auto-resume restarts the interrupted epoch from the
        # previous epoch's checkpoint, or from initialization if none
        # completed.
        preempt = {'hit': False}

        def _on_preempt(signum, frame):
            preempt['hit'] = True

        saved_handlers = []
        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                saved_handlers.append((sig, signal.signal(sig, _on_preempt)))
            except (ValueError, OSError):
                pass   # not the main thread (e.g. under a test harness)

        def _log_preempt(epoch):
            # Never write MID-epoch state: checkpoint step k means "k epochs
            # completed" (saved at epoch end below), and resume semantics are
            # epoch-granular. The previous epoch's checkpoint (or init, for a
            # fresh run preempted in epoch 0) is the correct resume point.
            have = epoch in set(self.ckpt.all_steps())
            if self.logger:
                self.logger.info(
                    'preemption signal during epoch %d: exiting cleanly '
                    '(resume %s)', epoch,
                    f'redoes epoch {epoch} from checkpoint {epoch}' if have
                    else 'restarts from initialization — no completed epoch')

        try:
            for epoch in range(start_epoch, self.total_epochs):
                if sampler is not None:
                    sampler.set_epoch(epoch)
                t0 = time.time()
                n_iter = 0
                t_iter = time.time()
                for batch in train_loader:
                    data_timer.update(time.time() - t_iter)
                    db = shard_batch(device_batch(batch), self.mesh)
                    state, metrics = self.train_step(state, db)
                    n_iter += 1
                    global_step += 1
                    batch_timer.update(time.time() - t_iter)
                    t_iter = time.time()
                    if preempt['hit']:
                        _log_preempt(epoch)
                        mlog.close()
                        return state
                    if n_iter % log_every == 0:
                        scalars = {k: float(v) for k, v in metrics.items()}
                        scalars['time/data_avg'] = data_timer.avg
                        scalars['time/batch_avg'] = batch_timer.avg
                        mlog.log_scalars(global_step, scalars, prefix='train/')
                        if self.logger:
                            self.logger.info(
                                'epoch %d iter %d loss %.4f (%.2f it/s)',
                                epoch, n_iter, scalars['loss'],
                                n_iter / (time.time() - t0))
                if jax.process_index() == 0:
                    self.ckpt.save(epoch + 1, jax.device_get(state))
                if self.logger:
                    self.logger.info('epoch %d done in %.1fs', epoch,
                                     time.time() - t0)
        finally:
            for sig, handler in saved_handlers:
                signal.signal(sig, handler)
        mlog.close()
        return state

    @staticmethod
    def _dedup_by_frame_id(det_annos):
        """Drop sampler-padding duplicates, keeping first occurrence (the
        loader pads partial tails and wrap-around shards by repeating
        frames; dataset.evaluation is positional over unique frames)."""
        seen = set()
        out = []
        for a in det_annos:
            fid = str(a.get('frame_id'))
            if fid in seen:
                continue
            seen.add(fid)
            out.append(a)
        return out

    @staticmethod
    def _finalize_recall(det_annos):
        """Sum the per-frame '_recall' counts attached during the eval loop
        (after cross-process merge + frame-id dedup, so recall describes
        exactly the detection set the mAP is computed on), stripping the
        key before the annos reach dataset.evaluation."""
        recall_dict = {}
        for anno in det_annos:
            for k, v in anno.pop('_recall', {}).items():
                recall_dict[k] = recall_dict.get(k, 0) + v
        return recall_dict

    def _merge_results_multiprocess(self, det_annos):
        """Cross-process det-annos merge via the shared filesystem (parity:
        ``common_utils.merge_results_dist:201-222``): each process dumps its
        shard, process 0 interleaves them back into dataset order. Returns
        None on non-zero processes."""
        import pickle

        if jax.process_count() == 1:
            return det_annos
        from jax.experimental import multihost_utils
        tmpdir = self.output_dir / 'eval_tmp'
        tmpdir.mkdir(parents=True, exist_ok=True)
        with open(tmpdir / f'part_{jax.process_index()}.pkl', 'wb') as f:
            pickle.dump(det_annos, f)
        multihost_utils.sync_global_devices('eval_merge_write')
        if jax.process_index() != 0:
            return None
        parts = []
        for i in range(jax.process_count()):
            with open(tmpdir / f'part_{i}.pkl', 'rb') as f:
                parts.append(pickle.load(f))
        # ShardedSampler hands shard i the indices i, i+P, i+2P, ...:
        # round-robin interleave restores sequential dataset order
        merged = []
        for group in zip(*parts):
            merged.extend(group)
        longest = max(len(p) for p in parts)
        for k in range(min(len(p) for p in parts), longest):
            for p in parts:
                if k < len(p):
                    merged.append(p[k])
        return merged

    def evaluate(self, dataset, eval_loader, state, class_names,
                 save_to_file=False, result_dir=None):
        """Full-dataset eval: inference -> det annos -> dataset.evaluation
        (parity: ``eval_utils.eval_one_epoch``). Multi-process runs merge
        det annos across processes and return (None, '', {}) on non-zero
        processes."""
        det_annos = []
        thresh_list = list(self.cfg.MODEL.POST_PROCESSING.RECALL_THRESH_LIST)
        t0 = time.time()
        n_frames = 0
        from ..models.detectors.detector3d import generate_recall_record_batch
        for batch in eval_loader:
            db = shard_batch(device_batch(batch), self.mesh)
            dets, _ = self.eval_step(state.params, state.batch_stats, db)
            rec = None
            if 'gt_boxes' in batch:
                # per-frame counts, attached to each anno below so that the
                # cross-process merge + frame-id dedup covers recall exactly
                # like it covers AP (padded duplicate frames count once,
                # and the reported recall describes the same global
                # detection set as the mAP next to it)
                rec = jax.device_get(generate_recall_record_batch(
                    dets['boxes'], dets['count'], db['gt_boxes'],
                    thresh_list=tuple(thresh_list), per_frame=True))
            dets = jax.device_get(dets)
            B = dets['boxes'].shape[0]
            n_frames += B
            pred_dicts = []
            for b in range(B):
                cnt = int(dets['count'][b])
                pred_dicts.append({
                    'pred_boxes': dets['boxes'][b, :cnt],
                    'pred_scores': dets['scores'][b, :cnt],
                    'pred_labels': dets['labels'][b, :cnt],
                })
            annos = dataset.generate_prediction_dicts(
                batch, pred_dicts, class_names,
                output_path=result_dir if save_to_file else None)
            if rec is not None:
                for b, anno in enumerate(annos):
                    anno['_recall'] = {k: int(v[b]) for k, v in rec.items()}
            det_annos.extend(annos)
        sec_per_example = (time.time() - t0) / max(n_frames, 1)
        if self.logger:
            self.logger.info('eval: %.4f sec/example', sec_per_example)
        det_annos = self._merge_results_multiprocess(det_annos)
        if det_annos is None:
            return None, '', {}
        det_annos = self._dedup_by_frame_id(det_annos)
        recall_dict = self._finalize_recall(det_annos)
        result_str, result_dict = dataset.evaluation(det_annos, class_names)
        gt = max(recall_dict.pop('gt', 0), 1)
        for k, v in recall_dict.items():
            result_dict[f'recall/{k}'] = v / gt
        result_dict['sec_per_example'] = sec_per_example
        return det_annos, result_str, result_dict
