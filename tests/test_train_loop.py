"""Integration: few-step training on synthetic frames over the virtual
8-device CPU mesh (exercises batch sharding + implicit grad reduction), plus
checkpoint save/restore."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.config import EDict
from spsnet_tpu.models import build_detector
from spsnet_tpu.parallel.mesh import make_mesh
from spsnet_tpu.runtime.trainer import Trainer, device_batch
from spsnet_tpu.zoo import tiny_iassd_cfg, tiny_optimization_cfg
from tests.test_model_iassd import synthetic_batch


def full_cfg():
    return EDict({
        'CLASS_NAMES': ['Car', 'Pedestrian', 'Cyclist'],
        'MODEL': tiny_iassd_cfg(),
        'OPTIMIZATION': tiny_optimization_cfg(),
    })


class FakeLoader:
    def __init__(self, n_batches, batch_size):
        self.rng = np.random.default_rng(0)
        self.n = n_batches
        self.bs = batch_size

    def __iter__(self):
        for _ in range(self.n):
            yield {k: np.asarray(v) for k, v in
                   synthetic_batch(self.rng, B=self.bs, N=256, T=5).items()}

    def __len__(self):
        return self.n


@pytest.mark.slow
def test_train_steps_and_checkpoint(tmp_path):
    assert jax.device_count() == 8
    cfg = full_cfg()
    model = build_detector(cfg.MODEL, num_class=3)
    mesh = make_mesh()
    trainer = Trainer(cfg, model, tmp_path, total_iters_each_epoch=3,
                      mesh=mesh)
    loader = FakeLoader(3, 8)
    example = next(iter(loader))
    state = trainer.init_state(example)

    losses = []
    for batch in loader:
        from spsnet_tpu.parallel.mesh import shard_batch
        db = shard_batch(device_batch(batch), mesh)
        state, metrics = trainer.train_step(state, db)
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3

    # checkpoint roundtrip
    trainer.ckpt.save(1, jax.device_get(state))
    state2, step = trainer.maybe_resume(trainer.init_state(example))
    assert step == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state2.params)[0]), atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize('family', ['pointpillar', 'centerpoint'])
def test_trainer_anchor_and_center_families(tmp_path, family):
    """The Trainer must train non-point-family configs through the detector's
    own loss (regression for round-1 advisor finding: Trainer hardwired the
    IASSD point-head loss)."""
    from spsnet_tpu.parallel.mesh import shard_batch
    from spsnet_tpu.zoo import tiny_centerpoint_cfg, tiny_pointpillar_cfg
    from tests.test_pointpillar import PCR, VOXEL, make_batch

    model_cfg = (tiny_pointpillar_cfg() if family == 'pointpillar'
                 else tiny_centerpoint_cfg())
    cfg = EDict({'CLASS_NAMES': ['Car', 'Pedestrian', 'Cyclist'],
                 'MODEL': model_cfg,
                 'OPTIMIZATION': tiny_optimization_cfg()})
    model = build_detector(cfg.MODEL, num_class=3, voxel_size=tuple(VOXEL),
                           point_cloud_range=tuple(PCR))
    mesh = make_mesh()
    trainer = Trainer(cfg, model, tmp_path, total_iters_each_epoch=2,
                      mesh=mesh)
    rng = np.random.default_rng(0)
    batch = {k: np.asarray(v) for k, v in make_batch(rng, B=8).items()}
    state = trainer.init_state(batch)
    db = shard_batch(device_batch(batch), mesh)
    for _ in range(2):
        state, metrics = trainer.train_step(state, db)
    assert np.isfinite(float(metrics['loss']))
    assert int(state.step) == 2


def test_recall_dedup_and_finalize():
    """Recall counts ride each anno through merge+dedup: loader-padding
    duplicate frames contribute once, and the '_recall' key is stripped
    before annos reach dataset.evaluation."""
    annos = [
        {'frame_id': '000000', '_recall': {'gt': 3, 'roi_0.5': 2}},
        {'frame_id': '000001', '_recall': {'gt': 1, 'roi_0.5': 1}},
        {'frame_id': '000001', '_recall': {'gt': 1, 'roi_0.5': 1}},  # pad dup
    ]
    deduped = Trainer._dedup_by_frame_id(annos)
    assert [a['frame_id'] for a in deduped] == ['000000', '000001']
    rec = Trainer._finalize_recall(deduped)
    assert rec == {'gt': 4, 'roi_0.5': 3}
    assert all('_recall' not in a for a in deduped)


@pytest.mark.slow
def test_preemption_signal_checkpoints_and_resumes(tmp_path):
    """SIGUSR1 mid-epoch -> train() exits cleanly at the next step boundary
    WITHOUT writing mid-epoch state (checkpoint step k strictly means "k
    epochs completed" — advisor r2); a fresh run preempted in epoch 0 resumes
    from initialization."""
    import os
    import signal

    cfg = full_cfg()
    cfg.OPTIMIZATION.NUM_EPOCHS = 50   # would run long without the signal
    model = build_detector(cfg.MODEL, num_class=3)
    mesh = make_mesh()
    trainer = Trainer(cfg, model, tmp_path, total_iters_each_epoch=4,
                      mesh=mesh)

    class SignalingLoader(FakeLoader):
        """Raises the preemption signal after the 2nd batch of epoch 0."""
        def __init__(self):
            super().__init__(4, 8)
            self.count = 0

        def __iter__(self):
            for batch in super().__iter__():
                self.count += 1
                if self.count == 2:
                    os.kill(os.getpid(), signal.SIGUSR1)
                yield batch

    loader = SignalingLoader()
    state = trainer.init_state(next(iter(FakeLoader(1, 8))))
    state = trainer.train(loader, state=state)
    # stopped after the signal was handled, not after 50 epochs
    assert loader.count <= 3
    assert int(state.step) == loader.count

    # no mid-epoch checkpoint was written: a fresh run preempted during
    # epoch 0 resumes from initialization, keeping step-k == k-epochs-done
    assert trainer.ckpt.latest_step() is None
    # resume from scratch: one full epoch completes and saves checkpoint 1
    trainer2 = Trainer(cfg, model, tmp_path, total_iters_each_epoch=4,
                       mesh=mesh)
    trainer2.total_epochs = 1
    out = trainer2.train(FakeLoader(2, 8), state=trainer.init_state(
        next(iter(FakeLoader(1, 8)))), start_epoch=0)
    assert trainer2.ckpt.latest_step() == 1


def test_trainer_two_stage_family(tmp_path):
    """The Trainer's jitted train step must supply the 'roi_sampling' and
    'dropout' rng streams — every two-stage RoI head calls
    make_rng('roi_sampling') in its proposal-target branch (regression:
    make_train_step applied the model with NO rngs, crashing all five
    two-stage families in the CLI train path)."""
    from spsnet_tpu.parallel.mesh import shard_batch
    from spsnet_tpu.zoo import tiny_pointrcnn_cfg

    model_cfg = tiny_pointrcnn_cfg()
    model_cfg.ROI_HEAD.DP_RATIO = 0.3        # exercise dropout too
    cfg = EDict({'CLASS_NAMES': ['Car', 'Pedestrian', 'Cyclist'],
                 'MODEL': model_cfg,
                 'OPTIMIZATION': tiny_optimization_cfg()})
    model = build_detector(cfg.MODEL, num_class=3)
    mesh = make_mesh()
    trainer = Trainer(cfg, model, tmp_path, total_iters_each_epoch=2,
                      mesh=mesh)
    rng = np.random.default_rng(0)
    B, N = 8, 256
    pts = np.zeros((B, N, 4), np.float32)
    pts[..., 0] = rng.uniform(1, 30, (B, N))
    pts[..., 1] = rng.uniform(-20, 20, (B, N))
    pts[..., 2] = rng.uniform(-2, 1, (B, N))
    gt = np.zeros((B, 3, 8), np.float32)
    gt[..., 0] = rng.uniform(5, 25, (B, 3))
    gt[..., 1] = rng.uniform(-15, 15, (B, 3))
    gt[..., 2] = -1.0
    gt[..., 3:6] = [3.9, 1.6, 1.56]
    gt[..., 7] = 1
    batch = {'points': pts, 'gt_boxes': gt}
    state = trainer.init_state(batch)
    db = shard_batch(device_batch(batch), mesh)
    for _ in range(2):
        state, metrics = trainer.train_step(state, db)
    assert np.isfinite(float(metrics['loss']))
    assert int(state.step) == 2
