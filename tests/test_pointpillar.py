"""PointPillars end-to-end: host voxelization -> VFE -> scatter -> BEV
backbone -> anchor head, forward + loss + gradients."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.config import EDict
from spsnet_tpu.data.processor.data_processor import DataProcessor
from spsnet_tpu.models import build_detector
from spsnet_tpu.zoo import tiny_pointpillar_cfg

PCR = [0, -12.8, -3, 25.6, 12.8, 1]
VOXEL = [0.4, 0.4, 4]


def make_batch(rng, B=2):
    proc = DataProcessor(
        [EDict({'NAME': 'transform_points_to_voxels',
                'VOXEL_SIZE': VOXEL,
                'MAX_POINTS_PER_VOXEL': 8,
                'MAX_NUMBER_OF_VOXELS': {'train': 512, 'test': 512}})],
        np.array(PCR, dtype=np.float32), training=True)
    frames = []
    for _ in range(B):
        pts = np.zeros((800, 4), dtype=np.float32)
        pts[:, 0] = rng.uniform(0.5, 25, 800)
        pts[:, 1] = rng.uniform(-12, 12, 800)
        pts[:, 2] = rng.uniform(-2, 0.5, 800)
        frames.append(proc.forward({'points': pts}))
    gt = np.zeros((B, 6, 8), dtype=np.float32)
    gt[:, :3, 0] = rng.uniform(3, 22, (B, 3))
    gt[:, :3, 1] = rng.uniform(-10, 10, (B, 3))
    gt[:, :3, 2] = -1.0
    gt[:, :3, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :3, 6] = rng.uniform(-np.pi, np.pi, (B, 3))
    gt[:, :3, 7] = 1
    return {
        'voxels': jnp.asarray(np.stack([f['voxels'] for f in frames])),
        'voxel_coords': jnp.asarray(np.stack([f['voxel_coords'] for f in frames])),
        'voxel_num_points': jnp.asarray(np.stack([f['voxel_num_points'] for f in frames])),
        'voxel_valid': jnp.asarray(np.stack([f['voxel_valid'] for f in frames])),
        'gt_boxes': jnp.asarray(gt),
    }


@pytest.fixture(scope='module')
def pp_setup():
    cfg = tiny_pointpillar_cfg()
    model = build_detector(cfg, num_class=3, voxel_size=tuple(VOXEL),
                           point_cloud_range=tuple(PCR))
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return cfg, model, variables, batch


def test_pointpillar_forward(pp_setup):
    cfg, model, variables, batch = pp_setup
    out = model.apply(variables, batch, train=False)
    # grid 64x64, stride 2 -> 32x32 locations x 6 anchors
    assert out['batch_box_preds'].shape == (2, 32 * 32 * 6, 7)
    assert out['batch_cls_preds'].shape == (2, 32 * 32 * 6, 3)
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()


def test_pointpillar_loss_and_grads(pp_setup):
    cfg, model, variables, batch = pp_setup
    other = {k: v for k, v in variables.items() if k != 'params'}

    def compute(params):
        out, _ = model.apply({'params': params, **other}, batch, train=True,
                             mutable=['batch_stats'])
        loss, tb = model.apply({'params': params, **other}, out,
                               method=model.loss)
        return loss

    loss, grads = jax.value_and_grad(compute)(variables['params'])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in flat)


def test_anchor_assignment_positive_on_exact_match():
    from spsnet_tpu.models.dense_heads.anchor_head import (
        assign_anchor_targets, generate_anchors)
    from spsnet_tpu.utils.box_coder import ResidualCoder
    agc = [{'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
            'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.78],
            'align_center': False, 'feature_map_stride': 2,
            'matched_threshold': 0.6, 'unmatched_threshold': 0.45}]
    anchors, cls_ids, m, u = generate_anchors(agc, (64, 64, 1), PCR, 2)
    flat = anchors.reshape(-1, 7)
    # gt exactly on one anchor
    gt = np.zeros((4, 8), dtype=np.float32)
    gt[0, :7] = flat[100]
    gt[0, 7] = 1
    A = flat.shape[0]
    ac = np.broadcast_to(cls_ids[None], (A // len(cls_ids), len(cls_ids))).reshape(-1)
    am = np.broadcast_to(m[None], (A // len(m), len(m))).reshape(-1)
    au = np.broadcast_to(u[None], (A // len(u), len(u))).reshape(-1)
    labels, reg_t, reg_w, _ = assign_anchor_targets(
        jnp.asarray(flat), jnp.asarray(ac), jnp.asarray(am), jnp.asarray(au),
        jnp.asarray(gt), ResidualCoder(), 1)
    labels = np.asarray(labels)
    assert labels[100] == 1                       # exact match is positive
    assert (labels >= -1).all()
    assert np.asarray(reg_t)[100].max() < 1e-5    # zero residual
    assert (labels == 1).sum() >= 1


def test_dynamic_pillar_vfe_matches_canvas():
    """DynamicPillarVFE's device voxelization must agree with the host
    PillarVFE + scatter path on pillar occupancy (which cells are hit)."""
    from spsnet_tpu.config import StaticConfig
    from spsnet_tpu.models.vfe import build_vfe
    rng = np.random.default_rng(3)
    N = 400
    pts = np.zeros((1, N, 4), dtype=np.float32)
    pts[0, :, 0] = rng.uniform(0.5, 25, N)
    pts[0, :, 1] = rng.uniform(-12, 12, N)
    pts[0, :, 2] = rng.uniform(-2, 0.5, N)
    cfg = EDict({'USE_NORM': True, 'WITH_DISTANCE': False,
                 'USE_ABSLOTE_XYZ': True, 'NUM_FILTERS': [16, 16]})
    vfe = build_vfe('DynamicPillarVFE', model_cfg=StaticConfig(cfg),
                    num_point_features=4,
                    voxel_size=tuple(VOXEL), point_cloud_range=tuple(PCR))
    batch = {'points': jnp.asarray(pts)}
    variables = vfe.init(jax.random.PRNGKey(0), batch, train=False)
    out = vfe.apply(variables, batch, train=False)
    canvas = np.asarray(out['spatial_features'])   # (1, ny, nx, 16)
    nx = int(round((PCR[3] - PCR[0]) / VOXEL[0]))
    ny = int(round((PCR[4] - PCR[1]) / VOXEL[1]))
    assert canvas.shape == (1, ny, nx, 16)
    # occupancy must match a numpy reference voxelization
    ix = np.floor((pts[0, :, 0] - PCR[0]) / VOXEL[0]).astype(int)
    iy = np.floor((pts[0, :, 1] - PCR[1]) / VOXEL[1]).astype(int)
    ok = (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
    occ_ref = np.zeros((ny, nx), dtype=bool)
    occ_ref[iy[ok], ix[ok]] = True
    occ = np.abs(canvas[0]).sum(-1) > 0
    # relu can zero a whole pillar's features; occupied-from-canvas must be
    # a subset of the true occupancy, and cover most of it
    assert not (occ & ~occ_ref).any()
    assert (occ & occ_ref).sum() > 0.5 * occ_ref.sum()


def test_dynamic_pillar_vfe_end2end():
    """PointPillars with DynamicPillarVFE (no host voxelization at all)."""
    cfg = tiny_pointpillar_cfg()
    cfg.VFE = EDict({'NAME': 'DynamicPillarVFE', 'USE_NORM': True,
                     'WITH_DISTANCE': False, 'USE_ABSLOTE_XYZ': True,
                     'NUM_FILTERS': [16, 16]})
    cfg.MAP_TO_BEV.NUM_BEV_FEATURES = 16
    model = build_detector(cfg, num_class=3, voxel_size=tuple(VOXEL),
                           point_cloud_range=tuple(PCR))
    rng = np.random.default_rng(1)
    batch = make_batch(rng)
    N = 600
    pts = np.zeros((2, N, 4), dtype=np.float32)
    pts[:, :, 0] = rng.uniform(0.5, 25, (2, N))
    pts[:, :, 1] = rng.uniform(-12, 12, (2, N))
    pts[:, :, 2] = rng.uniform(-2, 0.5, (2, N))
    batch = {'points': jnp.asarray(pts), 'gt_boxes': batch['gt_boxes']}
    variables = jax.jit(model.init, static_argnames='train')(
        jax.random.PRNGKey(0), batch, train=True)
    out, _ = model.apply(variables, batch, train=True,
                         mutable=['batch_stats'])
    loss, tb = model.apply(variables, out, method=model.loss)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_pointpillar_overfit(tmp_path):
    """Learning-dynamics proof for the anchor family: train tiny PointPillars
    on ONE fixed synthetic batch until it memorises it — loss must collapse
    and recall vs gt must become high. Unlike IA-SSD (whose ctr_aware
    sampling is a feedback loop, see test_kitti_end2end), anchor matching is
    purely geometric, so this family converges stably."""
    from spsnet_tpu.config import EDict as _E
    from spsnet_tpu.models.detectors.detector3d import (
        generate_recall_record_batch, post_processing)
    from spsnet_tpu.parallel.mesh import make_mesh, shard_batch
    from spsnet_tpu.runtime.trainer import Trainer, device_batch
    from spsnet_tpu.zoo import tiny_optimization_cfg

    rng = np.random.default_rng(0)
    model_cfg = tiny_pointpillar_cfg()
    opt = tiny_optimization_cfg()
    opt.NUM_EPOCHS = 300
    opt.BATCH_SIZE_PER_GPU = 8
    opt.OPTIMIZER = 'adam'
    opt.LR = 0.003
    opt.DECAY_STEP_LIST = [10000]
    cfg = _E({'CLASS_NAMES': ['Car', 'Pedestrian', 'Cyclist'],
              'MODEL': model_cfg, 'OPTIMIZATION': opt})
    model = build_detector(cfg.MODEL, num_class=3, voxel_size=tuple(VOXEL),
                           point_cloud_range=tuple(PCR))
    mesh = make_mesh()
    trainer = Trainer(cfg, model, tmp_path, total_iters_each_epoch=1,
                      mesh=mesh)
    batch = {k: np.asarray(v) for k, v in make_batch(rng, B=8).items()}
    state = trainer.init_state(batch)
    db = shard_batch(device_batch(batch), mesh)

    losses = []
    for _ in range(300):
        state, metrics = trainer.train_step(state, db)
        losses.append(float(metrics['loss']))
    start = float(np.mean(losses[:10]))
    end = float(np.mean(losses[-10:]))
    assert np.isfinite(end)
    assert end < 0.1 * start, (start, end)

    # Recall of the memorised batch through the real NMS path. The forward
    # runs in train mode (batch-stat normalisation, mutated stats discarded):
    # memorisation collapses the pre-BN activation variance ~2000x in 300
    # steps, and the running-stat EMA (momentum 0.99 == the reference's
    # torch momentum 0.01 in pillar_vfe/base_bev_backbone) genuinely lags
    # that collapse — in BOTH frameworks. Batch-stat normalisation tests the
    # detection machinery, not the EMA's settling time.
    params = {'params': state.params}
    if state.batch_stats:
        params['batch_stats'] = state.batch_stats
    out, _ = model.apply(params, {k: jnp.asarray(v) for k, v in batch.items()},
                         train=True, mutable=['batch_stats'])
    dets = post_processing(out, model_cfg.POST_PROCESSING)
    rec = jax.device_get(generate_recall_record_batch(
        dets['boxes'], dets['count'], jnp.asarray(batch['gt_boxes']),
        thresh_list=(0.3, 0.5, 0.7)))
    gt = max(int(rec['gt']), 1)
    assert rec['rcnn_0.3'] / gt >= 0.9, dict(rec)
    assert rec['rcnn_0.7'] / gt >= 0.7, dict(rec)
