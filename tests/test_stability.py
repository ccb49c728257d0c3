"""SPSNet stability subsystem: CVAE model forward/loss + delete-hook parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.config import EDict, StaticConfig
from spsnet_tpu.stability.hook import stability_delete_points
from spsnet_tpu.stability.model import GenerateCenter, generate_center_loss
from tests.test_model_iassd import synthetic_batch


def tiny_stability_cfg():
    return StaticConfig({
        'SF_FEATURE_DIM': 32, 'LATENT_DIM': 4,
        'SA_CONFIG': {
            'NPOINT_LIST': [[256]],
            'SAMPLE_RANGE_LIST': [[-1]],
            'SAMPLE_METHOD_LIST': [['D-FPS']],
            'RADIUS_LIST': [[0.2, 0.8]],
            'NSAMPLE_LIST': [[4, 8]],
            'MLPS': [[[8, 8, 16], [8, 8, 16]]],
            'LAYER_TYPE': ['SA_Layer'],
            'DILATED_GROUP': [False],
            'AGGREGATION_MLPS': [[32]],
            'CONFIDENCE_MLPS': [[]],
            'LAYER_INPUT': [0],
            'CTR_INDEX': [-1],
        },
        'GENERATOR': {'LATENT_DIM': 4, 'PW_FEATURE_DIM': 32},
    })


def test_generate_center_train_and_eval():
    cfg = tiny_stability_cfg()
    model = GenerateCenter(model_cfg=cfg)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, B=2, N=256)
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'latent': jax.random.PRNGKey(1)},
        batch, train=True)

    # eval: stds per point, positive
    ret = model.apply(variables, batch, train=False)
    stds = np.asarray(ret['stds'])
    assert stds.shape == (2, 256)
    assert (stds > 0).all()

    # train: loss finite + differentiable
    def loss_fn(params):
        r, _ = model.apply({'params': params, **{k: v for k, v in
                                                 variables.items()
                                                 if k != 'params'}},
                           batch, train=True, mutable=['batch_stats'],
                           rngs={'latent': jax.random.PRNGKey(2)})
        loss, tb = generate_center_loss(params, r, batch['gt_boxes'])
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def _reference_delete(points, stds, fake_labels, delete_number=500):
    """Scalar reimplementation of PAGNet_encoding.forward's delete loop."""
    out = []
    for b in range(points.shape[0]):
        fg_mask = fake_labels[b] > 0
        fg = points[b][fg_mask]
        bg = points[b][~fg_mask]
        n_fg = fg_mask.sum()
        if n_fg > delete_number:
            order = np.argsort(-stds[b][fg_mask], kind='stable')
            keep = order[:n_fg - delete_number]
            out.append(np.concatenate([bg, fg[keep]]))
        else:
            out.append(bg[:len(bg) + n_fg - delete_number])
    return out


def test_delete_hook_keeps_fixed_shape_and_matches_selection():
    rng = np.random.default_rng(0)
    B, N = 2, 2000
    points = rng.uniform(-10, 10, size=(B, N, 4)).astype(np.float32)
    stds = rng.uniform(0, 30, size=(B, N)).astype(np.float32)
    fake = np.zeros((B, N), dtype=np.int32)
    fake[0, :800] = 1    # fg > 500: delete 500 lowest-stds fg
    fake[1, :100] = 2    # fg < 500: delete all fg + 400 random bg

    new_points, keep_idx = stability_delete_points(
        jnp.asarray(points), jnp.asarray(stds), jnp.asarray(fake),
        jax.random.PRNGKey(0), delete_number=500)
    new_points = np.asarray(new_points)
    keep_idx = np.asarray(keep_idx)
    assert new_points.shape == (B, N - 500, 4)

    # frame 0: kept fg must be exactly the 300 highest-stds fg points
    kept0 = set(keep_idx[0])
    fg_idx = np.arange(800)
    top_fg = set(fg_idx[np.argsort(-stds[0, :800])][:300])
    kept_fg = kept0 & set(fg_idx.tolist())
    assert kept_fg == top_fg
    # all bg kept
    assert set(range(800, N)) <= kept0

    # frame 1: no fg survives; 1500 of 1900 bg kept
    kept1 = set(keep_idx[1])
    assert not (kept1 & set(range(100)))
    assert len(kept1) == N - 500


def test_generate_center_v3_surface_variant():
    """model_V3: DenseEdgeConv surface features concatenated into
    soc_feature (USE_SURFACE)."""
    import numpy as np
    cfg_d = {
        'SF_FEATURE_DIM': 32, 'LATENT_DIM': 4, 'USE_SURFACE': True,
        'SA_CONFIG': {
            'NPOINT_LIST': [[64]],
            'SAMPLE_RANGE_LIST': [[-1]],
            'SAMPLE_METHOD_LIST': [['D-FPS']],
            'RADIUS_LIST': [[0.2, 0.8]],
            'NSAMPLE_LIST': [[4, 8]],
            'MLPS': [[[8, 8, 16], [8, 8, 16]]],
            'LAYER_TYPE': ['SA_Layer'],
            'DILATED_GROUP': [False],
            'AGGREGATION_MLPS': [[32]],
            'CONFIDENCE_MLPS': [[]],
            'LAYER_INPUT': [0],
            'CTR_INDEX': [-1],
        },
        'GENERATOR': {'LATENT_DIM': 4, 'PW_FEATURE_DIM': 32},
    }
    model = GenerateCenter(model_cfg=StaticConfig(cfg_d))
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-3, 3, (2, 128, 4)).astype(np.float32))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'latent': jax.random.PRNGKey(1)},
                           {'points': pts}, train=True)
    # surface extractor params exist and the forward is finite
    assert 'sf_extract' in variables['params']
    ret, _ = model.apply(variables, {'points': pts}, train=True,
                         mutable=['batch_stats'],
                         rngs={'latent': jax.random.PRNGKey(2)})
    assert ret['soc_feature'].shape[-1] == 32 + 60
    assert np.isfinite(np.asarray(ret['center_pred'])).all()


def test_hook_derives_fake_labels_from_gt_boxes():
    """apply_stability_hook without host-side fake_labels: the fg mask is
    derived on-device from gt_boxes (first-containing-box rule), so raw
    batches (bench/serving glue) can use the hook."""
    import jax
    import jax.numpy as jnp

    from spsnet_tpu.stability.hook import stability_delete_points
    from spsnet_tpu import ops

    rng = np.random.default_rng(0)
    B, N = 2, 256
    pts = rng.uniform(-10, 10, (B, N, 4)).astype(np.float32)
    gt = np.zeros((B, 3, 8), np.float32)
    gt[:, 0] = [0, 0, 0, 4, 4, 4, 0, 1]            # box at origin, class 1
    gt[:, 1] = [6, 6, 0, 3, 3, 3, 0.5, 2]
    box_idx = np.asarray(ops.points_in_boxes(
        jnp.asarray(pts[..., :3]), jnp.asarray(gt[..., :7])))
    derived = np.where(box_idx >= 0,
                       np.take_along_axis(gt[..., -1].astype(np.int32),
                                          np.maximum(box_idx, 0), axis=1), 0)
    assert (derived > 0).any()

    # hook path end-to-end: stds low inside boxes -> fg deleted first
    stds = jnp.asarray(rng.uniform(0, 1, (B, N)).astype(np.float32))
    newp, keep = stability_delete_points(
        jnp.asarray(pts), stds, jnp.asarray(derived), jax.random.PRNGKey(0),
        delete_number=32)
    kept_labels = np.take_along_axis(derived, np.asarray(keep), axis=1)
    n_fg = (derived > 0).sum(axis=1)
    for b in range(B):
        expect_kept_fg = max(0, int(n_fg[b]) - 32)
        assert (kept_labels[b] > 0).sum() == expect_kept_fg
