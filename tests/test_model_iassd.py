"""Module-level goldens: IA-SSD forward/loss on synthetic frames (CPU, tiny)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.config import EDict
from spsnet_tpu.models import build_detector
from spsnet_tpu.models.detectors.detector3d import post_processing


from spsnet_tpu.zoo import tiny_iassd_cfg  # noqa: E402 (shared tiny config)


def synthetic_batch(rng, B=2, N=256, T=5):
    points = rng.uniform(-10, 10, size=(B, N, 4)).astype(np.float32)
    gt = np.zeros((B, T, 8), dtype=np.float32)
    for b in range(B):
        n_gt = 3
        gt[b, :n_gt, 0:2] = rng.uniform(-8, 8, size=(n_gt, 2))
        gt[b, :n_gt, 2] = rng.uniform(-1, 1, size=n_gt)
        gt[b, :n_gt, 3:6] = rng.uniform(1.0, 4.0, size=(n_gt, 3))
        gt[b, :n_gt, 6] = rng.uniform(-np.pi, np.pi, size=n_gt)
        gt[b, :n_gt, 7] = rng.integers(1, 4, size=n_gt)
        # drop some points inside the first gt box so fg exists
        points[b, :20, 0:3] = gt[b, 0, 0:3] + rng.normal(scale=0.3, size=(20, 3))
    return {'points': jnp.asarray(points), 'gt_boxes': jnp.asarray(gt)}


@pytest.fixture(scope='module')
def model_and_vars():
    cfg = tiny_iassd_cfg()
    model = build_detector(cfg, num_class=3)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return cfg, model, variables, batch


def test_forward_shapes(model_and_vars):
    cfg, model, variables, batch = model_and_vars
    out = model.apply(variables, batch, train=False)
    B = batch['points'].shape[0]
    assert out['centers'].shape == (B, 16, 3)
    assert out['centers_origin'].shape == (B, 16, 3)
    assert out['ctr_offsets'].shape == (B, 16, 3)
    assert out['batch_cls_preds'].shape == (B, 16, 3)
    assert out['batch_box_preds'].shape == (B, 16, 7)
    # vote offsets clamped to MAX_TRANSLATE_RANGE
    off = np.asarray(out['centers'] - out['centers_origin'])
    assert (np.abs(off[..., :2]) <= 3.0 + 1e-5).all()
    assert (np.abs(off[..., 2]) <= 2.0 + 1e-5).all()


def test_train_loss_finite_and_differentiable(model_and_vars):
    cfg, model, variables, batch = model_and_vars
    params = variables['params']
    other = {k: v for k, v in variables.items() if k != 'params'}

    def loss_fn(p):
        out, _ = model.apply({'params': p, **other}, batch, train=True,
                             mutable=['batch_stats'])
        loss, tb = model.apply({'params': p, **other}, out, method=model.loss)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least one nonzero gradient
    assert any(np.abs(np.asarray(g)).max() > 0 for g in flat)


def test_post_processing(model_and_vars):
    cfg, model, variables, batch = model_and_vars
    out = model.apply(variables, batch, train=False)
    dets = post_processing(out, cfg.POST_PROCESSING)
    B = batch['points'].shape[0]
    assert dets['boxes'].shape == (B, 16, 7)
    assert dets['scores'].shape == (B, 16)
    assert dets['labels'].shape == (B, 16)
    count = np.asarray(dets['count'])
    labels = np.asarray(dets['labels'])
    for b in range(B):
        assert (labels[b, :count[b]] >= 1).all()
        assert (labels[b, count[b]:] == 0).all()


def test_fps_prefix_shortcut_passthrough_producer():
    """A configured D-FPS layer whose input already fits (n <= npoint) is an
    identity pass-through: its output keeps RAW order, so the next D-FPS
    layer must NOT take the prefix-nesting shortcut (code-review r3: the
    static config flag alone fired it, silently returning the first npoint
    raw points)."""
    from spsnet_tpu.config import StaticConfig
    from spsnet_tpu.models.backbones_3d.iassd_backbone import IASSDBackbone
    from spsnet_tpu import ops

    cfg = tiny_iassd_cfg()
    sa = cfg.BACKBONE_3D.SA_CONFIG
    sa.NPOINT_LIST = [[64], [16], [8], [4], [-1], [4]]
    backbone = IASSDBackbone(model_cfg=StaticConfig(cfg.BACKBONE_3D),
                             num_class=3, input_channels=4)
    rng = np.random.default_rng(3)
    pts = rng.uniform(-10, 10, size=(2, 48, 4)).astype(np.float32)
    batch = {'points': jnp.asarray(pts)}
    out, _ = backbone.init_with_output(jax.random.PRNGKey(0), batch,
                                       train=False)

    # layer 0 pass-through (48 <= 64): encoder_xyz[1] is the raw cloud
    np.testing.assert_array_equal(np.asarray(out['encoder_xyz'][1]),
                                  pts[..., :3])
    # layer 1 must run REAL D-FPS on the raw-ordered cloud, not arange(16)
    expect = ops.gather_points(jnp.asarray(pts[..., :3]),
                               ops.farthest_point_sample(
                                   jnp.asarray(pts[..., :3]), 16))
    np.testing.assert_allclose(np.asarray(out['encoder_xyz'][2]),
                               np.asarray(expect), rtol=0, atol=0)


def test_fps_prefix_shortcut_disabled_under_chunked_fps(monkeypatch):
    """SPSNET_FPS_CHUNKS produces concatenated per-slice chains, not one
    selection-order chain — the prefix shortcut in
    ``SAModuleMSGWithSampling._sample`` must disable itself (else the
    consuming layer would keep slice 0's picks only). Tested at the module
    level with a deliberately NON-FPS-ordered input and the ordered flag
    forced on: with CHUNKS set the module must run real FPS."""
    from spsnet_tpu.models.sa_module import SAModuleMSGWithSampling
    from spsnet_tpu import ops

    rng = np.random.default_rng(4)
    xyz = jnp.asarray(rng.uniform(-10, 10, size=(2, 64, 3)).astype(
        np.float32))
    module = SAModuleMSGWithSampling(
        npoint_list=[16], sample_range_list=[-1],
        sample_type_list=['D-FPS'], radii=[], nsamples=[], mlps=[],
        num_class=3, input_fps_ordered=True)
    feats = jnp.ones((2, 64, 4), jnp.float32)

    monkeypatch.setenv('SPSNET_FPS_CHUNKS', '4')
    out, _ = module.init_with_output(jax.random.PRNGKey(0), xyz, feats,
                                     train=False)
    got = np.asarray(out[3])                            # sampled_idx
    expect = np.asarray(ops.farthest_point_sample(xyz, 16))
    np.testing.assert_array_equal(got, expect)
    assert not np.array_equal(got, np.broadcast_to(np.arange(16), (2, 16)))

    # control: without CHUNKS the forced flag takes the shortcut
    monkeypatch.delenv('SPSNET_FPS_CHUNKS')
    out2, _ = module.init_with_output(jax.random.PRNGKey(0), xyz, feats,
                                      train=False)
    np.testing.assert_array_equal(
        np.asarray(out2[3]),
        np.broadcast_to(np.arange(16, dtype=np.int32), (2, 16)))
