"""Composed whole-model forward parity for the FLAGSHIP SPSNet config vs the
reference's own torch modules (``PAGNet_backbone.py:102-237`` ->
``pointnet2_modules.py:248-460`` incl. the ``sss_aware`` stds samplers ->
``MLT_SSD_head.py:788-840``), run side-by-side on the SAME weights, the SAME
synthetic frame and the SAME per-point stds.

This is the paper-contribution path: stds threading through every SA call,
sss_aware = topk(cls_score * (1 - sigmoid(stds/8 - 3))), the 60-d surface
DGCNN gathered along the sampling chain and concatenated into the vote
layer, and the MLT head decode. The stability CVAE that PRODUCES stds is
parity-tested separately (test_reference_loss_parity / test_stability);
here stds are injected directly, exactly like the reference backbone
consumes ``batch_dict['stds']``.

The reference's CUDA wrappers are monkeypatched with the numpy spec twins
our jax ops are op-level parity-tested against. The reference's SF_extract
is rebound to its OWN ``static_graph_forward``: the shipped
``dynamic_graph`` default passes the 24-d feature tensor to the 3-d CUDA
ball query (``surface_feature.py:178-181``) — a memory-layout bug this
rebuild deliberately does not replicate (documented in
``spsnet_tpu/models/surface_feature.py``). Everything else runs as shipped.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from spsnet_tpu.config import EDict, cfg_from_yaml_file
from spsnet_tpu.models import build_detector
from spsnet_tpu.utils import checkpoint_import as ci
from spsnet_tpu.zoo import scale_sa_config
from tests.test_reference_forward_parity import _patch_reference_cuda_ops


def _parity_cfg():
    cfg = EDict()
    cfg_from_yaml_file('/root/repo/tools/cfgs/kitti_models/SPSNet.yaml', cfg)
    cfg.MODEL.pop('STABILITY_HOOK', None)   # stds injected directly
    scale_sa_config(cfg.MODEL, 4)
    return cfg


@pytest.mark.slow
def test_spsnet_forward_parity_vs_reference():
    from tests.reference_loader import build_reference_iassd
    from spsnet_tpu.utils.synthetic import synthetic_scan_batch

    cfg = _parity_cfg()
    torch.manual_seed(0)   # decouple ref init from prior tests' rng use
    ref_model = build_reference_iassd(cfg.MODEL)
    _patch_reference_cuda_ops()
    # run the reference surface stack in its well-defined static-xyz mode
    sf = ref_model.backbone_3d.SF_extract
    sf.forward = sf.static_graph_forward
    ref_model.eval()

    N = 4096
    pts = synthetic_scan_batch(seed=5, batch_size=1,
                               n_points=N).astype(np.float32)
    rng = np.random.default_rng(9)
    stds = rng.uniform(8.0, 40.0, size=(1, N)).astype(np.float32)

    pts5 = np.concatenate([np.zeros((N, 1), np.float32), pts[0]], axis=1)
    bd = {'batch_size': 1, 'points': torch.from_numpy(pts5),
          'stds': torch.from_numpy(stds.copy())}
    with torch.no_grad():
        for module in ref_model.module_list:
            bd = module(bd)

    ref_centers = bd['centers'].numpy()[:, 1:4]
    ref_cls = bd['batch_cls_preds'].numpy()
    ref_box = bd['batch_box_preds'].numpy()

    params, stats, unmapped = ci.convert_reference_state_dict(
        ref_model.state_dict())
    assert not unmapped, unmapped

    model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES))
    jbatch = {'points': jnp.asarray(pts), 'stds': jnp.asarray(stds)}
    variables = jax.jit(model.init, static_argnames='train')(
        jax.random.PRNGKey(0), jbatch, train=False)
    merged = ci.merge_into_variables(variables, params, stats,
                                     strict_shapes=True)
    out = model.apply(merged, jbatch, train=False)

    our_centers = np.asarray(out['centers'])[0]
    our_cls = np.asarray(out['batch_cls_preds'])[0]
    our_box = np.asarray(out['batch_box_preds'])[0]

    assert our_centers.shape == ref_centers.shape
    assert our_box.shape == ref_box.shape

    # identical D-FPS / sss_aware picks (stds threading), surface gathers,
    # then vote-layer offsets on concat(features, surface)
    np.testing.assert_allclose(our_centers, ref_centers, atol=2e-4,
                               err_msg='stds/surface sampling chain diverged')
    np.testing.assert_allclose(our_cls, ref_cls, atol=2e-3)
    np.testing.assert_allclose(our_box[:, :6], ref_box[:, :6], atol=2e-3)
    ang = np.abs(((our_box[:, 6] - ref_box[:, 6]) + np.pi) %
                 (2 * np.pi) - np.pi)
    assert ang.max() < 2e-3, f'heading delta {ang.max()}'
