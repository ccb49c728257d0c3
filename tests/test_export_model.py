"""StableHLO export (tools/export_model.py): serialize -> deserialize ->
replay matches direct apply; cross-platform lowering produces one artifact.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_export_roundtrip_matches_direct_apply(tmp_path):
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from spsnet_tpu.models import build_detector
    from spsnet_tpu.models.detectors.detector3d import post_processing
    from spsnet_tpu.zoo import tiny_iassd_cfg

    cfg = tiny_iassd_cfg()
    model = build_detector(cfg, num_class=3)
    B, N = 2, 512
    rng = np.random.default_rng(0)
    pts = np.zeros((B, N, 4), dtype=np.float32)
    pts[..., 0] = rng.uniform(0, 70, (B, N))
    pts[..., 1] = rng.uniform(-40, 40, (B, N))
    pts[..., 2] = rng.uniform(-2, 1, (B, N))
    variables = model.init(jax.random.PRNGKey(0),
                           {'points': jnp.asarray(pts)}, train=False)

    @jax.jit
    def infer(points):
        out = model.apply(variables, {'points': points}, train=False)
        dets = post_processing(out, cfg.POST_PROCESSING)
        return {k: dets[k] for k in ('boxes', 'scores', 'labels', 'count')}

    exp = jax_export.export(infer)(
        jax.ShapeDtypeStruct((B, N, 4), jnp.float32))
    blob = exp.serialize()
    assert len(blob) > 1000

    restored = jax_export.deserialize(blob)
    direct = jax.tree.map(np.asarray, infer(jnp.asarray(pts)))
    replay = jax.tree.map(np.asarray, restored.call(pts))
    assert set(direct) == set(replay)
    for k in direct:
        np.testing.assert_allclose(replay[k], direct[k], atol=1e-5,
                                   err_msg=k)


@pytest.mark.slow
def test_export_cli(tmp_path):
    import yaml
    from tests.test_predict_cli import _write_tiny_cfg
    cfg_path = _write_tiny_cfg(tmp_path)
    out = tmp_path / 'tiny.stablehlo'
    env = dict(os.environ, SPSNET_PLATFORM='cpu')
    r = subprocess.run(
        [sys.executable, 'tools/export_model.py', '--cfg_file', str(cfg_path),
         '--out', str(out), '--batch_size', '1', '--num_points', '512'],
        cwd=REPO, capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 1000
    meta = json.loads(out.with_suffix('.stablehlo.json').read_text())
    assert meta['input']['points'] == [1, 512, 4, 'float32']
    assert 'cpu' in meta['platforms']
