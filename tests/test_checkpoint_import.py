"""Reference .pth -> flax import: naming, layout, and numerical parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

from spsnet_tpu.models import build_detector
from spsnet_tpu.utils import checkpoint_import as ci
from spsnet_tpu.zoo import tiny_iassd_cfg


def _torch_state_for(params, stats):
    """Reverse-map my param tree into a reference-named torch state_dict."""
    rng = np.random.default_rng(0)
    state = {}

    def dense_w(kernel):
        w = rng.normal(size=kernel.shape[::-1]).astype(np.float32)
        return w

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + [k])
            else:
                yield_leaf(path + [k], v)

    names = []

    def yield_leaf(path, v):
        names.append(('/'.join(path), v.shape))

    walk(params, [])
    torch_names = {}
    for flat, shape in names:
        p = flat.split('/')
        if p[0] == 'backbone_3d' and p[1].startswith('sa_'):
            i = p[1][3:]
            if p[2].startswith('mlp_'):
                s = p[2][4:]
                k = int(p[3].split('_')[1])
                if p[3].startswith('Dense'):
                    torch_names[flat] = \
                        f'backbone_3d.SA_modules.{i}.mlps.{s}.{3*k}.weight'
                else:
                    leaf = {'scale': 'weight', 'bias': 'bias'}[p[4]]
                    torch_names[flat] = \
                        f'backbone_3d.SA_modules.{i}.mlps.{s}.{3*k+1}.{leaf}'
            elif p[2] == 'aggregation':
                k = int(p[3].split('_')[1])
                if p[3].startswith('Dense'):
                    torch_names[flat] = \
                        f'backbone_3d.SA_modules.{i}.aggregation_layer.{3*k}.weight'
                else:
                    leaf = {'scale': 'weight', 'bias': 'bias'}[p[4]]
                    torch_names[flat] = \
                        f'backbone_3d.SA_modules.{i}.aggregation_layer.{3*k+1}.{leaf}'
            elif p[2] == 'confidence':
                if p[3].startswith('SharedMLP'):
                    k = int(p[3].split('_')[1])
                    if p[4].startswith('Dense'):
                        torch_names[flat] = \
                            f'backbone_3d.SA_modules.{i}.confidence_layers.{3*k}.weight'
                    else:
                        leaf = {'scale': 'weight', 'bias': 'bias'}[p[5]]
                        torch_names[flat] = \
                            f'backbone_3d.SA_modules.{i}.confidence_layers.{3*k+1}.{leaf}'
                else:   # final Dense_0 (kernel/bias)
                    n_shared = 1
                    leaf = p[4] if len(p) > 4 else 'kernel'
                    tl = 'weight' if leaf == 'kernel' else 'bias'
                    torch_names[flat] = \
                        f'backbone_3d.SA_modules.{i}.confidence_layers.{3*n_shared}.{tl}'
        elif p[0] == 'backbone_3d' and p[1].startswith('vote_'):
            i = p[1][5:]
            if p[2] == 'mlp':
                k = int(p[3].split('_')[1])
                if p[3].startswith('Dense'):
                    torch_names[flat] = \
                        f'backbone_3d.SA_modules.{i}.mlp_modules.{3*k}.weight'
                else:
                    leaf = {'scale': 'weight', 'bias': 'bias'}[p[4]]
                    torch_names[flat] = \
                        f'backbone_3d.SA_modules.{i}.mlp_modules.{3*k+1}.{leaf}'
            elif p[2] == 'ctr_reg':
                tl = 'weight' if p[3] == 'kernel' else 'bias'
                torch_names[flat] = f'backbone_3d.SA_modules.{i}.ctr_reg.{tl}'
        elif p[0] == 'point_head':
            layer = {'cls_center': 'cls_center_layers',
                     'box_center': 'box_center_layers'}[p[1]]
            if p[2].startswith('SharedMLP'):
                k = int(p[2].split('_')[1])
                if p[3].startswith('Dense'):
                    torch_names[flat] = f'point_head.{layer}.{3*k}.weight'
                else:
                    leaf = {'scale': 'weight', 'bias': 'bias'}[p[4]]
                    torch_names[flat] = f'point_head.{layer}.{3*k+1}.{leaf}'
            else:
                n_shared = 1
                tl = 'weight' if p[3] == 'kernel' else 'bias'
                torch_names[flat] = f'point_head.{layer}.{3*n_shared}.{tl}'

    # build tensors with the correct TORCH layouts from my shapes
    def get(tree, flat):
        node = tree
        for p in flat.split('/'):
            node = node[p]
        return node

    for flat, tname in torch_names.items():
        arr = np.asarray(get(params, flat))
        if tname.endswith('.weight') and arr.ndim == 2:    # dense kernel
            w = rng.normal(0, 0.1, size=(arr.shape[1], arr.shape[0]))
            if 'mlps.' in tname:                           # Conv2d
                t = torch.tensor(w[..., None, None], dtype=torch.float32)
            else:                                          # Conv1d
                t = torch.tensor(w[..., None], dtype=torch.float32)
        else:
            t = torch.tensor(rng.normal(0, 0.1, size=arr.shape),
                             dtype=torch.float32)
        state[tname] = t

    # BN running stats for every BN seen
    def walk_stats(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk_stats(v, path + [k])
            else:
                flat = '/'.join(path + [k])
                base = '/'.join(path[:-1] + [path[-1]])
                # find the torch name of the matching scale param
                scale_flat = '/'.join(path) + '/scale'
                if scale_flat in torch_names:
                    tn = torch_names[scale_flat].rsplit('.', 1)[0]
                    leaf = 'running_mean' if k == 'mean' else 'running_var'
                    val = rng.uniform(0.5, 1.5, size=v.shape) if k == 'var' \
                        else rng.normal(0, 0.1, size=v.shape)
                    state[f'{tn}.{leaf}'] = torch.tensor(
                        val, dtype=torch.float32)

    walk_stats(stats, [])
    return state


@pytest.fixture(scope='module')
def imported():
    cfg = tiny_iassd_cfg()
    model = build_detector(cfg, num_class=3)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-10, 10, (1, 512, 4)).astype(np.float32))
    variables = jax.jit(model.init, static_argnames='train')(
        jax.random.PRNGKey(0), {'points': pts}, train=False)
    params = jax.device_get(variables['params'])
    stats = jax.device_get(variables['batch_stats'])
    state = _torch_state_for(params, stats)
    new_params, new_stats, unmapped = ci.convert_reference_state_dict(state)
    merged = ci.merge_into_variables(variables, new_params, new_stats)
    return model, variables, merged, state, pts


def test_all_keys_mapped(imported):
    model, variables, merged, state, pts = imported
    # every generated reference key converted without error
    _, _, unmapped = ci.convert_reference_state_dict(state)
    assert unmapped == []


def test_merged_forward_runs_and_changes_output(imported):
    model, variables, merged, state, pts = imported
    out0 = model.apply(variables, {'points': pts}, train=False)
    out1 = model.apply(merged, {'points': pts}, train=False)
    a = np.asarray(out0['batch_box_preds'])
    b = np.asarray(out1['batch_box_preds'])
    assert np.isfinite(b).all()
    assert not np.allclose(a, b)          # weights actually replaced


def test_conv_bn_numerical_parity(imported):
    """torch Conv2d(k=1,no-bias)+BN2d(eval) == imported Dense+BN exactly."""
    model, variables, merged, state, pts = imported
    import torch.nn as nn
    w = state['backbone_3d.SA_modules.0.mlps.0.0.weight']
    g = state['backbone_3d.SA_modules.0.mlps.0.1.weight']
    b = state['backbone_3d.SA_modules.0.mlps.0.1.bias']
    rm = state['backbone_3d.SA_modules.0.mlps.0.1.running_mean']
    rv = state['backbone_3d.SA_modules.0.mlps.0.1.running_var']
    cin, cout = w.shape[1], w.shape[0]
    conv = nn.Conv2d(cin, cout, 1, bias=False)
    bn = nn.BatchNorm2d(cout)
    with torch.no_grad():
        conv.weight.copy_(w)
        bn.weight.copy_(g)
        bn.bias.copy_(b)
        bn.running_mean.copy_(rm)
        bn.running_var.copy_(rv)
    bn.eval()
    x = np.random.default_rng(2).normal(size=(1, cin, 7, 5)).astype(np.float32)
    with torch.no_grad():
        want = torch.relu(bn(conv(torch.tensor(x)))).numpy()

    # my side: Dense + BN with the imported tensors (channel-last)
    p = merged['params']['backbone_3d']['sa_0']['mlp_0']
    s = merged['batch_stats']['backbone_3d']['sa_0']['mlp_0']
    xl = np.transpose(x, (0, 2, 3, 1))
    h = xl @ np.asarray(p['Dense_0']['kernel'])
    bn_s = np.asarray(p['BatchNorm_0']['scale'])
    bn_b = np.asarray(p['BatchNorm_0']['bias'])
    mean = np.asarray(s['BatchNorm_0']['mean'])
    var = np.asarray(s['BatchNorm_0']['var'])
    got = np.maximum((h - mean) / np.sqrt(var + 1e-5) * bn_s + bn_b, 0.0)
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               atol=2e-5)


def test_shape_mismatch_rejected(imported):
    model, variables, merged, state, pts = imported
    bad = dict(state)
    key = 'backbone_3d.SA_modules.0.mlps.0.0.weight'
    bad[key] = torch.zeros((99, 4, 1, 1))
    p, s, _ = ci.convert_reference_state_dict(bad)
    with pytest.raises(ci.ImportError3D, match='shape mismatch'):
        ci.merge_into_variables(variables, p, s)


def test_unmapped_key_rejected():
    with pytest.raises(ci.ImportError3D, match='unmapped'):
        ci.convert_reference_state_dict(
            {'totally.unknown.module.weight': np.zeros((4, 4))})


def test_cli_roundtrip(tmp_path, imported):
    """tools/import_checkpoint.py on a real .pth file (CLI surface)."""
    import subprocess, sys
    model, variables, merged, state, pts = imported
    pth = tmp_path / 'ref.pth'
    torch.save({'model_state': state}, str(pth))
    out_dir = tmp_path / 'imported'
    r = subprocess.run(
        [sys.executable, 'tools/import_checkpoint.py',
         '--cfg_file', 'tests/data/tiny_iassd.yaml',
         '--pth', str(pth), '--out', str(out_dir),
         '--num_points', '512'],
        capture_output=True, text=True, cwd='/root/repo',
        # SPSNET_PLATFORM pins via jax.config inside setup_jax — the axon
        # plugin IGNORES the JAX_PLATFORMS env var, so that alone would let
        # this subprocess grab (or hang on) the real TPU mid-suite
        env={**__import__('os').environ, 'JAX_PLATFORMS': 'cpu',
             'SPSNET_PLATFORM': 'cpu'})
    if r.returncode != 0:
        print(r.stdout[-2000:])
        print(r.stderr[-2000:])
    assert r.returncode == 0
    assert 'imported' in r.stdout
    assert (out_dir.exists() and any(out_dir.iterdir()))


@pytest.mark.slow
def test_import_reference_model_state_dict():
    """Round-1 verdict item 9: consume a state dict generated by the
    reference's OWN ``IASSD`` model class (full-size KITTI IA-SSD.yaml,
    random init) — the exact key names and shapes users will feed the
    importer — and merge it into our full-size model strict-shape."""
    import jax
    from tests.reference_loader import build_reference_iassd
    from spsnet_tpu.config import EDict, cfg_from_yaml_file
    from spsnet_tpu.models import build_detector

    cfg = EDict()
    cfg_from_yaml_file('/root/repo/tools/cfgs/kitti_models/IA-SSD.yaml', cfg)
    ref_model = build_reference_iassd(cfg.MODEL)
    state = ref_model.state_dict()
    assert len(state) > 200

    params, stats, report = ci.convert_reference_state_dict(state)

    model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES))
    pts = jnp.asarray(np.random.default_rng(0).uniform(
        0, 40, (1, 2048, 4)).astype(np.float32))
    variables = jax.jit(model.init, static_argnames='train')(
        jax.random.PRNGKey(0), {'points': pts}, train=False)
    merged = ci.merge_into_variables(variables, params, stats,
                                     strict_shapes=True)
    out = model.apply(merged, {'points': pts}, train=False)
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()
