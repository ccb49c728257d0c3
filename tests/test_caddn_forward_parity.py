"""Composed CaDDN frustum-chain parity vs the REFERENCE's own modules.

The camera-specific math is where CaDDN lives: depth-bin softmax frustum
volume (``ffn/depth_ffn.py:70-93``), voxel->lidar->camera->image frustum
grid (``f2v/frustum_grid_generator.py:30-146``), and the trilinear
grid-sample (``f2v/sampler.py``, torch ``F.grid_sample`` with its DEFAULT
``align_corners=False``). Everything downstream (Conv2DCollapse ->
BaseBEVBackbone -> AnchorHeadSingle) is parity-covered by the PointPillar
composed test — so this test composes the reference's real FrustumToVoxel +
DepthFFN.create_frustum_features on identical synthetic DDN outputs and
asserts our jnp chain reproduces the voxel features.

kornia (absent here) is shimmed with faithful reimplementations of the
three tiny 0.5.x-era functions the reference calls — create_meshgrid3d,
transform_points, convert_points_to/from_homogeneous. The shim is NOT the
function under test: a wrong shim would shift the reference grid's axes
and FAIL against our independently-derived direct geometry, so agreement
cross-validates both. create_meshgrid3d's layout is pinned by the
reference's own usage: ``grid_size=(X,Y,Z)`` unpacks to ``depth, width,
height`` and the result is permuted ``(0,1,3,2,4)`` with the comment
"XZY-> XYZ" (frustum_grid_generator.py:47-54), which forces value
``(d, w, h)`` at index ``[0, d, h, w]`` for the V_G unprojection to be
sane — i.e. torch.meshgrid([zs, xs, ys]) stacked then permuted, exactly
kornia 0.5's implementation.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from reference_loader import (REFERENCE_ROOT, _stub,  # noqa: E402
                              load_reference_pcdet)


def _stub_model_packages():
    """Bare-``__path__`` stubs so the leaf f2v/ffn modules import without
    executing the zoo ``__init__`` chains (the established
    reference_loader pattern — those chains pull spconv/CUDA exts)."""
    for pkg in ('pcdet.models',
                'pcdet.models.model_utils',
                'pcdet.models.backbones_3d',
                'pcdet.models.backbones_3d.vfe',
                'pcdet.models.backbones_3d.vfe.image_vfe_modules',
                'pcdet.models.backbones_3d.vfe.image_vfe_modules.f2v',
                'pcdet.models.backbones_3d.vfe.image_vfe_modules.ffn'):
        mod = _stub(pkg)
        if not hasattr(mod, '__path__'):
            mod.__path__ = [REFERENCE_ROOT + '/' + pkg.replace('.', '/')]


def _install_fake_kornia():
    if 'kornia' in sys.modules:
        return

    def convert_points_to_homogeneous(points):
        return torch.cat([points, torch.ones_like(points[..., :1])], dim=-1)

    def convert_points_from_homogeneous(points, eps=1e-8):
        z = points[..., -1:]
        mask = torch.abs(z) > eps
        scale = torch.where(mask, 1.0 / (z + eps), torch.ones_like(z))
        return scale * points[..., :-1]

    def create_meshgrid3d(depth, height, width,
                          normalized_coordinates=True, device=None,
                          dtype=None):
        zs = torch.arange(depth, dtype=dtype or torch.float32)
        xs = torch.arange(width, dtype=dtype or torch.float32)
        ys = torch.arange(height, dtype=dtype or torch.float32)
        if normalized_coordinates:
            zs = zs / (depth - 1) * 2 - 1
            xs = xs / (width - 1) * 2 - 1
            ys = ys / (height - 1) * 2 - 1
        g = torch.stack(torch.meshgrid(zs, xs, ys), dim=-1)  # (D, W, H, 3)
        return g.permute(0, 2, 1, 3).unsqueeze(0)            # (1, D, H, W, 3)

    def transform_points(trans_01, points_1):
        # kornia reshapes both to (B', N, D) and repeat-interleaves the
        # transform; for a per-batch-constant transform (the reference's
        # (B,1,1,4,4)) this equals plain per-batch broadcasting
        ph = convert_points_to_homogeneous(points_1)
        shape = ph.shape
        ph2 = ph.reshape(shape[0], -1, shape[-1])
        t = trans_01.reshape(trans_01.shape[0], shape[-1], shape[-1])
        p0 = torch.bmm(ph2, t.permute(0, 2, 1)).reshape(shape)
        return convert_points_from_homogeneous(p0)

    def normalize(data, mean, std):
        return (data - mean[None, :, None, None]) / std[None, :, None, None]

    k = types.ModuleType('kornia')
    for name, mod_attrs in {
        'kornia.utils': {},
        'kornia.utils.grid': {'create_meshgrid3d': create_meshgrid3d},
        'kornia.geometry': {},
        'kornia.geometry.linalg': {'transform_points': transform_points},
        'kornia.geometry.conversions': {
            'convert_points_to_homogeneous': convert_points_to_homogeneous,
            'convert_points_from_homogeneous':
                convert_points_from_homogeneous},
        'kornia.enhance': {},
        'kornia.enhance.normalize': {'normalize': normalize},
    }.items():
        m = types.ModuleType(name)
        for a, v in mod_attrs.items():
            setattr(m, a, v)
        sys.modules[name] = m
    sys.modules['kornia'] = k


# geometry: forward-looking KITTI-style rig scaled to a tiny image
PCR = [2.0, -4.0, -2.0, 10.0, 4.0, 2.0]
GRID = (8, 8, 4)                       # (X, Y, Z)
IMG_H, IMG_W = 32, 48
DS = 4                                 # feature stride
D_BINS = 8
DISC = {'mode': 'LID', 'num_bins': D_BINS, 'depth_min': 2.0,
        'depth_max': 10.0}


def _calib(B):
    # lidar (x fwd, y left, z up) -> cam (x right, y down, z fwd)
    l2c = np.zeros((B, 4, 4), np.float32)
    l2c[:, 0, 1] = -1.0
    l2c[:, 1, 2] = -1.0
    l2c[:, 2, 0] = 1.0
    l2c[:, 3, 3] = 1.0
    l2c[:, 0, 3] = 0.05                 # small extrinsic offsets
    l2c[:, 1, 3] = -0.08
    c2i = np.zeros((B, 3, 4), np.float32)
    c2i[:, 0, 0] = 20.0                 # fx
    c2i[:, 1, 1] = 20.0                 # fy
    c2i[:, 0, 2] = IMG_W / 2
    c2i[:, 1, 2] = IMG_H / 2
    c2i[:, 2, 2] = 1.0                  # homogeneous depth row [0, 0, 1, 0]
    c2i[:, 0, 3] = 1.5                  # stereo-baseline-style tx
    return l2c, c2i


def test_caddn_frustum_chain_parity():
    _install_fake_kornia()
    load_reference_pcdet()
    _stub_model_packages()
    from pcdet.models.backbones_3d.vfe.image_vfe_modules.f2v.frustum_to_voxel import (  # noqa: E501
        FrustumToVoxel)
    from pcdet.models.backbones_3d.vfe.image_vfe_modules.ffn.depth_ffn import (
        DepthFFN)

    import jax.numpy as jnp
    from spsnet_tpu.config import EDict
    from spsnet_tpu.models.vfe.image_vfe import (make_frustum_grid,
                                                 trilinear_sample)

    rng = np.random.default_rng(0)
    B, C = 2, 6
    Hf, Wf = IMG_H // DS, IMG_W // DS
    feats = rng.normal(size=(B, Hf, Wf, C)).astype(np.float32)
    logits = rng.normal(size=(B, Hf, Wf, D_BINS + 1)).astype(np.float32)
    l2c, c2i = _calib(B)

    # ---- reference: real create_frustum_features + FrustumToVoxel ----
    f2v = FrustumToVoxel(
        model_cfg=EDict({'SAMPLER': {'mode': 'bilinear',
                                     'padding_mode': 'zeros'}}),
        grid_size=np.asarray(GRID), pc_range=np.asarray(PCR, np.float32),
        disc_cfg=dict(DISC))
    # create_frustum_features reads no state — call the real method unbound
    frustum_t = DepthFFN.create_frustum_features(
        None,
        image_features=torch.from_numpy(feats).permute(0, 3, 1, 2),
        depth_logits=torch.from_numpy(logits).permute(0, 3, 1, 2))
    batch_t = {'frustum_features': frustum_t,
               'trans_lidar_to_cam': torch.from_numpy(l2c),
               'trans_cam_to_img': torch.from_numpy(c2i),
               'image_shape': torch.tensor([[IMG_H, IMG_W]] * B)}
    with torch.no_grad():
        ref_vox = f2v(batch_t)['voxel_features']     # (B, C, Z, Y, X)
    ref_vox = ref_vox.permute(0, 4, 3, 2, 1).numpy()  # -> (B, X, Y, Z, C)

    # ---- ours: same math in jnp ----
    grid = make_frustum_grid(GRID, PCR, dict(DISC), D_BINS,
                             jnp.asarray(l2c), jnp.asarray(c2i),
                             [IMG_H, IMG_W])

    probs = np.asarray(jnp.take(
        np.asarray(torch.softmax(torch.from_numpy(logits), dim=-1)),
        jnp.arange(D_BINS), axis=-1))
    # (B, Hf, Wf, D) x (B, Hf, Wf, C) -> (B, D, Hf, Wf, C)
    frustum = jnp.transpose(
        jnp.asarray(probs)[..., None] * jnp.asarray(feats)[..., None, :],
        (0, 3, 1, 2, 4))
    ours = np.asarray(trilinear_sample(frustum, grid))   # (B, X, Y, Z, C)

    assert ours.shape == ref_vox.shape
    # the sampled voxel features are bounded (softmax-weighted features);
    # compare absolutely at float32 math-accumulation scale
    scale = np.abs(ref_vox).max()
    delta = np.abs(ours - ref_vox).max()
    assert delta <= 2e-4 * max(scale, 1.0), (delta, scale)
    # the volume must be non-trivially occupied for the assert to mean much
    assert (np.abs(ref_vox) > 1e-3).mean() > 0.05
