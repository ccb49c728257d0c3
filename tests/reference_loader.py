"""Import the reference's pure-Python/torch modules from /root/reference for
direct numerical-parity testing (VERDICT r1 item 5).

The reference is CUDA-era code: we stub its unavailable deps (SharedArray,
scipy, numba, compiled CUDA extensions) and no-op ``.cuda()`` so the pure
math — box coders, losses, anchor generator, geometry utils — runs on torch
CPU. Only modules whose math has no compiled dependency are loaded; stubs
never stand in for a function under test.
"""
from __future__ import annotations

import sys
import types

REFERENCE_ROOT = '/root/reference'


def _stub(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def load_reference_pcdet():
    """Make ``import pcdet`` resolve to the reference checkout (CPU-safe).

    Returns the ``pcdet`` package. Idempotent.
    """
    if 'pcdet' in sys.modules:
        return sys.modules['pcdet']

    import torch
    # the reference tensors are created with .cuda(); keep them on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self  # noqa: E731
    torch.nn.Module.cuda = lambda self, *a, **k: self  # noqa: E731
    # the reference pins numpy<=1.19.2 (requirements.txt) and uses the
    # long-removed np.int alias (base_bev_backbone.py:60)
    import numpy as _np
    if not hasattr(_np, 'int'):
        _np.int = int

    # Stub only deps that are genuinely absent: sys.modules entries are
    # process-global, and a raising fake for an INSTALLED package (scipy is
    # real here, and spsnet_tpu's pyramid augs / gt_dataset use
    # scipy.spatial.Delaunay) breaks every later test in the session.
    def _stub_if_missing(name, **attrs):
        try:
            __import__(name)
            return sys.modules[name]
        except ImportError:
            return _stub(name, **attrs)

    _stub_if_missing('SharedArray')

    def _identity_jit(*args, **kwargs):
        # handles both ``@numba.jit`` (bare: args = (func,)) and
        # ``@numba.jit(nopython=True, ...)`` (factory) so the decorated
        # reference functions run as plain Python
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]
        return lambda f: f

    numba_mod = _stub_if_missing('numba', jit=_identity_jit,
                                 njit=_identity_jit, float32='float32')
    cuda_mod = _stub_if_missing('numba.cuda', jit=_identity_jit)
    if not hasattr(numba_mod, 'cuda'):
        numba_mod.cuda = cuda_mod

    class _FakeDelaunay:  # box_utils.in_hull dependency; not under test
        def __init__(self, *a, **k):
            raise RuntimeError('scipy.spatial.Delaunay stub')

    class _FakeConvexHull:  # loss_utils convex-hull autograd suite; unused
        def __init__(self, *a, **k):
            raise RuntimeError('scipy.spatial.ConvexHull stub')

    try:
        import scipy.spatial  # noqa: F401
    except ImportError:
        spatial = _stub('scipy.spatial', Delaunay=_FakeDelaunay,
                        ConvexHull=_FakeConvexHull)
        _stub('scipy', spatial=spatial)

    # compiled CUDA extensions: register module placeholders so
    # `from ..ops.iou3d_nms.iou3d_nms_utils import boxes_iou3d_gpu` binds
    # without executing a .so load. Anything that actually calls these in a
    # test is a bug (they raise).
    def _unavailable(*a, **k):
        raise RuntimeError('reference CUDA extension not available on CPU')

    for name in [
        'pcdet.ops.iou3d_nms.iou3d_nms_utils',
        'pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils',
        'pcdet.ops.roipoint_pool3d.roipoint_pool3d_utils',
    ]:
        _stub(name,
              boxes_iou3d_gpu=_unavailable, nms_gpu=_unavailable,
              boxes_bev_iou_cpu=_unavailable,
              points_in_boxes_gpu=_unavailable,
              points_in_boxes_cpu=_unavailable)
    # parent packages must exist with proper paths so relative imports work
    for pkg, path in [
        ('pcdet.ops', f'{REFERENCE_ROOT}/pcdet/ops'),
        ('pcdet.ops.iou3d_nms', f'{REFERENCE_ROOT}/pcdet/ops/iou3d_nms'),
        ('pcdet.ops.roiaware_pool3d',
         f'{REFERENCE_ROOT}/pcdet/ops/roiaware_pool3d'),
        ('pcdet.ops.roipoint_pool3d',
         f'{REFERENCE_ROOT}/pcdet/ops/roipoint_pool3d'),
    ]:
        mod = _stub(pkg)
        mod.__path__ = [path]

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import pcdet  # noqa: F401
    return sys.modules['pcdet']


# Reference packages whose REAL __init__ defines the __all__ build registry
# Detector3DTemplate dispatches on. Parity tests that import leaf modules
# (e.g. CaDDN's frustum tests) may have replaced any of these with a bare
# __path__ stub — detector building must repair them first.
_REGISTRY_PKGS = (
    'pcdet.models.backbones_3d.vfe',
    'pcdet.models.backbones_3d.pfe',
    'pcdet.models.backbones_3d',
    'pcdet.models.backbones_2d.map_to_bev',
    'pcdet.models.backbones_2d',
    'pcdet.models.dense_heads',
    'pcdet.models.roi_heads',
)


def _repair_registry_stubs():
    """Re-import any registry package a previous test left as a bare
    ``__path__`` stub (no ``__all__``), so detector building is
    order-independent across the suite. Children are dropped before
    parents so a parent's ``from .sub import X`` never resolves against a
    stale stub."""
    import importlib
    broken = [p for p in _REGISTRY_PKGS
              if p in sys.modules and not hasattr(sys.modules[p], '__all__')]
    for p in broken:
        del sys.modules[p]
    for p in broken:
        if p not in sys.modules:          # parent import may have pulled it
            importlib.import_module(p)


def build_reference_iassd(model_cfg, class_names=('Car', 'Pedestrian',
                                                  'Cyclist')):
    """Instantiate the reference's OWN IASSD torch model (CPU, random init)
    so checkpoint-importer tests consume the actual state-dict layout, not a
    synthetic approximation (round-1 verdict item 9).

    The detector registry __init__ chains pull spconv/kornia/CUDA exts, so
    parent packages are stubbed with real __path__ and only the needed
    submodules load for real.
    """
    load_reference_pcdet()
    _stub('pcdet.ops.pointnet2.pointnet2_batch.pointnet2_batch_cuda')
    _stub('pcdet.ops.pointnet2.pointnet2_stack.pointnet2_stack_cuda')

    class _SparseConvolution:  # only isinstance-checked
        pass

    def _unavailable(*a, **k):
        raise RuntimeError('stub: not available on CPU')

    conv = _stub('spconv.conv', SparseConvolution=_SparseConvolution)
    _stub('spconv.pytorch', conv=conv,
          SparseSequential=_unavailable, SubMConv3d=_unavailable,
          SparseConv3d=_unavailable, SparseInverseConv3d=_unavailable,
          SparseModule=type('SparseModule', (), {}),
          SparseConvTensor=_unavailable)
    _stub('spconv', conv=conv, pytorch=sys.modules['spconv.pytorch'],
          SparseSequential=_unavailable, SubMConv3d=_unavailable,
          SparseConv3d=_unavailable, SparseInverseConv3d=_unavailable,
          SparseModule=type('SparseModule', (), {}),
          SparseConvTensor=_unavailable)
    _stub('torch_scatter', scatter_max=_unavailable, scatter_mean=_unavailable,
          scatter_add=_unavailable, scatter=_unavailable)
    _stub('kornia')
    # the stability package the reference expects at repo root under a
    # different name (SURVEY.md §2.5 naming caveat)
    _stub('surface_uncertainty')
    _stub('surface_uncertainty.model',
          Generate_center=type('Generate_center', (), {}))

    # 'pcdet.models' and '...detectors' get bare __path__ stubs so their
    # __init__ chains (which pull the full zoo incl. CUDA-only deps) never
    # execute; every other subpackage imports for real on top of the leaf
    # stubs above.
    for pkg, path in [
        ('pcdet.models', f'{REFERENCE_ROOT}/pcdet/models'),
        ('pcdet.models.detectors', f'{REFERENCE_ROOT}/pcdet/models/detectors'),
        ('pcdet.ops.pointnet2', f'{REFERENCE_ROOT}/pcdet/ops/pointnet2'),
        ('pcdet.ops.pointnet2.pointnet2_batch',
         f'{REFERENCE_ROOT}/pcdet/ops/pointnet2/pointnet2_batch'),
        ('pcdet.ops.pointnet2.pointnet2_stack',
         f'{REFERENCE_ROOT}/pcdet/ops/pointnet2/pointnet2_stack'),
    ]:
        mod = _stub(pkg)
        mod.__path__ = [path]

    import importlib

    import numpy as np

    _repair_registry_stubs()

    iassd_mod = importlib.import_module('pcdet.models.detectors.IASSD')

    names = list(class_names)

    class _FakeEncoder:
        num_point_features = 4

    class _FakeDataset:
        class_names = names
        point_feature_encoder = _FakeEncoder()
        grid_size = np.array([1408, 1600, 40])
        point_cloud_range = np.array([0, -40, -3, 70.4, 40, 1],
                                     dtype=np.float32)
        voxel_size = [0.05, 0.05, 0.1]
        depth_downsample_factor = None

    return iassd_mod.IASSD(model_cfg=model_cfg,
                           num_class=len(class_names),
                           dataset=_FakeDataset())


def _install_param_spconv():
    """Replace the raising spconv stubs with torch Modules that register
    parameters in spconv's on-disk layout — enough to instantiate the
    reference's voxel detectors on CPU and read their REAL state-dict key
    names/shapes. SUBMANIFOLD convs additionally EXECUTE (dense-conv twin
    of the kernel: scatter active features to the dense grid, cross-
    correlate, gather back at the active sites — spconv documents SubMConv3d
    as Conv3d restricted to input-active sites), so small sparse stacks like
    PartA2's conv_part/conv_rpn run for composed forward-parity tests.
    Strided/inverse convs stay state-dict-only."""
    import torch
    import torch.nn as nn

    def _triple(k):
        return tuple(k) if isinstance(k, (tuple, list)) else (k,) * 3

    class _FakeSparseConvTensor:
        def __init__(self, features, indices, spatial_shape, batch_size,
                     **kw):
            self.features = features            # (N, C)
            self.indices = indices              # (N, 1+ndim) [bs, ...]
            self.spatial_shape = list(int(s) for s in spatial_shape)
            self.batch_size = int(batch_size)

        def replace_feature(self, f):
            return _FakeSparseConvTensor(f, self.indices, self.spatial_shape,
                                         self.batch_size)

        def dense(self):
            C = self.features.shape[1]
            out = self.features.new_zeros(self.batch_size, C,
                                          *self.spatial_shape)
            idx = self.indices.long()
            out[(idx[:, 0], slice(None)) + tuple(
                idx[:, 1 + d] for d in range(len(self.spatial_shape)))] \
                = self.features
            return out

    class _FakeSparseConvBase(nn.Module):
        _executable = False

        def __init__(self, in_channels, out_channels, kernel_size,
                     stride=1, padding=0, bias=False, indice_key=None,
                     **kwargs):
            super().__init__()
            ks = _triple(kernel_size)
            # spconv 1.x on-disk layout (kz, ky, kx, Cin, Cout)
            self.weight = nn.Parameter(
                torch.randn(*ks, in_channels, out_channels) * 0.05)
            self._padding = _triple(padding)
            self._stride = _triple(stride)
            if bias:
                self.bias = nn.Parameter(torch.zeros(out_channels))

        def forward(self, inp):
            if not (self._executable
                    and isinstance(inp, _FakeSparseConvTensor)):
                raise RuntimeError('fake spconv module: state-dict only')
            w = self.weight.permute(4, 3, 0, 1, 2)       # (Cout, Cin, k...)
            y = nn.functional.conv3d(inp.dense(), w, padding=self._padding,
                                     bias=getattr(self, 'bias', None))
            idx = inp.indices.long()
            feats = y[(idx[:, 0], slice(None)) + tuple(
                idx[:, 1 + d] for d in range(3))]
            return inp.replace_feature(feats)

    class _FakeSubMConv3d(_FakeSparseConvBase):
        _executable = True

        def __init__(self, in_channels, out_channels, kernel_size, **kw):
            super().__init__(in_channels, out_channels, kernel_size, **kw)
            # submanifold output sites == input sites: boundary neighbors
            # are simply absent, i.e. SAME padding — spconv ignores the
            # declared padding for SubMConv3d
            self._padding = tuple((k - 1) // 2
                                  for k in _triple(kernel_size))

    class _FakeSparseSequential(nn.Sequential):
        def forward(self, x):
            for m in self:
                if isinstance(x, _FakeSparseConvTensor) and not isinstance(
                        m, (_FakeSparseConvBase, _FakeSparseSequential)):
                    x = x.replace_feature(m(x.features))
                else:
                    x = m(x)
            return x

    attrs = dict(SubMConv3d=_FakeSubMConv3d,
                 SparseConv3d=_FakeSparseConvBase,
                 SparseInverseConv3d=_FakeSparseConvBase,
                 SparseSequential=_FakeSparseSequential,
                 SparseModule=nn.Module,
                 SparseConvTensor=_FakeSparseConvTensor)
    for mod_name in ('spconv', 'spconv.pytorch'):
        _stub(mod_name, **attrs)


def _fake_dataset(class_names, num_point_features=4):
    import numpy as np

    class _FakeEncoder:
        pass

    _FakeEncoder.num_point_features = num_point_features

    class _FakeDataset:
        pass

    _FakeDataset.class_names = list(class_names)
    _FakeDataset.point_feature_encoder = _FakeEncoder()
    _FakeDataset.grid_size = np.array([1408, 1600, 40])
    _FakeDataset.point_cloud_range = np.array([0, -40, -3, 70.4, 40, 1],
                                              dtype=np.float32)
    _FakeDataset.voxel_size = [0.05, 0.05, 0.1]
    _FakeDataset.depth_downsample_factor = None
    return _FakeDataset()


def build_reference_detector(detector_module, detector_class, model_cfg,
                             class_names=('Car', 'Pedestrian', 'Cyclist'),
                             num_point_features=4, dataset=None,
                             upstream_topology=True):
    """Instantiate any reference detector class on CPU (random init) for
    state-dict layout tests: spconv modules are parameter-registering fakes
    (1.x weight layout), CUDA exts stay stubbed. E.g.
    ``build_reference_detector('second_net', 'SECONDNet', cfg.MODEL)``.

    ``upstream_topology``: the SPSNet fork reorders ``module_topology`` to
    run map_to_bev BEFORE backbone_3d (``detector3d_template.py:23-26``, for
    PAGNet_encoding) — which poisons every voxel backbone's input_channels
    with ``num_bev_features + 3`` (e.g. SECOND conv_input 259 instead of 4,
    ``detector3d_template.py:78``): a latent fork defect for from-scratch
    voxel training. Published zoo checkpoints were trained with upstream
    OpenPCDet's order (backbone_3d first), so layout tests default to it."""
    load_reference_pcdet()
    _stub('pcdet.ops.pointnet2.pointnet2_batch.pointnet2_batch_cuda')
    _stub('pcdet.ops.pointnet2.pointnet2_stack.pointnet2_stack_cuda')
    _install_param_spconv()

    def _unavailable(*a, **k):
        raise RuntimeError('stub: not available on CPU')

    _stub('torch_scatter', scatter_max=_unavailable,
          scatter_mean=_unavailable, scatter_add=_unavailable,
          scatter=_unavailable)
    _stub('kornia')
    _stub('surface_uncertainty')
    _stub('surface_uncertainty.model',
          Generate_center=type('Generate_center', (), {}))

    for pkg, path in [
        ('pcdet.models', f'{REFERENCE_ROOT}/pcdet/models'),
        ('pcdet.models.detectors', f'{REFERENCE_ROOT}/pcdet/models/detectors'),
        ('pcdet.ops.pointnet2', f'{REFERENCE_ROOT}/pcdet/ops/pointnet2'),
        ('pcdet.ops.pointnet2.pointnet2_batch',
         f'{REFERENCE_ROOT}/pcdet/ops/pointnet2/pointnet2_batch'),
        ('pcdet.ops.pointnet2.pointnet2_stack',
         f'{REFERENCE_ROOT}/pcdet/ops/pointnet2/pointnet2_stack'),
    ]:
        mod = _stub(pkg)
        if not hasattr(mod, '__path__'):
            mod.__path__ = [path]

    import importlib
    _repair_registry_stubs()

    det_mod = importlib.import_module(
        f'pcdet.models.detectors.{detector_module}')
    cls = getattr(det_mod, detector_class)
    if upstream_topology:
        tmpl_mod = importlib.import_module(
            'pcdet.models.detectors.detector3d_template')
        orig_build = tmpl_mod.Detector3DTemplate.build_networks

        def build_upstream(self):
            self.module_topology = [
                'vfe', 'backbone_3d', 'map_to_bev_module', 'pfe',
                'backbone_2d', 'dense_head', 'point_head', 'roi_head']
            return orig_build(self)

        tmpl_mod.Detector3DTemplate.build_networks = build_upstream
        try:
            return cls(model_cfg=model_cfg, num_class=len(class_names),
                       dataset=dataset or _fake_dataset(
                           class_names, num_point_features))
        finally:
            tmpl_mod.Detector3DTemplate.build_networks = orig_build
    return cls(model_cfg=model_cfg, num_class=len(class_names),
               dataset=dataset or _fake_dataset(
                   class_names, num_point_features))


def load_reference_kitti_eval():
    """Load the reference's KITTI evaluator (`kitti_object_eval_python/eval.py`)
    as pure Python: numba decorators are identity-stubbed (see above) and the
    numba-CUDA ``rotate_iou_gpu_eval`` is replaced by our numpy devkit clip —
    the SAME function our evaluator's fallback path uses, so an AP difference
    isolates protocol drift (matching, thresholds, difficulty, AP
    integration), not IoU arithmetic."""
    name = 'ref_kitti_eval_pkg'
    if f'{name}.eval' in sys.modules:
        return sys.modules[f'{name}.eval']
    load_reference_pcdet()
    pkg = _stub(name)
    pkg.__path__ = [f'{REFERENCE_ROOT}/pcdet/datasets/kitti/'
                    'kitti_object_eval_python']
    import importlib
    mod = importlib.import_module(f'{name}.eval')
    from spsnet_tpu.eval.rotate_iou import rotate_iou_eval
    mod.rotate_iou_gpu_eval = rotate_iou_eval
    return mod


def load_reference_file(rel_path, name):
    """Load a single reference source file as a standalone module, bypassing
    package ``__init__`` chains that pull in CUDA/spconv deps (e.g.
    ``pcdet/models/__init__`` imports the whole detector zoo)."""
    import importlib.util
    if name in sys.modules:
        return sys.modules[name]
    load_reference_pcdet()
    spec = importlib.util.spec_from_file_location(
        name, f'{REFERENCE_ROOT}/{rel_path}')
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
