"""Import reference (OpenPCDet/SPSNet) torch checkpoints into flax params.

Lets a user of the PyTorch reference bring their trained ``.pth`` straight
into this framework.

Families handled:

- the IA-SSD / PAGNet / SPSNet point family (below), incl. the PAGNet
  surface DGCNN (``SF_extract.transforms/convs`` -> ``sf_extract/...``);
- the voxel/pillar/anchor family — ``PillarVFE`` pfn layers,
  ``VoxelBackBone8x`` spconv stacks (all three on-disk spconv weight
  layouts: 1.x ``(kz,ky,kx,Cin,Cout)``, 2.x implicit-gemm
  ``(Cout,kz,ky,kx,Cin)``, 2.x native ``(kz,ky,kx,Cout,Cin)`` —
  disambiguated via the sibling BatchNorm channel count, the same
  adaptation the reference does in ``detector3d_template.py:338-367``),
  ``BaseBEVBackbone`` conv/deconv pyramids, ``AnchorHeadSingle`` 1x1 heads;
- the PV-RCNN two-stage additions — ``VoxelSetAbstraction`` stack-SA
  layers, ``PointHeadSimple``, ``PVRCNNHead`` roi-grid pool + FC stacks.

spconv weights flatten to this repo's host-planned sparse-conv layout: a
Dense kernel of shape ``(K*C_in, C_out)`` whose tap order is the plan's
lexicographic (kz, ky, kx) kernel enumeration
(``data/processor/sparse_plan.py KERNEL3``/``spconv_down``) — identical to
``weight.reshape(K*C_in, C_out)`` of the 1.x layout.

Point-family naming (``pointnet2_batch/pointnet2_modules.py`` +
``IASSD_head.py``):

torch name                                      -> flax path
backbone_3d.SA_modules.{i}.mlps.{s}.{3k}.weight -> backbone_3d/sa_{i}/mlp_{s}/Dense_{k}/kernel
backbone_3d.SA_modules.{i}.mlps.{s}.{3k+1}.*    -> .../BatchNorm_{k}/* (+ batch_stats)
...aggregation_layer.0/1.*                      -> .../aggregation/Dense_0, BatchNorm_0
...confidence_layers.{3k},{3k+1},last.*         -> .../confidence/SharedMLP_k + Dense_0
...SA_modules.{i}.mlp_modules.0/1.* (vote)      -> backbone_3d/vote_{i}/mlp/*
...SA_modules.{i}.ctr_reg.*                     -> backbone_3d/vote_{i}/ctr_reg/*
point_head.cls_center_layers.* / box_center_layers.* / box_iou3d_layers.*
                                                -> point_head/{cls_center,box_center,box_iou3d}/*

Weight layout conversions:
- Conv1d/Conv2d k=1 weight (out, in, 1[, 1]) -> Dense kernel (in, out);
- BN weight/bias -> scale/bias (params); running_mean/var -> mean/var
  (batch_stats).

The tensors come from ``torch.load(..., map_location='cpu')``; loading the
pickle requires the baked-in CPU torch. Unmapped keys are collected and
reported — the import REFUSES silently-partial loads unless allow_partial.
"""
from __future__ import annotations

import re

import numpy as np


class ImportError3D(RuntimeError):
    pass


def _dense_kernel(w):
    """(out, in, 1[, 1]) conv weight -> (in, out) dense kernel."""
    w = np.asarray(w, dtype=np.float32)
    while w.ndim > 2:
        assert w.shape[-1] == 1, f'non-1x1 conv weight {w.shape}'
        w = w[..., 0]
    return np.ascontiguousarray(w.T)


def _conv2d_kernel(w):
    """torch Conv2d weight (out, in, kh, kw) -> flax Conv (kh, kw, in, out)."""
    w = np.asarray(w, dtype=np.float32)
    assert w.ndim == 4, f'expected 4-D conv weight, got {w.shape}'
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _convT2d_kernel(w):
    """torch ConvTranspose2d weight (in, out, kh, kw) -> flax ConvTranspose
    kernel (kh, kw, in, out), SPATIALLY FLIPPED: torch's op is the true
    conv gradient (flipped kernel) while flax's default
    ``transpose_kernel=False`` dilates without flipping — verified
    numerically in test_checkpoint_import_zoo.py."""
    w = np.asarray(w, dtype=np.float32)
    assert w.ndim == 4, f'expected 4-D deconv weight, got {w.shape}'
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _spconv_kernel5(w, c_out):
    """Normalize a spconv 3-D conv weight (any of the three on-disk
    layouts) to (kz, ky, kx, C_in, C_out). ``c_out`` comes from the sibling
    BatchNorm and disambiguates the layout (the reference's own 1.x->2.x
    adaptation needs the model state for the same reason,
    ``detector3d_template.py:345-356``). Square-channel 1.x-vs-native
    ambiguity resolves to 1.x, the layout OpenPCDet-era checkpoints ship."""
    w = np.asarray(w, dtype=np.float32)
    if w.ndim != 5:
        raise ImportError3D(f'expected 5-D spconv weight, got {w.shape}')
    if w.shape[-1] == c_out:
        pass                                    # 1.x (kz, ky, kx, Cin, Cout)
    elif w.shape[0] == c_out:
        w = np.transpose(w, (1, 2, 3, 4, 0))    # implicit (Cout, k..., Cin)
    elif w.shape[-2] == c_out:
        w = np.transpose(w, (0, 1, 2, 4, 3))    # native (k..., Cout, Cin)
    else:
        raise ImportError3D(
            f'no spconv layout of {w.shape} has C_out={c_out}')
    return w


def _spconv_kernel(w, c_out):
    """spconv 3-D conv weight -> host-planned Dense kernel (K*C_in, C_out)."""
    w = _spconv_kernel5(w, c_out)
    K = w.shape[0] * w.shape[1] * w.shape[2]
    return np.ascontiguousarray(w.reshape(K * w.shape[3], w.shape[4]))


def _put_named_bn(put, params, stats, base, leaf, t):
    """BN leaves for an explicitly-named flax BatchNorm module (scale/bias
    live directly under ``base``)."""
    if leaf == 'weight':
        put(params, base + ['scale'], t)
    elif leaf == 'bias':
        put(params, base + ['bias'], t)
    elif leaf == 'running_mean':
        put(stats, base + ['mean'], t)
    elif leaf == 'running_var':
        put(stats, base + ['var'], t)
    elif leaf == 'num_batches_tracked':
        pass
    else:
        raise ImportError3D(leaf)


def _seq_layout(state_dict):
    """(prefix, idx) -> ('dense'|'final'|'bn', k) for every torch Sequential
    in the state dict, computed from the dict itself. Dropout-robust: k is
    the RANK of the layer among its kind within the Sequential (the
    reference's RoI-head ``make_fc_layers`` interleaves ``nn.Dropout`` after
    the first block, ``roi_head_template.py:39-40``, which shifts raw
    indices). A conv is 'final' iff it is the last conv of its Sequential
    AND carries a bias — the biased output conv of every reference fc
    builder (non-final convs are ``bias=False`` + BN)."""
    groups = {}
    for name, tensor in state_dict.items():
        m = re.match(r'(.+)\.(\d+)\.weight$', name)
        if not m:
            continue
        pre, idx = m.group(1), int(m.group(2))
        ndim = np.asarray(getattr(tensor, 'numpy', lambda: tensor)()).ndim
        groups.setdefault(pre, {}).setdefault(
            'dense' if ndim >= 2 else 'bn', []).append(idx)
    layout = {}
    for pre, kinds in groups.items():
        convs = sorted(kinds.get('dense', []))
        for k, idx in enumerate(convs):
            final = idx == convs[-1] and f'{pre}.{idx}.bias' in state_dict
            layout[(pre, idx)] = ('final', k) if final else ('dense', k)
        for k, idx in enumerate(sorted(kinds.get('bn', []))):
            layout[(pre, idx)] = ('bn', k)
    return layout


def _seq_index(layers_prefix, idx, is_final):
    """Map a torch Sequential index to (kind, k): Conv at 3k, BN at 3k+1,
    ReLU at 3k+2 (absent from state_dict); final biased conv at the end."""
    if is_final:
        return ('final', 0)
    if idx % 3 == 0:
        return ('dense', idx // 3)
    if idx % 3 == 1:
        return ('bn', idx // 3)
    raise ImportError3D(f'unexpected sequential index {idx} in {layers_prefix}')


def convert_reference_state_dict(state_dict, allow_partial=False,
                                 pfe_sa_sources=('x_conv1', 'x_conv2',
                                                 'x_conv3', 'x_conv4'),
                                 roi_pool_sources=('x_conv2', 'x_conv3',
                                                   'x_conv4')):
    """torch state_dict (name -> tensor/ndarray) -> (params, batch_stats)
    nested dicts mergeable into a flax variables tree.

    ``pfe_sa_sources``: feature-source name per ``pfe.SA_layers`` index —
    the reference registers VoxelSetAbstraction SA layers as an anonymous
    ModuleList ordered by ``FEATURES_SOURCE`` minus bev/raw_points
    (``voxel_set_abstraction.py:134-153``) while our flax modules are named
    by source (``pfe/{src}_mlp_{s}``); the order is not recoverable from the
    state dict alone. The default matches the KITTI pv_rcnn.yaml (all four
    conv levels); Waymo PV-RCNN checkpoints need ('x_conv3', 'x_conv4').

    ``roi_pool_sources``: same story for VoxelRCNN's anonymous
    ``roi_head.roi_grid_pool_layers`` ModuleList (one entry per
    ``ROI_GRID_POOL.FEATURES_SOURCE``); default matches voxel_rcnn_car.yaml.
    """
    params = {}
    stats = {}
    unmapped = []
    seq_layout = _seq_layout(state_dict)

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, dtype=np.float32)

    # detect the last (biased, final) index of each Sequential so the
    # final-conv special case is position-independent
    last_idx = {}
    for name in state_dict:
        m = re.match(r'(.*layers)\.(\d+)\.(weight|bias)$', name)
        if m:
            pre, idx = m.group(1), int(m.group(2))
            last_idx[pre] = max(last_idx.get(pre, -1), idx)

    _HEAD_MAP = {'cls_center_layers': 'cls_center',
                 'box_center_layers': 'box_center',
                 'box_iou3d_layers': 'box_iou3d'}

    for name, tensor in state_dict.items():
        t = np.asarray(getattr(tensor, 'numpy', lambda: tensor)())
        parts = name.split('.')
        try:
            if parts[0] == 'backbone_3d' and parts[1] == 'SA_modules':
                i = int(parts[2])
                rest = parts[3:]
                if rest[0] == 'mlps':
                    s, idx, leaf = int(rest[1]), int(rest[2]), rest[3]
                    kind, k = _seq_index(name, idx, False)
                    base = ['backbone_3d', f'sa_{i}', f'mlp_{s}']
                    _put_layer(put, params, stats, base, kind, k, leaf, t)
                elif rest[0] == 'aggregation_layer':
                    idx, leaf = int(rest[1]), rest[2]
                    kind, k = _seq_index(name, idx, False)
                    base = ['backbone_3d', f'sa_{i}', 'aggregation']
                    _put_layer(put, params, stats, base, kind, k, leaf, t)
                elif rest[0] == 'confidence_layers':
                    idx, leaf = int(rest[1]), rest[2]
                    pre = '.'.join(parts[:4])
                    is_final = idx == last_idx.get(pre, -1)
                    kind, k = _seq_index(name, idx, is_final)
                    base = ['backbone_3d', f'sa_{i}', 'confidence']
                    _put_head_layer(put, params, stats, base, kind, k, leaf, t)
                elif rest[0] == 'mlp_modules':
                    idx, leaf = int(rest[1]), rest[2]
                    kind, k = _seq_index(name, idx, False)
                    base = ['backbone_3d', f'vote_{i}', 'mlp']
                    _put_layer(put, params, stats, base, kind, k, leaf, t)
                elif rest[0] == 'ctr_reg':
                    leaf = rest[1]
                    base = ['backbone_3d', f'vote_{i}', 'ctr_reg']
                    if leaf == 'weight':
                        put(params, base + ['kernel'], _dense_kernel(t))
                    else:
                        put(params, base + ['bias'], t)
                else:
                    raise ImportError3D(name)
            elif parts[0] == 'backbone_3d' and parts[1] == 'SF_extract':
                # PAGNet/SPSNet surface DGCNN (surface_feature.py):
                # transforms.{i}.linear + convs.{i}.{layer_first,layers.{j},
                # layer_last}.linear -> sf_extract/{transform,conv}_{i}/...
                leaf = parts[-1]
                if parts[2] == 'transforms':
                    base = ['backbone_3d', 'sf_extract',
                            f'transform_{int(parts[3])}', 'Dense_0']
                elif parts[2] == 'convs':
                    i = int(parts[3])
                    if parts[4] == 'layers':
                        sub = f'layer_{int(parts[5]) + 1}'
                    elif parts[4] in ('layer_first', 'layer_last'):
                        sub = parts[4]
                    else:
                        raise ImportError3D(name)
                    base = ['backbone_3d', 'sf_extract', f'conv_{i}', sub,
                            'Dense_0']
                else:
                    raise ImportError3D(name)
                if leaf == 'weight':
                    put(params, base + ['kernel'], _dense_kernel(t))
                elif leaf == 'bias':
                    put(params, base + ['bias'], t)
                else:
                    raise ImportError3D(name)
            elif parts[0] == 'backbone_3d' and parts[1] == 'FP_modules':
                # PointNet2MSG feature-propagation decoder
                i, idx, leaf = int(parts[2]), int(parts[4]), parts[5]
                kind, k = seq_layout['.'.join(parts[:4]), idx]
                _put_layer(put, params, stats,
                           ['backbone_3d', f'fp_{i}', 'mlp'], kind, k,
                           leaf, t)
            elif parts[0] == 'roi_head' and parts[1] == 'SA_modules':
                # PointRCNNHead per-stage SA stacks
                i, s = int(parts[2]), int(parts[4])
                idx, leaf = int(parts[5]), parts[6]
                kind, k = seq_layout['.'.join(parts[:5]), idx]
                _put_layer(put, params, stats,
                           ['roi_head', f'sa_{i}', f'mlp_{s}'], kind, k,
                           leaf, t)
            elif parts[0] == 'roi_head' and parts[1] in (
                    'xyz_up_layer', 'merge_down_layer'):
                # no-BN SharedMLP stacks: every conv (incl. the biased
                # last) is Dense_{rank}
                idx, leaf = int(parts[2]), parts[3]
                kind, k = seq_layout['.'.join(parts[:2]), idx]
                base = ['roi_head', 'xyz_up' if parts[1] == 'xyz_up_layer'
                        else 'merge']
                _put_layer(put, params, stats, base, 'dense' if
                           kind in ('dense', 'final') else kind, k, leaf, t)
            elif parts[0] == 'point_head' and parts[1] in _HEAD_MAP:
                pre = '.'.join(parts[:2])
                idx, leaf = int(parts[2]), parts[3]
                is_final = idx == last_idx.get(pre, -1)
                kind, k = _seq_index(name, idx, is_final)
                base = ['point_head', _HEAD_MAP[parts[1]]]
                _put_head_layer(put, params, stats, base, kind, k, leaf, t)
            elif parts[0] == 'vfe' and parts[1] == 'pfn_layers':
                i, sub, leaf = int(parts[2]), parts[3], parts[4]
                base = ['vfe', f'pfn_{i}']
                if sub == 'linear':
                    if leaf == 'weight':
                        put(params, base + ['Dense_0', 'kernel'],
                            _dense_kernel(t))
                    else:
                        put(params, base + ['Dense_0', 'bias'], t)
                elif sub == 'norm':
                    _put_layer(put, params, stats, base, 'bn', 0, leaf, t)
                else:
                    raise ImportError3D(name)
            elif parts[0] == 'backbone_3d' and (
                    re.fullmatch(r'conv_up_[tm][1-4]', parts[1])
                    or re.fullmatch(r'inv_conv[2-4]', parts[1])
                    or parts[1] == 'conv5'):
                # UNetV2 UR-block decoder (spconv_unet.py:112-132):
                # conv_up_t{n} is a SparseBasicBlock (conv1/bn1/conv2/bn2);
                # conv_up_m{n} / inv_conv{n} are (conv, BN, ReLU) blocks;
                # conv5 wraps one such block in an extra Sequential. The
                # up-table slot order equals the forward kernel enumeration,
                # so SparseInverseConv3d weights flatten with _spconv_kernel
                # unchanged.
                if parts[1].startswith('conv_up_t'):
                    sub, leaf = parts[2], parts[3]
                    base = ['backbone_3d', parts[1], 'conv' + sub[-1]]
                    if sub.startswith('conv'):
                        bn_key = '.'.join(parts[:2]) + f'.bn{sub[-1]}.weight'
                        c_out = int(np.asarray(getattr(
                            state_dict[bn_key], 'numpy',
                            lambda: state_dict[bn_key])()).shape[0])
                        put(params, base + ['Dense_0', 'kernel'],
                            _spconv_kernel(t, c_out))
                    else:
                        _put_layer(put, params, stats, base, 'bn', 0, leaf, t)
                else:
                    if parts[1] == 'conv5':        # conv5.0.{idx}.{leaf}
                        idx, leaf = int(parts[3]), parts[4]
                    else:
                        idx, leaf = int(parts[2]), parts[3]
                    base = ['backbone_3d', parts[1]]
                    if idx == 0:
                        bn_key = '.'.join(name.split('.')[:-2] + ['1',
                                                                  'weight'])
                        c_out = int(np.asarray(getattr(
                            state_dict[bn_key], 'numpy',
                            lambda: state_dict[bn_key])()).shape[0])
                        put(params, base + ['Dense_0', 'kernel'],
                            _spconv_kernel(t, c_out))
                    elif idx == 1:
                        _put_layer(put, params, stats, base, 'bn', 0, leaf, t)
                    else:
                        raise ImportError3D(name)
            elif parts[0] == 'backbone_3d' and (
                    parts[1] in ('conv_input', 'conv_out')
                    or re.fullmatch(r'conv[1-4]', parts[1])):
                if parts[1] in ('conv_input', 'conv_out'):
                    flax_name, idx, leaf = parts[1], int(parts[2]), parts[3]
                else:
                    n, b = parts[1][-1], int(parts[2])
                    idx, leaf = int(parts[3]), parts[4]
                    if n == '1' and b == 0:
                        flax_name = 'conv1'
                    elif b == 0:
                        flax_name = f'conv{n}_down'
                    elif b in (1, 2):
                        flax_name = f'conv{n}_{"ab"[b - 1]}'
                    else:
                        raise ImportError3D(name)
                base = ['backbone_3d', flax_name]
                if idx == 0:                       # the spconv weight
                    bn_key = '.'.join(parts[:-2] + ['1', 'weight'])
                    if bn_key not in state_dict:
                        raise ImportError3D(f'no sibling BN for {name}')
                    c_out = int(np.asarray(getattr(
                        state_dict[bn_key], 'numpy',
                        lambda: state_dict[bn_key])()).shape[0])
                    put(params, base + ['Dense_0', 'kernel'],
                        _spconv_kernel(t, c_out))
                elif idx == 1:                     # the BN
                    _put_layer(put, params, stats, base, 'bn', 0, leaf, t)
                else:
                    raise ImportError3D(name)
            elif parts[0] == 'backbone_2d' and parts[1] == 'blocks':
                i, idx, leaf = int(parts[2]), int(parts[3]), parts[4]
                # Sequential: [ZeroPad2d, Conv, BN, ReLU, (Conv, BN, ReLU)*n]
                if idx == 1:
                    put(params, ['backbone_2d', f'block{i}_down', 'kernel'],
                        _conv2d_kernel(t))
                elif idx == 2:
                    _put_named_bn(put, params, stats,
                                  ['backbone_2d', f'block{i}_down_bn'],
                                  leaf, t)
                elif idx >= 4 and (idx - 4) % 3 == 0:
                    put(params,
                        ['backbone_2d', f'block{i}_conv{(idx - 4) // 3}',
                         'kernel'], _conv2d_kernel(t))
                elif idx >= 5 and (idx - 5) % 3 == 0:
                    _put_named_bn(put, params, stats,
                                  ['backbone_2d',
                                   f'block{i}_bn{(idx - 5) // 3}'], leaf, t)
                else:
                    raise ImportError3D(name)
            elif parts[0] == 'backbone_2d' and parts[1] == 'deblocks':
                i, idx, leaf = int(parts[2]), int(parts[3]), parts[4]
                if idx == 0:
                    # ConvTranspose2d (in, out, kh, kw) for stride >= 1;
                    # plain Conv2d (out, in, kh, kw) for fractional strides.
                    # Disambiguate via the sibling BN's C_out; square
                    # channels default to ConvTranspose (every shipped
                    # config's case).
                    bn_key = '.'.join(parts[:-2] + ['1', 'weight'])
                    c_out = int(np.asarray(getattr(
                        state_dict[bn_key], 'numpy',
                        lambda: state_dict[bn_key])()).shape[0]) \
                        if bn_key in state_dict else t.shape[1]
                    if t.shape[1] == c_out:
                        k = _convT2d_kernel(t)
                    elif t.shape[0] == c_out:
                        k = _conv2d_kernel(t)
                    else:
                        raise ImportError3D(
                            f'{name}: neither conv layout has C_out={c_out}')
                    put(params, ['backbone_2d', f'deblock{i}', 'kernel'], k)
                elif idx == 1:
                    _put_named_bn(put, params, stats,
                                  ['backbone_2d', f'deblock{i}_bn'], leaf, t)
                else:
                    raise ImportError3D(name)
            elif parts[0] == 'pfe':
                if parts[1] == 'SA_rawpoints' and parts[2] == 'mlps':
                    s, idx, leaf = int(parts[3]), int(parts[4]), parts[5]
                    kind, k = seq_layout['.'.join(parts[:4]), idx]
                    _put_layer(put, params, stats, ['pfe', f'raw_mlp_{s}'],
                               kind, k, leaf, t)
                elif parts[1] == 'SA_layers' and parts[3] == 'mlps':
                    i, s = int(parts[2]), int(parts[4])
                    idx, leaf = int(parts[5]), parts[6]
                    if i >= len(pfe_sa_sources):
                        raise ImportError3D(
                            f'{name}: SA_layers index {i} beyond '
                            f'pfe_sa_sources {pfe_sa_sources}')
                    kind, k = seq_layout['.'.join(parts[:5]), idx]
                    base = ['pfe', f'{pfe_sa_sources[i]}_mlp_{s}']
                    _put_layer(put, params, stats, base, kind, k, leaf, t)
                elif parts[1] == 'vsa_point_feature_fusion':
                    idx, leaf = int(parts[2]), parts[3]
                    kind, k = seq_layout['.'.join(parts[:2]), idx]
                    _put_layer(put, params, stats,
                               ['pfe', 'vsa_point_feature_fusion'],
                               kind, k, leaf, t)
                else:
                    raise ImportError3D(name)
            elif parts[0] == 'point_head' and parts[1] in (
                    'cls_layers', 'box_layers', 'part_reg_layers'):
                # PointHeadSimple / PointHeadBox / PointIntraPartOffsetHead
                idx, leaf = int(parts[2]), parts[3]
                kind, k = seq_layout['.'.join(parts[:2]), idx]
                _put_head_layer(put, params, stats,
                                ['point_head', parts[1]], kind, k,
                                leaf, t)
            elif parts[0] == 'roi_head':
                if parts[1] == 'roi_grid_pool_layer' and parts[2] == 'mlps':
                    s, idx, leaf = int(parts[3]), int(parts[4]), parts[5]
                    kind, k = seq_layout['.'.join(parts[:4]), idx]
                    _put_layer(put, params, stats,
                               ['roi_head', f'pool_mlp_{s}'], kind, k,
                               leaf, t)
                elif parts[1] == 'shared_fc_layer':
                    idx, leaf = int(parts[2]), parts[3]
                    kind, k = seq_layout['.'.join(parts[:2]), idx]
                    _put_layer(put, params, stats, ['roi_head', 'shared_fc'],
                               kind, k, leaf, t)
                elif parts[1] in ('conv_part', 'conv_rpn'):
                    # PartA2 submanifold stacks: SparseSequential of
                    # (SubM, BN, ReLU) blocks -> SubMConvBlock conv/bn
                    # (partA2_head.py:18-26); kernel stays 5-D (dense twin)
                    i, j, leaf = int(parts[2]), int(parts[3]), parts[4]
                    base = ['roi_head', f'{parts[1]}_{i}']
                    if j == 0:
                        bn_key = '.'.join(parts[:3]) + '.1.weight'
                        c_out = int(np.asarray(getattr(
                            state_dict[bn_key], 'numpy',
                            lambda: state_dict[bn_key])()).shape[0])
                        put(params, base + ['conv', 'kernel'],
                            _spconv_kernel5(t, c_out))
                    elif j == 1:
                        _put_named_bn(put, params, stats, base + ['bn'],
                                      leaf, t)
                    else:
                        raise ImportError3D(name)
                elif parts[1] in ('cls_layers', 'reg_layers', 'iou_layers'):
                    # iou_layers: SECONDHead's single-IoU make_fc_layers
                    # stack (second_head.py:29-31)
                    idx, leaf = int(parts[2]), parts[3]
                    kind, k = seq_layout['.'.join(parts[:2]), idx]
                    _put_head_layer(put, params, stats,
                                    ['roi_head', parts[1]], kind, k, leaf, t)
                elif parts[1] == 'roi_grid_pool_layers':
                    # VoxelRCNN NeighborVoxelSAModuleMSG: per FEATURES_SOURCE
                    # k, per scale i, three [conv, BN] pairs
                    # (voxel_pool_modules.py:35-53) -> {src}_{in,pos,out}_{i}
                    k, which = int(parts[2]), parts[3]
                    i, idx, leaf = int(parts[4]), int(parts[5]), parts[6]
                    if k >= len(roi_pool_sources):
                        raise ImportError3D(
                            f'{name}: pool layer {k} beyond '
                            f'roi_pool_sources {roi_pool_sources}')
                    sub = {'mlps_in': 'in', 'mlps_pos': 'pos',
                           'mlps_out': 'out'}[which]
                    base = ['roi_head', f'{roi_pool_sources[k]}_{sub}_{i}']
                    _put_layer(put, params, stats, base,
                               'dense' if idx == 0 else 'bn', 0, leaf, t)
                elif parts[1] in ('cls_fc_layers', 'reg_fc_layers'):
                    # VoxelRCNN splits hidden FC stack and pred layer; both
                    # land in ONE MLPHead (cls_layers/reg_layers) here
                    idx, leaf = int(parts[2]), parts[3]
                    kind, k = seq_layout['.'.join(parts[:2]), idx]
                    _put_head_layer(put, params, stats,
                                    ['roi_head', parts[1].replace('_fc', '')],
                                    kind, k, leaf, t)
                elif parts[1] in ('cls_pred_layer', 'reg_pred_layer'):
                    leaf = parts[2]
                    base = ['roi_head', parts[1].replace('_pred_layer',
                                                         '_layers')]
                    _put_head_layer(put, params, stats, base, 'final', 0,
                                    leaf, t)
                else:
                    raise ImportError3D(name)
            elif parts[0] == 'dense_head' and parts[1] in (
                    'conv_cls', 'conv_box', 'conv_dir_cls'):
                leaf = parts[2]
                if leaf == 'weight':
                    put(params, ['dense_head', parts[1], 'kernel'],
                        _conv2d_kernel(t))
                else:
                    put(params, ['dense_head', parts[1], 'bias'], t)
            elif parts[0] == 'dense_head' and parts[1] == 'shared_conv':
                # CenterHead family: Sequential [Conv2d, BN2d, ReLU]
                idx, leaf = int(parts[2]), parts[3]
                if idx == 0:
                    put(params, ['dense_head', 'shared_conv',
                                 'kernel' if leaf == 'weight' else 'bias'],
                        _conv2d_kernel(t) if leaf == 'weight' else t)
                else:
                    _put_named_bn(put, params, stats,
                                  ['dense_head', 'shared_bn'], leaf, t)
            elif parts[0] == 'dense_head' and parts[1] == 'heads_list':
                # SeparateHead (``center_head.py:10-38``): per output name a
                # Sequential of (num_conv-1) nested [Conv2d, BN2d, ReLU]
                # blocks (keys {name}.{k}.0.* / {name}.{k}.1.*) + a bare
                # final biased Conv2d ({name}.{K}.weight/bias)
                g, hname = int(parts[2]), parts[3]
                base = ['dense_head', f'head_{g}']
                if len(parts) == 6:                     # final bare conv
                    leaf = parts[5]
                    put(params, base + [f'{hname}_out',
                                        'kernel' if leaf == 'weight'
                                        else 'bias'],
                        _conv2d_kernel(t) if leaf == 'weight' else t)
                elif len(parts) == 7:
                    k, j, leaf = int(parts[4]), int(parts[5]), parts[6]
                    if j == 0:
                        put(params, base + [f'{hname}_conv{k}',
                                            'kernel' if leaf == 'weight'
                                            else 'bias'],
                            _conv2d_kernel(t) if leaf == 'weight' else t)
                    else:
                        _put_named_bn(put, params, stats,
                                      base + [f'{hname}_bn{k}'], leaf, t)
                else:
                    raise ImportError3D(name)
            elif 'num_batches_tracked' in name or parts[0] in (
                    'global_step',):
                continue
            else:
                raise ImportError3D(name)
        except (ImportError3D, ValueError, IndexError):
            unmapped.append(name)

    if unmapped and not allow_partial:
        raise ImportError3D(
            f'{len(unmapped)} unmapped checkpoint keys, e.g. '
            f'{unmapped[:5]} (pass allow_partial=True to ignore)')
    return params, stats, unmapped


def _put_layer(put, params, stats, base, kind, k, leaf, t):
    if kind == 'dense':
        if leaf == 'bias':        # no-BN stacks carry biased hidden convs
            put(params, base + [f'Dense_{k}', 'bias'], t)
        else:
            put(params, base + [f'Dense_{k}', 'kernel'], _dense_kernel(t))
    elif kind == 'bn':
        if leaf == 'weight':
            put(params, base + [f'BatchNorm_{k}', 'scale'], t)
        elif leaf == 'bias':
            put(params, base + [f'BatchNorm_{k}', 'bias'], t)
        elif leaf == 'running_mean':
            put(stats, base + [f'BatchNorm_{k}', 'mean'], t)
        elif leaf == 'running_var':
            put(stats, base + [f'BatchNorm_{k}', 'var'], t)
        elif leaf == 'num_batches_tracked':
            pass
        else:
            raise ImportError3D(leaf)
    else:
        raise ImportError3D(kind)


def _put_head_layer(put, params, stats, base, kind, k, leaf, t):
    """MLPHead layout: ONE SharedMLP_0 holding Dense_{k}/BatchNorm_{k} per
    hidden layer, then the final biased Dense_0 at the top level (matches
    blocks.MLPHead; verified against the reference's own IASSD state dict —
    multi-layer CLS_FC/REG_FC stacks land in the same SharedMLP)."""
    if kind == 'final':
        if leaf == 'weight':
            put(params, base + ['Dense_0', 'kernel'], _dense_kernel(t))
        else:
            put(params, base + ['Dense_0', 'bias'], t)
    elif kind == 'dense':
        if leaf == 'bias':        # no-BN stacks carry biased hidden convs
            put(params, base + ['SharedMLP_0', f'Dense_{k}', 'bias'], t)
        else:
            put(params, base + ['SharedMLP_0', f'Dense_{k}', 'kernel'],
                _dense_kernel(t))
    elif kind == 'bn':
        _put_layer(put, params, stats, base + ['SharedMLP_0'],
                   'bn', k, leaf, t)
    else:
        raise ImportError3D(kind)


def _tree_paths(t, pre=()):
    for k, v in t.items():
        if isinstance(v, dict):
            yield from _tree_paths(v, pre + (k,))
        else:
            yield pre + (k,), v


def merge_into_variables(variables, params, stats, strict_shapes=True):
    """Overlay imported tensors onto a model's init variables; verifies
    every imported path exists with a matching shape."""
    import jax

    var = jax.tree_util.tree_map(np.asarray, jax.device_get(
        jax.tree_util.tree_map(lambda x: x, variables)))
    var = {'params': _to_mutable(var['params']),
           **{k: _to_mutable(v) for k, v in var.items() if k != 'params'}}

    def overlay(dst, src, label):
        for path, val in _tree_paths(src):
            node = dst
            for p in path[:-1]:
                if p not in node:
                    raise ImportError3D(
                        f'{label}: path {"/".join(path)} missing in model')
                node = node[p]
            leaf = path[-1]
            if leaf not in node:
                raise ImportError3D(
                    f'{label}: leaf {"/".join(path)} missing in model')
            if strict_shapes and tuple(node[leaf].shape) != tuple(val.shape):
                raise ImportError3D(
                    f'{label}: shape mismatch at {"/".join(path)}: '
                    f'model {node[leaf].shape} vs checkpoint {val.shape}')
            node[leaf] = val.astype(node[leaf].dtype)

    overlay(var['params'], params, 'params')
    if stats:
        overlay(var.setdefault('batch_stats', {}), stats, 'batch_stats')
    return var


def _to_mutable(t):
    if isinstance(t, dict) or hasattr(t, 'items'):
        return {k: _to_mutable(v) for k, v in t.items()}
    return t


def load_reference_checkpoint(path, variables, allow_partial=False):
    """``.pth`` file -> flax variables with the reference weights merged."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    state = ckpt.get('model_state', ckpt.get('state_dict', ckpt))
    state = {k: v for k, v in state.items() if hasattr(v, 'numpy')}
    params, stats, unmapped = convert_reference_state_dict(
        state, allow_partial=allow_partial)
    return merge_into_variables(variables, params, stats), unmapped
