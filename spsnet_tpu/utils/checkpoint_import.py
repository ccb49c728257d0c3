"""Import reference (OpenPCDet/SPSNet) torch checkpoints into flax params.

Lets a user of the PyTorch reference bring their trained ``.pth`` straight
into this framework. Handles the IA-SSD / PAGNet / SPSNet point family
(``pointnet2_batch/pointnet2_modules.py`` + ``IASSD_head.py`` parameter
naming):

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


def convert_reference_state_dict(state_dict, allow_partial=False):
    """torch state_dict (name -> tensor/ndarray) -> (params, batch_stats)
    nested dicts mergeable into a flax variables tree."""
    params = {}
    stats = {}
    unmapped = []

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
            elif parts[0] == 'point_head' and parts[1] in _HEAD_MAP:
                pre = '.'.join(parts[:2])
                idx, leaf = int(parts[2]), parts[3]
                is_final = idx == last_idx.get(pre, -1)
                kind, k = _seq_index(name, idx, is_final)
                base = ['point_head', _HEAD_MAP[parts[1]]]
                _put_head_layer(put, params, stats, base, kind, k, leaf, t)
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
