"""Host-planned sparse convolution: plan correctness vs brute force, and the
SECOND pipeline end-to-end on a tiny grid."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.config import EDict
from spsnet_tpu.data.processor.sparse_plan import (
    KERNEL3, build_sparse_plan, spconv_down, subm_table)


def test_subm_table_matches_bruteforce():
    rng = np.random.default_rng(0)
    grid = (8, 16, 16)
    V = 40
    coords = np.stack([rng.integers(0, g, V) for g in grid], axis=1)
    coords = np.unique(coords, axis=0)
    V = len(coords)
    valid = np.ones(V, dtype=bool)
    table = subm_table(coords, valid, grid)
    cset = {tuple(c): i for i, c in enumerate(coords)}
    for i in range(V):
        for k, off in enumerate(KERNEL3):
            q = tuple(coords[i] + off)
            want = cset.get(q, V)
            if any(x < 0 or x >= g for x, g in zip(q, grid)):
                want = V
            assert table[i, k] == want, (i, k)


def test_spconv_down_active_sites():
    grid = (4, 8, 8)
    coords = np.array([[0, 0, 0], [1, 3, 5], [3, 7, 7]], dtype=np.int64)
    valid = np.ones(3, dtype=bool)
    oc, ov, table, new_grid = spconv_down(
        coords, valid, grid, (2, 2, 2), (1, 1, 1), (3, 3, 3), max_out=32)
    assert new_grid == (2, 4, 4)
    n_out = ov.sum()
    # every input voxel must be reachable from at least one output site
    reached = set(table[:n_out].reshape(-1).tolist()) - {3}
    assert reached == {0, 1, 2}
    # table entries index inputs whose coords map into the output's field
    for j in range(n_out):
        for k, idx in enumerate(table[j]):
            if idx == 3:
                continue
            ic = coords[idx]
            # in = out*stride - pad + k_off
            ks = np.array(np.unravel_index(k, (3, 3, 3)))
            expect = oc[j] * 2 - 1 + ks
            assert (ic == expect).all()


def test_second_end2end_tiny():
    rng = np.random.default_rng(0)
    # z must survive three stride-2 convs + the (3,1,1) z-compression
    grid_zyx = (64, 16, 16)
    B, V = 2, 64
    frames = []
    for _ in range(B):
        coords = np.unique(np.stack(
            [rng.integers(0, g, V) for g in grid_zyx], axis=1), axis=0)
        n = len(coords)
        pad = np.zeros((V, 3), dtype=np.int64)
        pad[:n] = coords
        valid = np.arange(V) < n
        plan = build_sparse_plan(pad, valid, grid_zyx,
                                 max_voxels_per_level=V)
        plan['coords'] = pad
        plan['valid'] = valid
        frames.append(plan)

    batch = {}
    for key in frames[0]:
        batch[key] = jnp.asarray(np.stack([f[key] for f in frames]))
    batch['voxels'] = jnp.asarray(
        rng.normal(size=(B, V, 5, 4)).astype(np.float32))
    batch['voxel_num_points'] = jnp.asarray(
        np.full((B, V), 5, dtype=np.int32))
    batch['voxel_coords'] = batch['coords']
    gt = np.zeros((B, 4, 8), dtype=np.float32)
    gt[:, :2, 3:6] = 2.0
    gt[:, :2, 7] = 1
    gt[:, :2, 0] = [[3, 5]] * B
    batch['gt_boxes'] = jnp.asarray(gt)

    from spsnet_tpu.models import build_detector
    final_zyx = np.asarray(frames[0]['final_grid'])
    cfg = EDict({
        'NAME': 'SECONDNet',
        'VFE': {'NAME': 'MeanVFE'},
        'BACKBONE_3D': {'NAME': 'VoxelBackBone8x'},
        'MAP_TO_BEV': {'NAME': 'HeightCompression',
                       'NUM_BEV_FEATURES': int(final_zyx[0]) * 128},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone',
                        'LAYER_NUMS': [1], 'LAYER_STRIDES': [1],
                        'NUM_FILTERS': [32],
                        'UPSAMPLE_STRIDES': [1],
                        'NUM_UPSAMPLE_FILTERS': [32]},
        'DENSE_HEAD': {
            'NAME': 'AnchorHeadSingle', 'CLASS_AGNOSTIC': False,
            'USE_DIRECTION_CLASSIFIER': True,
            'DIR_OFFSET': 0.78539, 'DIR_LIMIT_OFFSET': 0.0,
            'NUM_DIR_BINS': 2,
            'ANCHOR_GENERATOR_CONFIG': [
                {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
                 'anchor_rotations': [0, 1.57],
                 'anchor_bottom_heights': [-1.78],
                 'align_center': False, 'feature_map_stride': 8,
                 'matched_threshold': 0.6, 'unmatched_threshold': 0.45}],
            'TARGET_ASSIGNER_CONFIG': {'BOX_CODER': 'ResidualCoder'},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
                'code_weights': [1.0] * 7}},
        },
        'POST_PROCESSING': {'SCORE_THRESH': 0.1, 'NMS_CONFIG': {
            'MULTI_CLASSES_NMS': False, 'NMS_THRESH': 0.01,
            'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16}},
    })
    pcr = (0, -6.4, -3, 12.8, 6.4, 1)
    vs = (0.8, 0.8, 0.0625)
    model = build_detector(cfg, num_class=1, voxel_size=vs,
                           point_cloud_range=pcr,
                           final_grid_zyx=tuple(int(v) for v in final_zyx))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()

    other = {k: v for k, v in variables.items() if k != 'params'}

    def compute(params):
        o, _ = model.apply({'params': params, **other}, batch, train=True,
                           mutable=['batch_stats'])
        loss, _ = model.apply({'params': params, **other}, o,
                              method=model.loss)
        return loss

    loss, grads = jax.value_and_grad(compute)(variables['params'])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_second_multihead_end2end():
    """SECOND with AnchorHeadMulti (second_multihead.yaml protocol):
    grouped per-class heads, multihead anchor ordering, global-scatter
    class logits through loss + multi-class NMS."""
    import jax
    import jax.numpy as jnp
    from spsnet_tpu.config import EDict
    from spsnet_tpu.models import build_detector
    from tests.test_pvrcnn import PCR, VS, make_pv_batch

    rng = np.random.default_rng(5)
    batch, final_zyx = make_pv_batch(rng)
    gt = np.asarray(batch['gt_boxes']).copy()
    gt[:, 1, 7] = 2                      # mix classes across the heads
    batch['gt_boxes'] = jnp.asarray(gt)

    agc = []
    for name, size, z in [('Car', [3.9, 1.6, 1.56], -1.6),
                          ('Pedestrian', [0.8, 0.6, 1.73], -1.6),
                          ('Cyclist', [1.76, 0.6, 1.73], -1.6)]:
        agc.append({'class_name': name, 'anchor_sizes': [size],
                    'anchor_rotations': [0, 1.57],
                    'anchor_bottom_heights': [z], 'align_center': False,
                    'feature_map_stride': 8,
                    'matched_threshold': 0.6 if name == 'Car' else 0.5,
                    'unmatched_threshold': 0.45 if name == 'Car' else 0.35})
    cfg = EDict({
        'NAME': 'SECONDNet',
        'VFE': {'NAME': 'MeanVFE'},
        'BACKBONE_3D': {'NAME': 'VoxelBackBone8x'},
        'MAP_TO_BEV': {'NAME': 'HeightCompression',
                       'NUM_BEV_FEATURES': int(final_zyx[0]) * 128},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone',
                        'LAYER_NUMS': [1], 'LAYER_STRIDES': [1],
                        'NUM_FILTERS': [32], 'UPSAMPLE_STRIDES': [1],
                        'NUM_UPSAMPLE_FILTERS': [32]},
        'DENSE_HEAD': {
            'NAME': 'AnchorHeadMulti', 'CLASS_AGNOSTIC': False,
            'USE_DIRECTION_CLASSIFIER': True,
            'DIR_OFFSET': 0.78539, 'DIR_LIMIT_OFFSET': 0.0,
            'NUM_DIR_BINS': 2,
            'USE_MULTIHEAD': True, 'SEPARATE_MULTIHEAD': True,
            'SHARED_CONV_NUM_FILTER': 16,
            'ANCHOR_GENERATOR_CONFIG': agc,
            'RPN_HEAD_CFGS': [{'HEAD_CLS_NAME': ['Car']},
                              {'HEAD_CLS_NAME': ['Pedestrian']},
                              {'HEAD_CLS_NAME': ['Cyclist']}],
            'TARGET_ASSIGNER_CONFIG': {'BOX_CODER': 'ResidualCoder'},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
                'code_weights': [1.0] * 7}},
        },
        'POST_PROCESSING': {'SCORE_THRESH': 0.1, 'NMS_CONFIG': {
            'MULTI_CLASSES_NMS': True, 'NMS_THRESH': 0.1,
            'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16}},
    })
    model = build_detector(cfg, num_class=3, voxel_size=VS,
                           point_cloud_range=PCR,
                           final_grid_zyx=tuple(int(v) for v in final_zyx))
    variables = jax.jit(model.init, static_argnames='train')(
        jax.random.PRNGKey(0), batch, train=True)
    out = model.apply(variables, batch, train=False)
    boxes = np.asarray(out['batch_box_preds'])
    cls = np.asarray(out['batch_cls_preds'])
    # 3 heads x 2 anchors x H x W anchors, global 3-class logits
    assert cls.shape[2] == 3
    assert boxes.shape[1] == cls.shape[1]
    assert np.isfinite(boxes).all()
    # each head's non-own class columns are masked to ~0 probability
    probs = 1 / (1 + np.exp(-cls))
    n_per_head = cls.shape[1] // 3
    assert probs[:, :n_per_head, 1:].max() < 1e-6          # Car head
    assert probs[:, n_per_head:2 * n_per_head, 0].max() < 1e-6

    other = {k: v for k, v in variables.items() if k != 'params'}

    def compute(params):
        o, _ = model.apply({'params': params, **other}, batch, train=True,
                           mutable=['batch_stats'])
        loss, _ = model.apply({'params': params, **other}, o,
                              method=model.loss)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(compute))(variables['params'])
    assert np.isfinite(float(loss))
    head_g = jax.tree_util.tree_leaves(grads['dense_head'])
    assert any(np.abs(np.asarray(g)).max() > 0 for g in head_g)
