"""Measure the end-to-end output delta of the approx-top-k ball query.

Round-1 verdict (Weak #4): the claim that ``approx_max_k`` with
recall_target 0.8 is "invisible through max-pooled grouping" was argued,
not measured. This script runs the FULL IA-SSD forward on structured
synthetic scans twice — exact first-k vs approx — and reports the decoded
box deltas and the score-ranking agreement of the top detections.

Run on the real TPU (approx_max_k lowers to exact sort on CPU, making the
comparison trivial there):

    python tools/validate_approx_topk.py
"""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def train_tiny(jax, jnp, steps=800):
    """Overfit tiny IA-SSD on structured synthetic scenes so the comparison
    runs on a TRAINED score landscape — on an untrained net every bin/score
    is near-tied and argmax flips chaotically amplify tiny feature deltas,
    telling us nothing about deployed behavior."""
    import tempfile

    from spsnet_tpu.config import EDict
    from spsnet_tpu.models import build_detector
    from spsnet_tpu.parallel.mesh import make_mesh, shard_batch
    from spsnet_tpu.runtime.trainer import Trainer, device_batch
    from spsnet_tpu.utils.synthetic import synthetic_scene_batch
    from spsnet_tpu.zoo import scale_sa_config, tiny_optimization_cfg

    from spsnet_tpu.zoo import iassd_kitti_cfg
    model_cfg = scale_sa_config(iassd_kitti_cfg().MODEL, 4)  # N/4 sampling
    opt = tiny_optimization_cfg()
    cfg = EDict({'CLASS_NAMES': ['Car', 'Pedestrian', 'Cyclist'],
                 'MODEL': model_cfg, 'OPTIMIZATION': opt})
    model = build_detector(cfg.MODEL, num_class=3)
    mesh = make_mesh()
    trainer = Trainer(cfg, model, tempfile.mkdtemp(),
                      total_iters_each_epoch=steps, mesh=mesh)

    B, N = 4, 4096
    pts, gt = synthetic_scene_batch(seed=3, batch_size=B, n_points=N,
                                    n_clusters=12)
    batch = {'points': pts.astype(np.float32), 'gt_boxes': gt}
    state = trainer.init_state(batch)
    db = shard_batch(device_batch(batch), mesh)
    first = last = None
    for i in range(steps):
        state, metrics = trainer.train_step(state, db)
        if i == 0:
            first = float(metrics['loss'])
    last = float(metrics['loss'])
    print(json.dumps({'train_loss_first': first, 'train_loss_last': last}))
    variables = {'params': jax.device_get(state.params),
                 'batch_stats': jax.device_get(state.batch_stats)}
    return model, variables, cfg, jnp.asarray(pts.astype(np.float32))


def main():
    from spsnet_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from spsnet_tpu.models import build_detector
    from spsnet_tpu.models.detectors.detector3d import (
        class_agnostic_nms_batch)
    from spsnet_tpu.ops import grouping
    from spsnet_tpu.utils.synthetic import synthetic_scan_batch
    from spsnet_tpu.zoo import iassd_kitti_cfg

    trained = '--untrained' not in sys.argv
    if trained:
        model, variables, cfg, points = train_tiny(jax, jnp)
        B = points.shape[0]
        post = cfg.MODEL.POST_PROCESSING
    else:
        cfg = iassd_kitti_cfg()
        model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES))
        post = cfg.MODEL.POST_PROCESSING
        B, N = 4, 16384
        points = jnp.asarray(synthetic_scan_batch(seed=7, batch_size=B,
                                                  n_points=N))
        variables = jax.jit(model.init, static_argnames='train')(
            jax.random.PRNGKey(0), {'points': points[:1]}, train=False)

    def run(method):
        grouping.set_first_k_method(method)
        jax.clear_caches()

        @jax.jit
        def infer(variables, points):
            out = model.apply(variables, {'points': points}, train=False)
            dets = class_agnostic_nms_batch(
                out['batch_box_preds'], out['batch_cls_preds'],
                score_thresh=0.02,  # low cutoff: compare detections, not the
                # config threshold (tiny trained net scores sit lower)
                nms_thresh=float(post.NMS_CONFIG.NMS_THRESH),
                nms_pre=int(post.NMS_CONFIG.NMS_PRE_MAXSIZE),
                nms_post=int(post.NMS_CONFIG.NMS_POST_MAXSIZE))
            return out['batch_box_preds'], out['batch_cls_preds'], dets

        boxes, cls, dets = infer(variables, points)
        out = (np.asarray(boxes), np.asarray(cls),
               {k: np.asarray(v) for k, v in dets.items()})
        grouping.set_first_k_method(None)
        jax.clear_caches()
        return out

    bx_e, cls_e, det_e = run('exact')
    bx_a, cls_a, det_a = run('approx')

    center_delta = np.linalg.norm(bx_e[..., :3] - bx_a[..., :3], axis=-1)
    size_delta = np.abs(bx_e[..., 3:6] - bx_a[..., 3:6]).max(axis=-1)
    score_e = 1 / (1 + np.exp(-cls_e))
    score_delta = np.abs(score_e - 1 / (1 + np.exp(-cls_a))).max()
    # raw deltas over ALL candidate centers include background points whose
    # regressions are meaningless noise; restrict to confident candidates
    conf = score_e.max(axis=-1) > 0.02
    conf_center_delta = center_delta[conf] if conf.any() else np.zeros(1)

    # detection-level agreement: for each exact NMS detection, distance to
    # the nearest approx detection (Chamfer matching — positional slot
    # comparison is meaningless when near-tied scores reorder the list)
    match_deltas = []
    for b in range(B):
        ne, na = int(det_e['count'][b]), int(det_a['count'][b])
        if ne and na:
            d = np.linalg.norm(
                det_e['boxes'][b, :ne, None, :3]
                - det_a['boxes'][b, None, :na, :3], axis=-1)
            match_deltas.append(d.min(axis=1))
    match = np.concatenate(match_deltas) if match_deltas else np.zeros(1)

    # threshold-free: Chamfer over the top-K raw candidates ranked by each
    # run's own max class score (what NMS would consume first)
    K = 50
    topk_deltas = []
    se = score_e.max(axis=-1)
    sa = (1 / (1 + np.exp(-cls_a))).max(axis=-1)
    for b in range(B):
        ie = np.argsort(-se[b])[:K]
        ia = np.argsort(-sa[b])[:K]
        d = np.linalg.norm(bx_e[b, ie, None, :3] - bx_a[b, None, ia, :3],
                           axis=-1)
        topk_deltas.append(d.min(axis=1))
    topk = np.concatenate(topk_deltas)

    print(json.dumps({
        'backend': jax.default_backend(),
        'n_confident_centers': int(conf.sum()),
        'confident_center_delta_mean_m': float(conf_center_delta.mean()),
        'confident_center_delta_max_m': float(conf_center_delta.max()),
        'raw_center_delta_mean_m': float(center_delta.mean()),
        'raw_size_delta_max_m': float(size_delta.max()),
        'score_delta_max': float(score_delta),
        'nms_match_delta_mean_m': float(match.mean()),
        'nms_match_delta_p99_m': float(np.percentile(match, 99)),
        'nms_unmatched_over_0p5m_frac': float((match > 0.5).mean()),
        'top50_chamfer_mean_m': float(topk.mean()),
        'top50_chamfer_p99_m': float(np.percentile(topk, 99)),
        'top50_over_0p5m_frac': float((topk > 0.5).mean()),
        'count_exact': det_e['count'].tolist(),
        'count_approx': det_a['count'].tolist(),
    }))


if __name__ == '__main__':
    main()
