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
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def fixture_scene_batch(seed, batch_size, n_points, n_gt=8, n_per_obj=400):
    """Compact car scenes in the style of tests/test_kitti_end2end.py's
    overfit fixture (the one scene family a tiny IA-SSD is PROVEN to learn
    to detect on): background in the FOV x in [4, 24] m plus a dense
    100+-point cluster inside each car-sized gt box."""
    rng = np.random.default_rng(seed)
    all_pts, all_gt = [], []
    slots = [(x, y) for x in (8.0, 13.0, 18.0)
             for y in (-6.75, -2.25, 2.25, 6.75)]
    for _ in range(batch_size):
        picks = rng.permutation(len(slots))[:n_gt]
        gt = np.zeros((n_gt, 8), dtype=np.float32)
        gt[:, 0] = [slots[p][0] for p in picks]
        gt[:, 1] = [slots[p][1] for p in picks]
        gt[:, :2] += rng.uniform(-0.4, 0.4, (n_gt, 2))
        gt[:, 2] = rng.uniform(-1.0, -0.5, n_gt)
        gt[:, 3:6] = [3.9, 1.6, 1.56]
        gt[:, 6] = rng.uniform(-0.3, 0.3, n_gt)
        gt[:, 7] = 1.0                                  # class Car
        n_obj = n_per_obj * n_gt
        n_bg = n_points - n_obj
        pts = np.zeros((n_points, 4), dtype=np.float32)
        pts[:n_bg, 0] = rng.uniform(4, 24, n_bg)
        pts[:n_bg, 1] = pts[:n_bg, 0] * rng.uniform(-0.5, 0.5, n_bg)
        pts[:n_bg, 2] = rng.uniform(-1.5, 0.5, n_bg)
        for k in range(n_gt):
            sl = slice(n_bg + k * n_per_obj, n_bg + (k + 1) * n_per_obj)
            local = rng.uniform(-0.25, 0.25, (n_per_obj, 3)) * gt[k, 3:6]
            c, s = np.cos(gt[k, 6]), np.sin(gt[k, 6])
            rot = local.copy()
            rot[:, 0] = local[:, 0] * c - local[:, 1] * s
            rot[:, 1] = local[:, 0] * s + local[:, 1] * c
            pts[sl, :3] = gt[k, :3] + rot
        pts[:, 3] = rng.uniform(0, 1, n_points)
        all_pts.append(pts)
        all_gt.append(gt)
    return np.stack(all_pts), np.stack(all_gt)


def train_tiny(jax, jnp, steps=600, data_seed=3, jitter_seed=11):
    """Overfit tiny IA-SSD on fixture-style car scenes so the comparison
    runs on a TRAINED score landscape — on an untrained net every bin/score
    is near-tied and argmax flips chaotically amplify tiny feature deltas,
    telling us nothing about deployed behavior."""
    import tempfile

    from spsnet_tpu.config import EDict
    from spsnet_tpu.models import build_detector
    from spsnet_tpu.parallel.mesh import make_mesh, shard_batch
    from spsnet_tpu.runtime.trainer import Trainer, device_batch
    from spsnet_tpu.zoo import tiny_iassd_cfg, tiny_optimization_cfg

    # the overfit test's proven recipe, scaled x4 to N=4096 frames: widened
    # sampling pyramid (in-box candidates survive every level), [64] FC
    # heads, constant-LR adam (the onecycle peak kicks tiny models into the
    # all-background attractor)
    model_cfg = tiny_iassd_cfg()
    model_cfg.BACKBONE_3D.SA_CONFIG.NPOINT_LIST = \
        [[1024], [512], [256], [128], [-1], [128]]
    model_cfg.POINT_HEAD.CLS_FC = [64]
    model_cfg.POINT_HEAD.REG_FC = [64]
    model_cfg.POST_PROCESSING.SCORE_THRESH = 0.01
    opt = tiny_optimization_cfg()
    opt.OPTIMIZER = 'adam'
    opt.LR = 0.001
    opt.DECAY_STEP_LIST = [100000]
    cfg = EDict({'CLASS_NAMES': ['Car', 'Pedestrian', 'Cyclist'],
                 'MODEL': model_cfg, 'OPTIMIZATION': opt})
    model = build_detector(cfg.MODEL, num_class=3)
    mesh = make_mesh()
    trainer = Trainer(cfg, model, tempfile.mkdtemp(),
                      total_iters_each_epoch=steps, mesh=mesh)

    B, N = 4, 4096
    pts, gt = fixture_scene_batch(seed=data_seed, batch_size=B, n_points=N)
    pts = pts.astype(np.float32)
    batch = {'points': pts, 'gt_boxes': gt}
    state = trainer.init_state(batch)
    # Per-step 2 cm coordinate jitter: without it the toy net MEMORISES the
    # exact neighbor sets of each point and any slot substitution (the very
    # thing approx-top-k does) produces metre-scale deltas — a memorisation
    # artifact, not deployment behavior. Jitter forces neighbor-robust
    # features, the regime a net trained on real variative data lives in.
    jitter_rng = np.random.default_rng(jitter_seed)
    # held-out evaluation copy (same scenes, unseen jitter draw)
    eval_pts = pts.copy()
    eval_pts[..., :3] += jitter_rng.normal(
        0, 0.02, pts[..., :3].shape).astype(np.float32)
    points_dev = jnp.asarray(eval_pts)

    # On this 4-scene toy problem the detecting solution is a TRANSIENT:
    # the all-background equilibrium is a lower-loss attractor (see
    # test_train_to_overfit's harness notes — a property of the reference's
    # 1/pos_num loss weighting, faithfully replicated). Snapshot the peak
    # DETECTING state — the one whose confident candidates cover the most gt
    # boxes (a diffuse everything-slightly-positive landscape covers gts no
    # better than a background one) — and run exact-vs-approx on THAT.
    gt_centers = jnp.asarray(gt[..., :3])            # (B, n_gt, 3)

    @jax.jit
    def peek_coverage(params, batch_stats, points):
        out = model.apply({'params': params, 'batch_stats': batch_stats},
                          {'points': points}, train=False)
        score = jax.nn.sigmoid(out['batch_cls_preds']).max(axis=-1)  # (B,M)
        centers = out['batch_box_preds'][..., :3]
        d = jnp.linalg.norm(gt_centers[:, :, None, :]
                            - centers[:, None, :, :], axis=-1)  # (B,G,M)
        near_conf = (d < 1.5) & (score[:, None, :] > 0.05)
        return near_conf.any(axis=-1).sum(), score.max()

    first = last = None
    best = {'covered': 0, 'step': -1, 'vars': None}
    history = []
    for i in range(steps):
        jittered = pts.copy()
        jittered[..., :3] += jitter_rng.normal(
            0, 0.02, pts[..., :3].shape).astype(np.float32)
        db = shard_batch(device_batch(
            {'points': jittered, 'gt_boxes': gt}), mesh)
        state, metrics = trainer.train_step(state, db)
        if i == 0:
            first = float(metrics['loss'])
        if (i + 1) % 25 == 0:
            covered, smax = peek_coverage(state.params, state.batch_stats,
                                          points_dev)
            covered = int(np.asarray(covered))
            history.append(covered)
            if covered > best['covered']:
                best = {'covered': covered, 'step': i + 1,
                        'vars': {'params': jax.device_get(state.params),
                                 'batch_stats':
                                     jax.device_get(state.batch_stats)}}
    last = float(metrics['loss'])
    print(json.dumps({'train_loss_first': first, 'train_loss_last': last,
                      'peak_gt_covered': best['covered'],
                      'n_gt_total': int(np.prod(gt.shape[:2])),
                      'peak_step': best['step'],
                      'coverage_history': history}))
    variables = best['vars'] if best['vars'] is not None else {
        'params': jax.device_get(state.params),
        'batch_stats': jax.device_get(state.batch_stats)}
    return model, variables, cfg, points_dev, gt


def _quality_vs_gt(det, gt, score_min=0.1, match_radius=1.0):
    """Detection quality against the TRUE boxes — the deployment metric.
    Returns gt recall, precision of strong dets, and mean center error of
    matched gts. (Module-level twin of main()'s closure so the seeded-FPS
    lifecycle gate can reuse it per trained model.)"""
    B = gt.shape[0]
    n_gt = covered = n_det = n_det_good = 0
    errs = []
    for b in range(B):
        nb = int(det['count'][b])
        boxes_b = np.asarray(det['boxes'][b, :nb, :3])
        strong = np.asarray(det['scores'][b, :nb]) >= score_min
        boxes_b = boxes_b[strong]
        gts = gt[b, :, :3]
        n_gt += len(gts)
        n_det += len(boxes_b)
        if len(boxes_b) == 0:
            continue
        d = np.linalg.norm(gts[:, None] - boxes_b[None], axis=-1)
        hit = d.min(axis=1) < match_radius
        covered += int(hit.sum())
        errs.extend(d.min(axis=1)[hit].tolist())
        n_det_good += int((d.min(axis=0) < match_radius).sum())
    return {
        'gt_recall': covered / max(n_gt, 1),
        'det_precision': n_det_good / max(n_det, 1),
        'n_strong_dets': n_det,
        'matched_center_err_mean_m': float(np.mean(errs)) if errs else None,
    }


def fps_train_gate():
    """Seeded-FPS LIFECYCLE gate: train AND serve the tiny net under each
    seed fraction (round 3's --fps gate trained exact and only served
    seeded — 'train-time self-consistency under seeding has no test
    surface' was the reason the default stayed off). Two independent data
    seeds per fraction bound the proxy's noise."""
    import os

    from spsnet_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from spsnet_tpu.models.detectors.detector3d import (
        class_agnostic_nms_batch)

    combos = [(0.0, 'head'), (0.5, 'head'), (0.75, 'head')]
    for a in sys.argv:
        if a.startswith('--combos='):    # e.g. --combos=0.75:grid,0.875:grid
            combos = [(float(p.split(':')[0]), p.split(':')[1])
                      for p in a.split('=', 1)[1].split(',')]
    results = {}
    for frac, mode in combos:
        # frac 0 must be EXPLICIT: on TPU the unset default is now seeded
        os.environ['SPSNET_FPS_SEED'] = str(frac)
        os.environ['SPSNET_FPS_SEED_MODE'] = mode
        per_seed = []
        for dseed, jseed in ((3, 11), (5, 13)):
            jax.clear_caches()
            model, variables, cfg, points, gt = train_tiny(
                jax, jnp, data_seed=dseed, jitter_seed=jseed)
            post = cfg.MODEL.POST_PROCESSING

            @jax.jit
            def infer(variables, points):
                out = model.apply(variables, {'points': points},
                                  train=False)
                return class_agnostic_nms_batch(
                    out['batch_box_preds'], out['batch_cls_preds'],
                    score_thresh=0.01,
                    nms_thresh=float(post.NMS_CONFIG.NMS_THRESH),
                    nms_pre=int(post.NMS_CONFIG.NMS_PRE_MAXSIZE),
                    nms_post=int(post.NMS_CONFIG.NMS_POST_MAXSIZE))

            det = {k: np.asarray(v)
                   for k, v in infer(variables, points).items()}
            per_seed.append({'data_seed': dseed,
                             'quality': _quality_vs_gt(det, gt),
                             'counts': det['count'].tolist()})
        recalls = [s['quality']['gt_recall'] for s in per_seed]
        results[f'seed_{frac}_{mode}'] = {
            'per_seed': per_seed,
            'gt_recall_mean': float(np.mean(recalls)),
            'gt_recall_min': float(np.min(recalls)),
        }
    os.environ.pop('SPSNET_FPS_SEED', None)
    os.environ.pop('SPSNET_FPS_SEED_MODE', None)
    print(json.dumps({'backend': jax.default_backend(),
                      'mode': 'fps_seed_lifecycle', **results}))


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
        model, variables, cfg, points, gt = train_tiny(jax, jnp)
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
        gt = None

    def run(method, recall_target=None):
        grouping.set_first_k_method(method, recall_target)
        jax.clear_caches()

        @jax.jit
        def infer(variables, points):
            out = model.apply(variables, {'points': points}, train=False)
            dets = class_agnostic_nms_batch(
                out['batch_box_preds'], out['batch_cls_preds'],
                score_thresh=0.01,  # low cutoff: compare detections, not the
                # config threshold (tiny trained net scores sit lower —
                # same operating point as test_train_to_overfit)
                nms_thresh=float(post.NMS_CONFIG.NMS_THRESH),
                nms_pre=int(post.NMS_CONFIG.NMS_PRE_MAXSIZE),
                nms_post=int(post.NMS_CONFIG.NMS_POST_MAXSIZE))
            return out['batch_box_preds'], out['batch_cls_preds'], dets

        boxes, cls, dets = infer(variables, points)
        np.asarray(dets['count'])
        # rough per-method device time (pipelined over 10 iters)
        t0 = time.time()
        for _ in range(10):
            _, _, dets_t = infer(variables, points)
        np.asarray(dets_t['count'])
        ms = (time.time() - t0) / 10 * 1000.0
        out = (np.asarray(boxes), np.asarray(cls),
               {k: np.asarray(v) for k, v in dets.items()}, ms)
        grouping.set_first_k_method(None)
        jax.clear_caches()
        return out

    def quality_vs_gt(det, score_min=0.1, match_radius=1.0):
        """Detection quality against the TRUE boxes — the deployment metric.
        Exact-vs-approx output Chamfer conflates slot-substitution
        sensitivity with quality; what matters is whether each method FINDS
        the objects. Returns gt recall, precision of strong dets, and mean
        center error of matched gts."""
        if gt is None:
            return None
        n_gt = covered = n_det = n_det_good = 0
        errs = []
        for b in range(B):
            nb = int(det['count'][b])
            boxes_b = np.asarray(det['boxes'][b, :nb, :3])
            strong = np.asarray(det['scores'][b, :nb]) >= score_min
            boxes_b = boxes_b[strong]
            gts = gt[b, :, :3]
            n_gt += len(gts)
            n_det += len(boxes_b)
            if len(boxes_b) == 0:
                continue
            d = np.linalg.norm(gts[:, None] - boxes_b[None], axis=-1)
            hit = d.min(axis=1) < match_radius
            covered += int(hit.sum())
            errs.extend(d.min(axis=1)[hit].tolist())
            n_det_good += int((d.min(axis=0) < match_radius).sum())
        return {
            'gt_recall': covered / max(n_gt, 1),
            'det_precision': n_det_good / max(n_det, 1),
            'n_strong_dets': n_det,
            'matched_center_err_mean_m': float(np.mean(errs)) if errs
            else None,
        }

    if '--fps' in sys.argv:
        # seeded-FPS quality gate: same harness, the knob is the FPS seed
        # fraction instead of the top-k method (SPSNET_FPS_SEED routes
        # ops.farthest_point_sample; caches cleared per setting)
        import os
        results = {}
        for frac in (0.0, 0.5, 0.75):
            os.environ['SPSNET_FPS_SEED'] = str(frac)
            jax.clear_caches()
            _, _, det, ms = run(None)
            results[f'seed_{frac}'] = {
                'quality': quality_vs_gt(det), 'ms_per_batch': round(ms, 2),
                'counts': det['count'].tolist()}
        os.environ.pop('SPSNET_FPS_SEED', None)
        print(json.dumps({'backend': jax.default_backend(),
                          'mode': 'fps_seed', **results}))
        return

    bx_e, cls_e, det_e, ms_e = run('exact')
    bx_a, cls_a, det_a, ms_a = run('approx')
    _, _, det_a95, ms_a95 = run('approx', recall_target=0.95)

    center_delta = np.linalg.norm(bx_e[..., :3] - bx_a[..., :3], axis=-1)
    size_delta = np.abs(bx_e[..., 3:6] - bx_a[..., 3:6]).max(axis=-1)
    score_e = 1 / (1 + np.exp(-cls_e))
    score_delta = np.abs(score_e - 1 / (1 + np.exp(-cls_a))).max()
    # raw deltas over ALL candidate centers include background points whose
    # regressions are meaningless noise; restrict to confident candidates
    conf = score_e.max(axis=-1) > 0.01
    conf_center_delta = center_delta[conf] if conf.any() else np.zeros(1)

    # detection-level agreement: for each exact NMS detection, distance to
    # the nearest approx detection (Chamfer matching — positional slot
    # comparison is meaningless when near-tied scores reorder the list)
    match_deltas, conf_match_deltas = [], []
    for b in range(B):
        ne, na = int(det_e['count'][b]), int(det_a['count'][b])
        if ne and na:
            d = np.linalg.norm(
                det_e['boxes'][b, :ne, None, :3]
                - det_a['boxes'][b, None, :na, :3], axis=-1)
            md = d.min(axis=1)
            match_deltas.append(md)
            # deployment-relevant subset: exact detections at the full-scale
            # operating point (score >= 0.1)
            strong = np.asarray(det_e['scores'][b, :ne]) >= 0.1
            if strong.any():
                conf_match_deltas.append(md[strong])
    match = np.concatenate(match_deltas) if match_deltas else np.zeros(1)
    conf_match = (np.concatenate(conf_match_deltas)
                  if conf_match_deltas else np.zeros(1))

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
        # valid=false means the tiny net produced no detections and the
        # NMS-match rows are vacuous fallbacks — rerun, don't cite
        'valid': bool(conf.any() and det_e['count'].sum() > 0
                      and det_a['count'].sum() > 0),
        'max_score_exact': float(score_e.max()),
        'n_confident_centers': int(conf.sum()),
        'confident_center_delta_mean_m': float(conf_center_delta.mean()),
        'confident_center_delta_max_m': float(conf_center_delta.max()),
        'raw_center_delta_mean_m': float(center_delta.mean()),
        'raw_size_delta_max_m': float(size_delta.max()),
        'score_delta_max': float(score_delta),
        'nms_match_delta_mean_m': float(match.mean()),
        'nms_match_delta_p99_m': float(np.percentile(match, 99)),
        'nms_unmatched_over_0p5m_frac': float((match > 0.5).mean()),
        'strong_det_match_delta_mean_m': float(conf_match.mean()),
        'strong_det_match_delta_max_m': float(conf_match.max()),
        'n_strong_dets': int(sum(len(x) for x in conf_match_deltas)),
        'top50_chamfer_mean_m': float(topk.mean()),
        'top50_chamfer_p99_m': float(np.percentile(topk, 99)),
        'top50_over_0p5m_frac': float((topk > 0.5).mean()),
        'count_exact': det_e['count'].tolist(),
        'count_approx': det_a['count'].tolist(),
        # the accept gate: detection quality vs the TRUE boxes per method
        'quality_exact': quality_vs_gt(det_e),
        'quality_approx_r080': quality_vs_gt(det_a),
        'quality_approx_r095': quality_vs_gt(det_a95),
        'ms_per_batch_exact': round(ms_e, 2),
        'ms_per_batch_approx_r080': round(ms_a, 2),
        'ms_per_batch_approx_r095': round(ms_a95, 2),
    }))


if __name__ == '__main__':
    if '--fps-train' in sys.argv:
        fps_train_gate()
    else:
        main()
