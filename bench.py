"""Benchmark: IA-SSD KITTI inference scenes/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
structured extras: "ms_per_batch", "flops_per_batch", "mfu" (inference),
and "train_scenes_per_sec" / "train_ms_per_batch" / "train_mfu" for the
full train step (fwd+bwd+adam with in-graph target assignment). The train
fields are null if the train-step measurement fails — the headline value
stays the inference number either way.

Input is a STRUCTURED synthetic scan (ground plane + range-attenuated
density + object clusters, ``spsnet_tpu/utils/synthetic.py``), not uniform
noise — occupancy patterns drive ball-query/top-k/NMS cost, so this number
is predictive of real-scan throughput.

Baseline context (BASELINE.md): the reference publishes NO absolute perf
numbers; vs_baseline is computed against an ASSUMED ~83 scenes/s (~12 ms per
scene) for IA-SSD-class inference on an A100 in the reference era. That
denominator is an estimate, stated in the metric string; the measured
scenes/sec value itself carries no such assumption.

MFU denominator: TPU v5e peak of 197e12 FLOP/s (bf16 MXU — jax's TPU
default matmul precision, which this model uses). FLOPs are the compiled
program's own XLA cost analysis, so MFU is exact for the program as run.
"""
import json
import time

import numpy as np

A100_REFERENCE_SCENES_PER_SEC = 83.0  # assumption, see module docstring
V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak, one v5e chip


def _probe_device(timeout_s=180, retries=3):
    """Bounded device-reachability probe in a child process.

    The axon tunnel, when down, makes ``jax.devices()`` HANG forever rather
    than raise — an unbounded bench would wedge the whole round's driver.
    Probe in a subprocess with a timeout; retry (the tunnel has been seen
    to recover); on exhaustion emit an EXPLICIT error line (value 0.0, not
    a fabricated measurement) and exit nonzero.
    """
    import subprocess
    import sys
    code = 'import jax; jax.devices(); print("ok")'
    for attempt in range(retries):
        try:
            r = subprocess.run([sys.executable, '-c', code],
                               capture_output=True, text=True,
                               timeout=timeout_s)
            if r.returncode == 0 and 'ok' in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if attempt < retries - 1:
            time.sleep(30)
    print(json.dumps({
        'metric': 'IA-SSD KITTI inference scenes/sec/chip — DEVICE '
                  'UNREACHABLE (jax.devices() hung; axon tunnel down). '
                  'Not a model failure: rerun when the device is back.',
        'value': 0.0,
        'unit': 'scenes/sec',
        'vs_baseline': 0.0,
    }))
    return False


def main():
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    if not _probe_device():
        sys.exit(3)
    from spsnet_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from spsnet_tpu.models import build_detector
    from spsnet_tpu.models.detectors.detector3d import class_agnostic_nms_batch
    from spsnet_tpu.zoo import iassd_kitti_cfg

    cfg = iassd_kitti_cfg()
    model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES))

    from spsnet_tpu.utils.synthetic import synthetic_scan_batch
    B, N = 8, 16384
    points = jnp.asarray(synthetic_scan_batch(seed=0, batch_size=B,
                                              n_points=N))

    variables = jax.jit(model.init, static_argnames='train')(
        jax.random.PRNGKey(0), {'points': points[:1]}, train=False)

    post = cfg.MODEL.POST_PROCESSING

    @jax.jit
    def infer(variables, points):
        out = model.apply(variables, {'points': points}, train=False)
        dets = class_agnostic_nms_batch(
            out['batch_box_preds'], out['batch_cls_preds'],
            score_thresh=float(post.SCORE_THRESH),
            nms_thresh=float(post.NMS_CONFIG.NMS_THRESH),
            nms_pre=int(post.NMS_CONFIG.NMS_PRE_MAXSIZE),
            nms_post=int(post.NMS_CONFIG.NMS_POST_MAXSIZE))
        return dets

    # warmup + compile. NOTE: materialize with np.asarray —
    # jax.block_until_ready returns early on the axon TPU platform.
    dets = infer(variables, points)
    np.asarray(dets['count'])

    # FLOPs of the program as compiled (for the MFU field)
    try:
        cost = infer.lower(variables, points).compile().cost_analysis()
        infer_flops = float(cost.get('flops', float('nan')))
    except Exception:
        infer_flops = float('nan')

    # Pipelined (sustained-serving) throughput: enqueue all iterations,
    # materialize only the last output. Device execution is in-order, so
    # the final np.asarray waits for every queued step; per-step host
    # dispatch (~30 ms over the axon tunnel) overlaps with device compute
    # exactly as it does in a real serving loop. Best of 3 runs.
    iters = 20
    best = float('inf')
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            dets = infer(variables, points)
        np.asarray(dets['count'])
        best = min(best, (time.time() - t0) / iters)
    scenes_per_sec = B / best
    ms_per_batch = best * 1000.0
    mfu = infer_flops / best / V5E_PEAK_FLOPS

    train = _measure_train()

    print(json.dumps({
        'metric': 'IA-SSD KITTI inference scenes/sec/chip (B=8, N=16384, '
                  'structured synthetic scan, incl. NMS, pipelined; '
                  f'{ms_per_batch:.1f} ms/batch device time; vs_baseline '
                  'uses an ASSUMED 83 scenes/s A100 reference)',
        'value': round(scenes_per_sec, 2),
        'unit': 'scenes/sec',
        'vs_baseline': round(scenes_per_sec / A100_REFERENCE_SCENES_PER_SEC, 3),
        'ms_per_batch': round(ms_per_batch, 2),
        # None (JSON null), never float nan: json.dumps would emit a bare
        # NaN token that strict parsers reject, losing the headline line
        'flops_per_batch': infer_flops if np.isfinite(infer_flops) else None,
        'mfu': round(mfu, 4) if np.isfinite(mfu) else None,
        'mfu_peak_flops': V5E_PEAK_FLOPS,
        **train,
    }))


def _measure_train():
    """Full train-step throughput (fwd+bwd+adam, in-graph target assignment)
    on the flagship config. Returns null fields on any failure so the
    inference headline is never lost to a train-side problem."""
    import tempfile

    try:
        import jax
        from spsnet_tpu.models import build_detector
        from spsnet_tpu.parallel.mesh import make_mesh, shard_batch
        from spsnet_tpu.runtime.trainer import Trainer, device_batch
        from spsnet_tpu.utils.synthetic import synthetic_scene_batch
        from spsnet_tpu.zoo import iassd_kitti_cfg

        cfg = iassd_kitti_cfg()
        model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES))
        B, N = 8, 16384
        pts, gt = synthetic_scene_batch(seed=1, batch_size=B, n_points=N)
        batch = {'points': pts.astype(np.float32), 'gt_boxes': gt}
        mesh = make_mesh()
        trainer = Trainer(cfg, model, tempfile.mkdtemp(),
                          total_iters_each_epoch=928, mesh=mesh)
        state = trainer.init_state(batch)
        db = shard_batch(device_batch(batch), mesh)

        # compile + warmup
        state, metrics = trainer.train_step(state, db)
        np.asarray(metrics['loss'])
        try:
            cost = trainer.train_step.lower(
                state, db).compile().cost_analysis()
            train_flops = float(cost.get('flops', float('nan')))
        except Exception:
            train_flops = float('nan')

        iters = 15
        best = float('inf')
        for _ in range(3):
            t0 = time.time()
            for _ in range(iters):
                state, metrics = trainer.train_step(state, db)
            np.asarray(metrics['loss'])
            best = min(best, (time.time() - t0) / iters)
        mfu = train_flops / best / V5E_PEAK_FLOPS
        return {
            'train_scenes_per_sec': round(B / best, 2),
            'train_ms_per_batch': round(best * 1000.0, 2),
            'train_flops_per_batch': (train_flops if np.isfinite(train_flops)
                                      else None),
            'train_mfu': round(mfu, 4) if np.isfinite(mfu) else None,
        }
    except Exception as e:  # noqa: BLE001 — never sink the headline number
        return {'train_scenes_per_sec': None, 'train_ms_per_batch': None,
                'train_flops_per_batch': None, 'train_mfu': None,
                'train_error': f'{type(e).__name__}: {e}'[:200]}


if __name__ == '__main__':
    main()
