"""Batch-size sweep for the IA-SSD inference bench on one TPU chip.

The FPS Pallas kernel's cost is a latency-bound sequential chain whose
per-step work is far below VPU saturation at B=8, so throughput should rise
superlinearly-in-efficiency with batch: larger B amortizes the chain.
This tool measures scenes/sec and ms/batch for a range of batch sizes to
pick the serving batch (reported alongside B=8 in bench.py).

Usage: python tools/bench_batch_sweep.py [B ...]   (default 4 8 16 32)
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from spsnet_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from spsnet_tpu.models import build_detector
    from spsnet_tpu.models.detectors.detector3d import class_agnostic_nms_batch
    from spsnet_tpu.utils.synthetic import synthetic_scan_batch
    from spsnet_tpu.zoo import iassd_kitti_cfg

    batches = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 32]
    cfg = iassd_kitti_cfg()
    model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES))
    post = cfg.MODEL.POST_PROCESSING
    N = 16384

    def make_infer():
        @jax.jit
        def infer(variables, points):
            out = model.apply(variables, {'points': points}, train=False)
            return class_agnostic_nms_batch(
                out['batch_box_preds'], out['batch_cls_preds'],
                score_thresh=float(post.SCORE_THRESH),
                nms_thresh=float(post.NMS_CONFIG.NMS_THRESH),
                nms_pre=int(post.NMS_CONFIG.NMS_PRE_MAXSIZE),
                nms_post=int(post.NMS_CONFIG.NMS_POST_MAXSIZE))
        return infer

    variables = None
    for B in batches:
        points = jnp.asarray(synthetic_scan_batch(seed=0, batch_size=B,
                                                  n_points=N))
        if variables is None:
            variables = jax.jit(model.init, static_argnames='train')(
                jax.random.PRNGKey(0), {'points': points[:1]}, train=False)
        infer = make_infer()
        dets = infer(variables, points)
        np.asarray(dets['count'])          # materialize: compile+warmup
        iters = max(4, 256 // B)
        best = float('inf')
        for _ in range(3):
            t0 = time.time()
            for _ in range(iters):
                dets = infer(variables, points)
            np.asarray(dets['count'])
            best = min(best, (time.time() - t0) / iters)
        print(f'B={B:3d}  {B / best:8.2f} scenes/s  {best * 1e3:7.1f} ms/batch'
              f'  {best * 1e3 / B:6.2f} ms/scene', flush=True)


if __name__ == '__main__':
    main()
