"""Batched offline inference over a directory of point clouds (serving CLI).

Goes beyond the reference's single-frame ``tools/demo.py``: fixed-shape
batches stream through ONE jitted forward+NMS program with one-batch
lookahead (dispatch of batch i+1 is enqueued before batch i's outputs are
materialized, so host IO and device compute overlap — the same pipelined
pattern as ``bench.py``). Outputs per-frame JSON detections in the lidar
frame and, when a calib dir is given, KITTI-format txt in the camera frame
(the exact layout ``kitti_dataset.generate_prediction_dicts`` emits, ref
``kitti_dataset.py:276-351``).

Examples:
    python tools/predict.py --cfg_file tools/cfgs/kitti_models/IA-SSD.yaml \
        --ckpt output/ckpts --data_dir velodyne/ --out_dir preds/
    python tools/predict.py ... --calib_dir training/calib  # + KITTI txt
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spsnet_tpu.utils.jax_setup import setup_jax


def write_kitti_txt(out_path, boxes_lidar, scores, labels, class_names,
                    calib, image_shape):
    """KITTI label lines in camera frame (parity with the reference's
    ``generate_prediction_dicts`` conversion chain)."""
    from spsnet_tpu.data.kitti import kitti_utils
    lines = []
    if len(boxes_lidar):
        boxes_cam = kitti_utils.boxes3d_lidar_to_kitti_camera(
            boxes_lidar, calib)
        boxes_img = kitti_utils.boxes3d_kitti_camera_to_imageboxes(
            boxes_cam, calib, image_shape=image_shape)
        for k in range(len(boxes_lidar)):
            name = class_names[int(labels[k]) - 1]
            alpha = (-np.arctan2(-boxes_lidar[k, 1], boxes_lidar[k, 0])
                     + boxes_cam[k, 6])
            x1, y1, x2, y2 = boxes_img[k]
            x, y, z, l, h, w, ry = boxes_cam[k]
            lines.append(
                f'{name} 0.00 0 {alpha:.4f} '
                f'{x1:.4f} {y1:.4f} {x2:.4f} {y2:.4f} '
                f'{h:.4f} {w:.4f} {l:.4f} {x:.4f} {y:.4f} {z:.4f} '
                f'{ry:.4f} {scores[k]:.4f}')
    Path(out_path).write_text('\n'.join(lines) + ('\n' if lines else ''))


def main():
    parser = argparse.ArgumentParser(
        description='Batched offline inference (serving CLI)')
    parser.add_argument('--cfg_file', type=str,
                        default='tools/cfgs/kitti_models/IA-SSD.yaml')
    parser.add_argument('--ckpt', type=str, default=None,
                        help='orbax checkpoint dir (random init if omitted)')
    parser.add_argument('--data_dir', type=str, default=None,
                        help='directory of .bin/.npy clouds')
    parser.add_argument('paths', nargs='*', help='explicit cloud files')
    parser.add_argument('--out_dir', type=str, required=True)
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--num_features', type=int, default=4,
                        help='point features per row in the input files')
    parser.add_argument('--num_points', type=int, default=None,
                        help='points per frame (default: DATA_CONFIG '
                             'sample_points, else 16384); for voxel-family '
                             'configs this instead caps the ragged cloud '
                             '(default DATA_CONFIG.MAX_POINTS_PER_FRAME, '
                             'else 65536) — over-cap frames are subsampled '
                             'at evenly-spaced scan positions')
    parser.add_argument('--score_thresh', type=float, default=0.0,
                        help='drop detections below this score at write-out')
    parser.add_argument('--calib_dir', type=str, default=None,
                        help='KITTI calib dir: also write camera-frame txt')
    parser.add_argument('--image_shape', type=int, nargs=2,
                        default=(375, 1242))
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--save_sample_list', action='store_true',
                        help='also dump every SA layer\'s sampled xyz per '
                             'frame (<out_dir>/sample_list_save/'
                             'sample_list_<frame>.npy, a list of (Ni, 3) '
                             'arrays) — the reference\'s SAVE_SAMPLE_LIST '
                             'debug artifact (IASSD_backbone.py:189-209) '
                             'without its hardcoded /home path')
    args = parser.parse_args()

    files = sorted(Path(args.data_dir).glob('*.bin')) + \
        sorted(Path(args.data_dir).glob('*.npy')) if args.data_dir else []
    files += [Path(p) for p in args.paths]
    if not files:
        parser.error('no input clouds (pass --data_dir or file paths)')
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    setup_jax()
    import jax
    import jax.numpy as jnp

    from spsnet_tpu.config import EDict, cfg_from_yaml_file
    from spsnet_tpu.models import build_detector
    from spsnet_tpu.models.detectors.detector3d import post_processing
    from spsnet_tpu.runtime.checkpoint import CheckpointManager

    cfg = EDict()
    cfg_from_yaml_file(args.cfg_file, cfg)
    class_names = list(cfg.CLASS_NAMES)
    model = build_detector(cfg.MODEL, num_class=len(class_names))

    B = args.batch_size
    # voxel-family configs run the host pipeline (voxelization + sparse
    # plans + ragged pad); point families take a fixed-N sample
    from spsnet_tpu.data.serving import ServingPipeline
    serving = ServingPipeline(cfg, B, num_points=args.num_points,
                              num_features=args.num_features,
                              seed=args.seed)
    num_points = serving.num_points

    def make_batch(chunk):
        return {k: jnp.asarray(v) for k, v in
                serving.make_batch_from_files(chunk).items()}

    dummy = jax.tree_util.tree_map(
        lambda x: jnp.zeros_like(x),
        {k: jnp.asarray(v) for k, v in serving.example_batch().items()})
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    if args.ckpt:
        mgr = CheckpointManager(Path(args.ckpt))
        state, _ = mgr.restore(None)
        variables = {'params': state.params, 'batch_stats': state.batch_stats}

    @jax.jit
    def infer(batch):
        out = model.apply(variables, batch, train=False)
        dets = post_processing(out, cfg.MODEL.POST_PROCESSING,
                               class_names=class_names)
        if args.save_sample_list and 'encoder_xyz' in out:
            dets = dict(dets)
            dets['encoder_xyz'] = out['encoder_xyz']
        return dets

    chunks = [files[i:i + B] for i in range(0, len(files), B)]
    t0 = time.time()
    pending = []                                # one-batch lookahead pipeline
    for ci, chunk in enumerate(chunks + [None]):
        if chunk is not None:
            dets = infer(make_batch(chunk))     # enqueue (async dispatch)
            pending.append((chunk, dets))
        if chunk is None or len(pending) > 1:
            done_chunk, dets = pending.pop(0)
            counts = np.asarray(dets['count'])  # materialize (waits)
            boxes = np.asarray(dets['boxes'])
            scores = np.asarray(dets['scores'])
            labels = np.asarray(dets['labels'])
            for bi, path in enumerate(done_chunk):
                n = int(counts[bi])
                keep = scores[bi, :n] >= args.score_thresh
                b, s, c = (boxes[bi, :n][keep], scores[bi, :n][keep],
                           labels[bi, :n][keep])
                rec = {
                    'frame_id': path.stem,
                    'boxes_lidar': b.round(4).tolist(),
                    'scores': s.round(4).tolist(),
                    'labels': c.tolist(),
                    'names': [class_names[int(k) - 1] for k in c],
                }
                (out_dir / f'{path.stem}.json').write_text(json.dumps(rec))
                if args.save_sample_list and 'encoder_xyz' in dets:
                    sl_dir = out_dir / 'sample_list_save'
                    sl_dir.mkdir(exist_ok=True)
                    xyz_list = [np.asarray(layer[bi])
                                for layer in dets['encoder_xyz']]
                    np.save(sl_dir / f'sample_list_{path.stem}.npy',
                            np.asarray(xyz_list, dtype=object),
                            allow_pickle=True)
                if args.calib_dir:
                    from spsnet_tpu.data.kitti.calibration import Calibration
                    calib_file = Path(args.calib_dir) / f'{path.stem}.txt'
                    if calib_file.exists():
                        write_kitti_txt(
                            out_dir / f'{path.stem}.txt', b, s, c,
                            class_names, Calibration(str(calib_file)),
                            tuple(args.image_shape))
    dt = time.time() - t0
    print(f'{len(files)} frames in {dt:.2f}s = {len(files) / dt:.1f} '
          f'scenes/s (batch {B}, {num_points} pts, incl. compile+IO)')


if __name__ == '__main__':
    main()
