"""Single-frame demo (parity: ``tools/demo.py``): run a detector on a .bin /
.npy point cloud and dump detections + an optional BEV PNG render.

The reference renders with open3d/mayavi (GUI); headless TPU hosts get a
matplotlib BEV plot instead.
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spsnet_tpu.utils.jax_setup import setup_jax


def load_points(path, num_points=16384):
    path = Path(path)
    if path.suffix == '.bin':
        points = np.fromfile(str(path), dtype=np.float32).reshape(-1, 4)
    elif path.suffix == '.npy':
        points = np.load(str(path)).astype(np.float32)
    else:
        raise ValueError(f'unsupported file: {path}')
    if len(points) >= num_points:
        choice = np.random.choice(len(points), num_points, replace=False)
    else:
        choice = np.concatenate([
            np.arange(len(points)),
            np.random.choice(len(points), num_points - len(points))])
    return points[choice]


def render_bev(points, boxes, scores, labels, out_path):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(12, 12))
    ax.scatter(points[:, 0], points[:, 1], s=0.2, c=points[:, 2],
               cmap='viridis')
    from spsnet_tpu.data.augmentor.data_augmentor_geometry import _bev_corners_np
    if len(boxes):
        corners = _bev_corners_np(boxes)
        for c, s in zip(corners, scores):
            poly = np.vstack([c, c[:1]])
            ax.plot(poly[:, 0], poly[:, 1], 'r-', linewidth=1)
    ax.set_aspect('equal')
    fig.savefig(out_path, dpi=120, bbox_inches='tight')
    print(f'saved {out_path}')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', type=str,
                        default='tools/cfgs/kitti_models/IA-SSD.yaml')
    parser.add_argument('--data_path', type=str, required=True)
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--render', type=str, default=None,
                        help='output PNG path for a BEV render')
    parser.add_argument('--html', type=str, default=None,
                        help='output path for an interactive 3D HTML viewer '
                             '(open in any browser; replaces the reference '
                             'open3d window on headless hosts)')
    args = parser.parse_args()

    setup_jax()
    import jax
    import jax.numpy as jnp

    from spsnet_tpu.config import EDict, cfg_from_yaml_file
    from spsnet_tpu.models import build_detector
    from spsnet_tpu.models.detectors.detector3d import post_processing
    from spsnet_tpu.runtime.checkpoint import CheckpointManager

    cfg = EDict()
    cfg_from_yaml_file(args.cfg_file, cfg)
    model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES))

    points = load_points(args.data_path)
    batch = {'points': jnp.asarray(points[None])}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    if args.ckpt:
        mgr = CheckpointManager(Path(args.ckpt))
        state, _ = mgr.restore(None)
        variables = {'params': state.params, 'batch_stats': state.batch_stats}

    out = model.apply(variables, batch, train=False)
    dets = post_processing(out, cfg.MODEL.POST_PROCESSING)
    cnt = int(dets['count'][0])
    boxes = np.asarray(dets['boxes'][0, :cnt])
    scores = np.asarray(dets['scores'][0, :cnt])
    labels = np.asarray(dets['labels'][0, :cnt])
    print(f'{cnt} detections:')
    for b, s, l in zip(boxes, scores, labels):
        print(f'  {cfg.CLASS_NAMES[l - 1]:12s} score={s:.3f} box={b.round(2)}')
    if args.render:
        render_bev(points, boxes, scores, labels, args.render)
    if args.html:
        from spsnet_tpu.utils.web_vis import draw_scenes
        draw_scenes(args.html, points, ref_boxes=boxes, ref_scores=scores,
                    ref_labels=labels, class_names=list(cfg.CLASS_NAMES))
        print(f'saved {args.html}')


if __name__ == '__main__':
    main()
