"""Export a detector's full inference program (forward + NMS) as a
serialized StableHLO artifact (``jax.export``) for deployment.

The exported blob is self-contained — weights are baked in as constants —
and replayable from any JAX process (and, being StableHLO, loadable by
non-JAX runtimes such as TF/PJRT serving stacks) without this framework
installed. Cross-platform lowering is supported: ``--platforms cpu tpu``
produces one artifact servable on either backend.

The reference has no deployment-export story (its serving path is "install
torch + CUDA extensions and load the .pth"); this replaces it with an
ahead-of-time compiled, dependency-free artifact.

Example:
    python tools/export_model.py --cfg_file tools/cfgs/kitti_models/IA-SSD.yaml \
        --ckpt output/ckpts --out iassd_b8.stablehlo --platforms cpu tpu
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spsnet_tpu.utils.jax_setup import setup_jax


def main():
    parser = argparse.ArgumentParser(
        description='Export forward+NMS as serialized StableHLO')
    parser.add_argument('--cfg_file', type=str,
                        default='tools/cfgs/kitti_models/IA-SSD.yaml')
    parser.add_argument('--ckpt', type=str, default=None,
                        help='orbax checkpoint dir (random init if omitted)')
    parser.add_argument('--out', type=str, required=True,
                        help='output artifact path (.stablehlo)')
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--num_points', type=int, default=16384)
    parser.add_argument('--platforms', type=str, nargs='+', default=None,
                        help='lowering platforms, e.g. cpu tpu (default: '
                             'current backend)')
    args = parser.parse_args()

    setup_jax()
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from spsnet_tpu.config import EDict, cfg_from_yaml_file
    from spsnet_tpu.models import build_detector
    from spsnet_tpu.models.detectors.detector3d import post_processing
    from spsnet_tpu.runtime.checkpoint import CheckpointManager

    cfg = EDict()
    cfg_from_yaml_file(args.cfg_file, cfg)
    model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES))
    B = args.batch_size
    # voxel-family configs export a batch-dict program whose inputs are the
    # host pipeline's fixed-shape arrays (voxels/coords/plan tables); the
    # consumer runs spsnet_tpu.data.serving.ServingPipeline (numpy/C++, no
    # device) to produce them. Point families keep the single (B, N, 4)
    # points input.
    from spsnet_tpu.data.serving import ServingPipeline
    serving = ServingPipeline(cfg, B, num_points=args.num_points)
    example = serving.example_batch()
    dummy = {k: jnp.asarray(v) for k, v in example.items()}
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    if args.ckpt:
        mgr = CheckpointManager(Path(args.ckpt))
        state, _ = mgr.restore(None)
        variables = {'params': state.params, 'batch_stats': state.batch_stats}

    @jax.jit
    def infer(batch):
        out = model.apply(variables, batch, train=False)
        dets = post_processing(out, cfg.MODEL.POST_PROCESSING,
                               class_names=list(cfg.CLASS_NAMES))
        return {k: dets[k] for k in ('boxes', 'scores', 'labels', 'count')}

    kwargs = {}
    if args.platforms:
        kwargs['platforms'] = args.platforms
    spec = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
            for k, v in dummy.items()}
    exp = jax_export.export(infer, **kwargs)(spec)
    blob = exp.serialize()
    out_path = Path(args.out)
    out_path.write_bytes(blob)
    meta = {
        'model': cfg.MODEL.NAME,
        'class_names': list(cfg.CLASS_NAMES),
        'input': {k: [int(s) for s in v.shape] + [str(v.dtype)]
                  for k, v in dummy.items()},
        'outputs': ['boxes', 'scores', 'labels', 'count'],
        'platforms': list(exp.platforms),
        'bytes': len(blob),
    }
    out_path.with_suffix(out_path.suffix + '.json').write_text(
        json.dumps(meta, indent=2))
    print(f'exported {out_path} ({len(blob) / 1e6:.2f} MB, '
          f'platforms={list(exp.platforms)})')
    print('replay: jax.export.deserialize(blob).call(batch_dict)')


if __name__ == '__main__':
    main()
