"""Convert a reference (OpenPCDet/SPSNet) torch ``.pth`` checkpoint into an
orbax checkpoint loadable by this framework.

    python tools/import_checkpoint.py \
        --cfg_file tools/cfgs/kitti_models/IA-SSD.yaml \
        --pth /path/to/checkpoint_epoch_80.pth \
        --out  output/imported_iassd

The conversion handles the IA-SSD / PAGNet / SPSNet point family (see
``spsnet_tpu/utils/checkpoint_import.py`` for the name/layout mapping).
Run with ``--allow_partial`` to skip keys that have no counterpart (the
remaining weights keep their random initialization — fine-tune before use).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--pth', type=str, required=True)
    parser.add_argument('--out', type=str, required=True)
    parser.add_argument('--allow_partial', action='store_true')
    parser.add_argument('--num_points', type=int, default=16384)
    args = parser.parse_args()

    from spsnet_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from spsnet_tpu.config import cfg, cfg_from_yaml_file
    from spsnet_tpu.models import build_detector
    from spsnet_tpu.runtime.checkpoint import CheckpointManager
    from spsnet_tpu.utils.checkpoint_import import load_reference_checkpoint

    cfg_from_yaml_file(args.cfg_file, cfg)
    model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES))
    rng = np.random.default_rng(0)
    pts = jnp.asarray(
        rng.uniform(-35, 35, (1, args.num_points, 4)).astype(np.float32))
    variables = jax.jit(model.init, static_argnames='train')(
        jax.random.PRNGKey(0), {'points': pts}, train=False)

    merged, unmapped = load_reference_checkpoint(
        args.pth, variables, allow_partial=args.allow_partial)
    if unmapped:
        print(f'WARNING: {len(unmapped)} unmapped keys '
              f'(first 10): {unmapped[:10]}')

    mgr = CheckpointManager(Path(args.out).resolve())
    mgr.save(0, merged)
    print(f'imported {args.pth} -> {args.out} (step 0)')


if __name__ == '__main__':
    main()
