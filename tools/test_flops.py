"""FLOPs/params audit (parity: ``tools/test_flops.py`` + ``flops_counter.py``)
via XLA HLO cost analysis — exact compiled-program counts, not hook-based
estimates.
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spsnet_tpu.utils.jax_setup import setup_jax


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', type=str,
                        default='tools/cfgs/kitti_models/IA-SSD.yaml')
    parser.add_argument('--batch_size', type=int, default=1)
    parser.add_argument('--num_points', type=int, default=16384)
    args = parser.parse_args()

    setup_jax()
    import jax
    import jax.numpy as jnp

    from spsnet_tpu.config import EDict, cfg_from_yaml_file
    from spsnet_tpu.models import build_detector

    cfg = EDict()
    cfg_from_yaml_file(args.cfg_file, cfg)
    model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES))

    rng = np.random.default_rng(0)
    points = jnp.asarray(rng.uniform(
        -35, 35, size=(args.batch_size, args.num_points, 4)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), {'points': points},
                           train=False)
    n_params = sum(np.prod(np.shape(p)) for p in
                   jax.tree_util.tree_leaves(variables['params']))

    def fwd(variables, points):
        out = model.apply(variables, {'points': points}, train=False)
        return out['batch_box_preds']

    lowered = jax.jit(fwd).lower(variables, points)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = cost.get('flops', float('nan'))
    print(f'params: {n_params / 1e6:.2f} M')
    print(f'forward flops (XLA cost analysis, B={args.batch_size}): '
          f'{flops / 1e9:.2f} GFLOPs')
    for k in ('bytes accessed', 'transcendentals'):
        if k in cost:
            print(f'{k}: {cost[k]:.3e}')


if __name__ == '__main__':
    main()
