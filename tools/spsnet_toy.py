"""Standalone 2-D toy of the SPSNet stability idea (matplotlib demo).

Rebuild of ``tools/SPSNet.py``: a tiny CVAE is trained to predict a fixed
center (the origin) from 2-D points sampled from a uniform cloud plus a
denser Gaussian blob; the per-point latent stds visualize which points the
CVAE is most/least certain about (how sharply the populations separate
depends on seed and iteration budget). The top-k by std are plotted. Same losses as the full stability
model: smooth-L1 center regression + 5e-5 * KL(q || N(0,1)) + 5e-5 * sum of
parameter L2 norms (the reference's sigma = exp(logvar) + 3e-22 quirk kept).

    python tools/spsnet_toy.py [--iters 2000] [--out ./toy]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--iters', type=int, default=2000)
    parser.add_argument('--out', type=str, default='./toy')
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import flax.linen as nn

    class ToySPSNet(nn.Module):
        @nn.compact
        def __call__(self, x, rng):
            def mlp(name, widths, h):
                for i, w in enumerate(widths):
                    h = nn.Dense(w, use_bias=False, name=f'{name}_{i}')(h)
                    if i < len(widths) - 1:
                        h = nn.relu(h)
                return h
            mu = mlp('mu', (8, 2), x)
            logvar = mlp('logvar', (8, 2), x)
            std = jnp.exp(0.5 * logvar)
            z = mu + jax.random.normal(rng, mu.shape) * std
            center = mlp('gene', (16, 2), jnp.concatenate([x, z], -1))
            return center, mu, logvar

    rng = np.random.default_rng(args.seed)
    cloud = rng.random((500, 2)).astype(np.float32)
    blob = (rng.standard_normal((100, 2)) * 0.1 + 0.5).astype(np.float32)
    data = jnp.asarray(np.concatenate([cloud, blob]))
    gt = jnp.zeros_like(data)

    model = ToySPSNet()
    params = model.init(jax.random.PRNGKey(args.seed), data,
                        jax.random.PRNGKey(1))
    tx = optax.adamw(1e-3, weight_decay=1e-3)
    opt_state = tx.init(params)

    def smooth_l1(d):
        a = jnp.abs(d)
        return jnp.where(a < 1.0, 0.5 * a * a, a - 0.5)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            center, mu, logvar = model.apply(p, data, key)
            reg = jnp.mean(smooth_l1(center - gt))
            sigma = jnp.exp(logvar) + 3e-22
            kl = jnp.mean(jnp.sum(
                -jnp.log(sigma) + (sigma ** 2 + mu ** 2) / 2 - 0.5, -1))
            l2 = sum(jnp.sqrt(jnp.sum(w ** 2) + 1e-12)
                     for w in jax.tree_util.tree_leaves(p))
            return reg + 5e-5 * kl + 5e-5 * l2
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(2)
    for i in range(args.iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if i % 200 == 0:
            print(f'iter {i}: loss {float(loss):.4f}')

    _, mu, logvar = model.apply(params, data, jax.random.PRNGKey(3))
    stds = np.asarray(jnp.sum(jnp.exp(0.5 * logvar), axis=-1))
    topk = np.argsort(stds)[:100]          # lowest-uncertainty points

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    d = np.asarray(data)
    plt.figure(0)
    plt.scatter(d[:500, 0], d[:500, 1], c='r', s=8)
    plt.scatter(d[500:, 0], d[500:, 1], c='blue', s=8)
    plt.savefig(out / 'data.png', dpi=200)
    plt.figure(1)
    plt.scatter(d[topk, 0], d[topk, 1], c=stds[topk], cmap='rainbow', s=12)
    plt.colorbar()
    plt.savefig(out / 'topk.png', dpi=200)
    lo_blob = (topk >= 500).mean()
    hi_blob = (np.argsort(stds)[-100:] >= 500).mean()
    print(f'blob share of 100 LOWEST-std points: {lo_blob:.0%}; '
          f'of 100 HIGHEST-std: {hi_blob:.0%}')
    print(f'wrote {out}/data.png, {out}/topk.png')


if __name__ == '__main__':
    main()
