"""Vote-loss variant coverage: ver1/ver2 compute finite differentiable losses."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spsnet_tpu.config import EDict
from spsnet_tpu.models import build_detector
from spsnet_tpu.runtime.trainer import make_loss_fn
from spsnet_tpu.zoo import tiny_iassd_cfg
from tests.test_model_iassd import synthetic_batch


@pytest.mark.parametrize('vote_type', ['ver1', 'ver2'])
def test_vote_loss_variant(vote_type):
    cfg = tiny_iassd_cfg()
    cfg.POINT_HEAD.LOSS_CONFIG.LOSS_VOTE_TYPE = vote_type
    model = build_detector(cfg, num_class=3)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    full = EDict({'CLASS_NAMES': ['Car', 'Pedestrian', 'Cyclist'],
                  'MODEL': cfg})
    loss_fn = make_loss_fn(full.MODEL, 3)
    other = {k: v for k, v in variables.items() if k != 'params'}

    def compute(params):
        out, _ = model.apply({'params': params, **other}, batch, train=True,
                             mutable=['batch_stats'])
        loss, tb = loss_fn(out)
        return loss

    loss, grads = jax.value_and_grad(compute)(variables['params'])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
