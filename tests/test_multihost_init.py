"""REAL multi-host validation on localhost: two OS processes join one JAX
job via ``maybe_init_distributed`` (the plumbing ``tools/train.py`` uses),
form a global 2-device CPU mesh, and run a psum across the process
boundary. This exercises the actual coordinator/heartbeat/GSPMD path a
TPU pod uses — the only untestable part on one machine is ICI itself.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ['SPSNET_REPO'])
import jax
jax.config.update('jax_platforms', 'cpu')
from spsnet_tpu.utils.jax_setup import maybe_init_distributed
assert maybe_init_distributed(), 'did not join the multi-process job'
assert jax.process_count() == 2, jax.process_count()
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()), ('data',))  # 2 global CPU devices
pid = jax.process_index()
local = jnp.full((1, 4), float(pid + 1))
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P('data')), np.asarray(local), (2, 4))

@jax.jit
def total(x):
    return jnp.sum(x)

# sums data living on BOTH processes: 1*4 + 2*4 = 12
out = float(total(arr))
assert out == 12.0, out
# cross-process gather of per-process results
from jax.experimental import multihost_utils
gathered = multihost_utils.process_allgather(np.array([pid], np.int32))
assert sorted(gathered.ravel().tolist()) == [0, 1], gathered

# distributed eval merge: each process dumps its det-annos shard, process 0
# interleaves back into dataset order (runtime/trainer.py
# _merge_results_multiprocess — the GSPMD analog of the reference's
# common_utils.merge_results_dist)
from pathlib import Path
from types import SimpleNamespace
from spsnet_tpu.runtime.trainer import Trainer
annos = [{'frame_id': f'{2 * k + pid:06d}', 'score': k} for k in range(3)]
if pid == 0:
    annos.append({'frame_id': '000004', 'score': 99})   # ragged tail
fake = SimpleNamespace(output_dir=Path(os.environ['SPSNET_MERGE_DIR']))
merged = Trainer._merge_results_multiprocess(fake, annos)
if pid == 0:
    ids = [a['frame_id'] for a in merged]
    assert ids == ['000000', '000001', '000002', '000003', '000004',
                   '000005', '000004'], ids
    deduped = Trainer._dedup_by_frame_id(merged)
    assert [a['frame_id'] for a in deduped] == [
        '000000', '000001', '000002', '000003', '000004', '000005'], deduped
else:
    assert merged is None
print(f'proc {pid}: OK total={out}')
"""


def test_two_process_cpu_multihost(tmp_path):
    port = socket.socket()
    port.bind(('127.0.0.1', 0))
    addr = f'127.0.0.1:{port.getsockname()[1]}'
    port.close()

    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   SPSNET_REPO=str(REPO),
                   SPSNET_MERGE_DIR=str(tmp_path),
                   JAX_COORDINATOR_ADDRESS=addr,
                   JAX_NUM_PROCESSES='2',
                   JAX_PROCESS_ID=str(pid),
                   JAX_PLATFORMS='cpu')
        env.pop('XLA_FLAGS', None)  # one local device per process
        procs.append(subprocess.Popen(
            [sys.executable, '-c', _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    assert any('proc 0: OK total=12.0' in o for o in outs), outs
    assert any('proc 1: OK total=12.0' in o for o in outs), outs
