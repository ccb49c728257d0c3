#!/usr/bin/env bash
# SLURM multi-host SPMD evaluation (replaces the reference's srun +
# torch.distributed slurm_test.sh). One task per host; jax auto-detects
# coordinator/process-count/process-id from the SLURM_* env srun sets
# (spsnet_tpu.utils.jax_setup.maybe_init_distributed):
#
#   srun -N 4 --ntasks-per-node=1 bash tools/scripts/slurm_test.sh \
#     --cfg_file tools/cfgs/kitti_models/IA-SSD.yaml
set -euo pipefail
cd "$(dirname "$0")/../.."
exec python tools/test.py "$@"
