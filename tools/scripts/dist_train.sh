#!/usr/bin/env bash
# Multi-host SPMD training launcher (replaces the reference's
# torch.distributed.launch dist_train.sh). Each host runs the SAME command;
# jax.distributed picks up coordinator/process env:
#
#   JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=$i \
#     bash tools/scripts/dist_train.sh --cfg_file tools/cfgs/kitti_models/IA-SSD.yaml
#
# On Cloud TPU pods, `gcloud compute tpus tpu-vm ssh --worker=all` runs this
# per worker and jax.distributed.initialize() auto-detects everything.
set -euo pipefail
cd "$(dirname "$0")/../.."
exec python tools/train.py "$@"
