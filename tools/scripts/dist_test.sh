#!/usr/bin/env bash
# Multi-host eval launcher (see dist_train.sh for the env contract).
set -euo pipefail
cd "$(dirname "$0")/../.."
exec python tools/test.py "$@"
