#!/usr/bin/env bash
# Single-host TPU VM training launch (counterpart of the reference's
# local/*.sh single-node scripts). Usage:
#   jobs/train_tpu_vm.sh configs/pku-mmd/as_is/rtstgcn.json [--set k=v ...]
set -euo pipefail
CONFIG=${1:?usage: train_tpu_vm.sh CONFIG [--set ...]}; shift || true
cd "$(dirname "$0")/.."
time python -m stgx.cli train --config "$CONFIG" "$@"
