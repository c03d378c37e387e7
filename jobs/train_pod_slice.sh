#!/usr/bin/env bash
# Multi-host TPU pod-slice launch (counterpart of the reference's vsc/*.slurm
# 4-GPU jobs). Run the SAME command on every host of the slice, e.g. via
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all --command="bash ~/repo/jobs/train_pod_slice.sh CONFIG"
# jax.distributed.initialize() picks up the TPU topology automatically; the
# (data, seq) mesh then spans all hosts and GSPMD handles the collectives.
set -euo pipefail
CONFIG=${1:?usage: train_pod_slice.sh CONFIG [--set ...]}; shift || true
cd "$(dirname "$0")/.."
export STGX_DISTRIBUTED=1
time python -m stgx.cli train --config "$CONFIG" --set job.distributed=true "$@"
