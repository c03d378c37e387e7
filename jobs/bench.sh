#!/usr/bin/env bash
# Streaming-latency + int8 benchmark on the current host's chip.
set -euo pipefail
CONFIG=${1:?usage: bench.sh CONFIG}; shift || true
cd "$(dirname "$0")/.."
python -m stgx.cli benchmark --config "$CONFIG" "$@"
python bench.py
