#!/bin/bash
# Fetch published pretrained checkpoints listed in a manifest file.
#
# stgx counterpart of the reference's tools/get_models.sh
# (/root/reference/tools/get_models.sh:1-11): same shape — iterate a
# model-list file and download each entry into models/ — with the
# reference's bitrotted empty `link=` base URL made an explicit knob, a
# resumable download, and torch->stgx conversion hints printed at the end
# (reference checkpoints are torch .pt; import them with
# `python -m stgx.utils.torch_import`).
#
# Usage:
#   STGX_MODELS_URL=https://example.com/models/ jobs/get_models.sh
#   jobs/get_models.sh --url https://example.com/models/ \
#       [manifest=jobs/reference_models.txt] [out_dir=models/]
set -euo pipefail

base_url="${STGX_MODELS_URL:-}"
if [[ "${1:-}" == "--url" ]]; then
    base_url="$2"
    shift 2
fi
manifest="${1:-jobs/reference_models.txt}"
out_dir="${2:-models/}"

if [[ -z "$base_url" ]]; then
    echo "error: no base URL. Set STGX_MODELS_URL or pass --url <base-url>." >&2
    exit 2
fi
if [[ ! -f "$manifest" ]]; then
    echo "error: manifest $manifest not found" >&2
    exit 2
fi

mkdir -p "$out_dir"
while IFS='' read -r line || [[ -n "$line" ]]; do
    [[ -z "$line" || "$line" == \#* ]] && continue
    echo "fetching $base_url$line"
    if command -v wget >/dev/null; then
        wget -c "$base_url$line" -O "$out_dir$line"
    else
        curl -fL --retry 3 -C - "$base_url$line" -o "$out_dir$line"
    fi
done < "$manifest"

echo "done. torch checkpoints convert with:"
echo "  python -m stgx.utils.torch_import <file.pt> --model <name> --out <ckpt_dir>"
