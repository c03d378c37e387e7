#!/bin/bash
# Fetch a dataset archive and unpack it under data/.
#
# stgx counterpart of the reference's tools/get_data.sh, which ships as a
# bare shebang (/root/reference/tools/get_data.sh:1 — bitrotted empty);
# this implements the evident intent: pull the PKU-MMD (or any) archive
# from a configurable mirror and leave it where stgx's offline prep
# (`python -m stgx.data.prep pku-mmd ...`) expects raw trials.
#
# Usage:
#   STGX_DATA_URL=https://example.com/pku-mmd.tar.gz jobs/get_data.sh [out_dir]
#   jobs/get_data.sh --url https://example.com/pku-mmd.tar.gz data/raw
#
# The archive URL is deliberately not baked in: PKU-MMD distribution terms
# require registering with the dataset owners (same reason the reference
# left its link blank — we make the knob explicit instead of shipping a
# broken default).
set -euo pipefail

url="${STGX_DATA_URL:-}"
if [[ "${1:-}" == "--url" ]]; then
    url="$2"
    shift 2
fi
out_dir="${1:-data/raw}"

if [[ -z "$url" ]]; then
    echo "error: no dataset URL. Set STGX_DATA_URL or pass --url <archive-url>." >&2
    echo "After download, run: python -m stgx.data.prep pku-mmd --data $out_dir ..." >&2
    exit 2
fi

mkdir -p "$out_dir"
archive="$out_dir/$(basename "$url")"
echo "fetching $url -> $archive"
if command -v wget >/dev/null; then
    wget -c "$url" -O "$archive"
else
    curl -fL --retry 3 -C - "$url" -o "$archive"
fi

case "$archive" in
    *.tar.gz|*.tgz) tar -xzf "$archive" -C "$out_dir" ;;
    *.tar)          tar -xf "$archive" -C "$out_dir" ;;
    *.zip)          unzip -o -q "$archive" -d "$out_dir" ;;
    *)              echo "downloaded (no auto-unpack for this extension)" ;;
esac
echo "done: $out_dir"
