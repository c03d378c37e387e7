"""Quantization latency A/B: fp32 vs int8-dynamic vs int8-static vs
weight-only int8, measured in ONE process (cross-process on-chip numbers
drift ~20% through the tunnel — CLAUDE.md).

The reference's int8 motivation is *faster/smaller* edge inference
(/root/reference/processor.py:870-982; README.md:263-272 publishes int8
latency wins on CPU). Round-2 measurement showed the dynamic-scale flow
loses latency on TPU at per-frame shapes — the per-matmul abs-max reduction
can't amortize. This A/B quantifies the two designed fixes: static
calibrated activation scales (the reference's own calibrate pass,
processor.py:909-913) and weight-only int8 (int8 weights in HBM, upcast into
the matmul — per-frame streaming re-reads every weight each frame, so weight
bytes ARE the dominant HBM stream and the activation-quant ops disappear).

Usage (real TPU):
    python -m stgx.bench.quant_ab --config configs/synth/costgcn.json
    python -m stgx.bench.quant_ab --config configs/synth/costgcn_69.json

Prints one JSON line with per-mode onchip ms/frame + the crossover verdict.
Latency is weight-value-independent, so the model runs from random init and
random frames — no dataset or checkpoint needed.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from stgx.bench.streaming import (
    measure_quant_onchip,
    measure_stream_latency_onchip,
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    # 4096 streamed frames: at per-frame latencies of tens of µs a
    # 256-frame scan's on-device time was jitter-sized (±10 ms tunnel RTT)
    # and mode deltas were noise — same conditioning fix as bench.py (r4)
    ap.add_argument("--frames", type=int, default=4096)
    ap.add_argument("--classes", type=int, default=52,
                    help="used when the config's actions file is absent")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from stgx.bench.quant import QUANT_MODELS, calibrate_scales
    from stgx.config import build_model, load_config
    from stgx.data import load_actions

    cfg = load_config(args.config)
    name = cfg["processor"]["model"]
    if name not in QUANT_MODELS:
        raise SystemExit(f"{name!r} has no quantized streaming cell")
    n_classes = args.classes
    actions_path = cfg["processor"].get("actions")
    if actions_path and os.path.exists(actions_path):
        n_classes = len(load_actions(actions_path))
    model = build_model(cfg, n_classes)

    rng = np.random.default_rng(0)
    v = model.graph["num_node"]
    frames = rng.normal(size=(args.frames, v, model.in_feat)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(frames[None, :8]))
    quantize, _, _ = QUANT_MODELS[name]
    qparams = quantize(model, params)

    fp32_ms = measure_stream_latency_onchip(
        model, name, params, frames, repeats=args.repeats
    )
    dyn_ms = measure_quant_onchip(
        model, name, qparams, frames, repeats=args.repeats, mode="dynamic"
    )
    scales = calibrate_scales(model, qparams, frames, name)
    static_ms = measure_quant_onchip(
        model, name, qparams, frames, repeats=args.repeats, mode="static",
        scales=scales,
    )
    w8_ms = measure_quant_onchip(
        model, name, qparams, frames, repeats=args.repeats, mode="w8"
    )

    modes = {"int8_dynamic": dyn_ms, "int8_static": static_ms, "w8": w8_ms}
    best = min(modes, key=modes.get)
    print(json.dumps({
        "model": name,
        "config": args.config,
        "fp32_onchip_ms": fp32_ms,
        **{f"{k}_onchip_ms": v for k, v in modes.items()},
        "best_quant_mode": best,
        "quant_beats_fp32": bool(modes[best] <= fp32_ms),
        "calibration_sites": int(len(scales)),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
