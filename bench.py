"""Headline benchmark: RT-ST-GCN streaming per-frame latency on one TPU
chip, plus the bf16 train-step throughput/MFU the blueprint targets.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms/frame", "vs_baseline": N,
   "per_dispatch_ms": N, "latency_note": ...,
   "train_frames_per_s_bf16": N, "train_model_tflops": N, "train_mfu_pct": N}

Baseline for the headline metric: the reference's published RT-ST-GCN₉ fp32
per-frame latency of 20 ms (simulated CPU deployment,
/root/reference/README.md:271; BASELINE.md). ``vs_baseline`` is the speedup
factor baseline/ours (>1 = faster than the reference). The BASELINE.md
north-star target is <33 ms/frame on one core.

Two latency views, both reported (the reference times each dispatched frame
on the host, processor.py:416-419; on a remote-tunnel TPU that wall clock is
dominated by the ~30 ms dispatch RTT, which a co-located deployment would
not pay):
  value            — on-chip scan-slope per-frame latency (the hardware's
                     frame-to-frame compute latency; the deployable figure)
  per_dispatch_ms  — p50 wall clock per host-dispatched frame, the
                     reference's exact timing semantics, RTT included

The train_* fields track the other BASELINE.md target (train-step fraction
of the chip's matmul peak) — measured fwd+bwd+adam via
stgx.bench.train_throughput's on-device scan slope; model-TFLOP/s uses the
analytic per-frame MACs × 3 (bwd ≈ 2× fwd) × 2 FLOP/MAC. Through the
tunnel the backward compile can take minutes; ``--no-train`` skips it and
keeps this a quick streaming-only run.

Model: flagship RT-ST-GCN at its canonical 9-layer PKU-MMD configuration
(52 classes, 25 joints, Γ=9, channels 64→256), random weights (latency is
weight-independent), 256 streamed frames after warmup.
"""

import argparse
import json

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--no-train", action="store_true",
        help="skip the bf16 train-throughput measurement (its backward "
        "compile can take minutes through the remote tunnel)",
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from stgx.graph import load_skeleton
    from stgx.models import MODELS
    from stgx.bench.streaming import (
        measure_stream_latency,
        measure_stream_latency_onchip,
    )

    model = MODELS["rt-st-gcn"](
        num_classes=52,
        in_feat=3,
        graph=load_skeleton("pku-mmd"),
        normalization="BatchNorm",
    )
    rng = np.random.default_rng(0)
    # 32k streamed frames: the long scan then runs ~0.3 s on-device, so the
    # tunnel's ±10 ms per-dispatch RTT jitter is ~3% of the timed region and
    # the per-repeat slope samples are individually meaningful (at 2048
    # frames the 19 ms scan was jitter-sized and the repeat spread printed
    # ~250% while the min-slope headline stayed stable — r04 finding)
    frames = rng.normal(size=(32768, 25, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(frames[None, :16]))

    # streaming loop kept on-device (lax.scan over the sequential FIFO
    # recurrence): the hardware's real frame-to-frame latency, not the
    # remote-tunnel dispatch RTT. Per-repeat slope samples qualify the
    # number's own noise (r02→r03 drifted 8.5% with no spread recorded)
    per_frame_ms, lat_slopes = measure_stream_latency_onchip(
        model, "rt-st-gcn", params, frames, return_samples=True
    )
    # the reference's timing semantics: wall clock per host-dispatched frame
    # (processor.py:416-419) — RTT included, hence the caveat field
    _, dispatch_p50_ms, _, _ = measure_stream_latency(
        model, "rt-st-gcn", params, frames[:64]
    )

    result = {
        "metric": "rtstgcn9_streaming_latency",
        "value": round(per_frame_ms, 4),
        "unit": "ms/frame",
        # baseline: reference README.md:271 (RT-ST-GCN₉, fp32, per frame)
        "vs_baseline": round(20.0 / per_frame_ms, 2),
        # repeat self-qualification: median and relative spread of the
        # per-repeat scan slopes (value itself is the min-times slope —
        # tunnel jitter is one-sided, docs/PERF.md methodology)
        "value_repeat_median": round(float(np.median(lat_slopes)), 4),
        "value_repeat_spread_pct": round(
            100.0 * (max(lat_slopes) - min(lat_slopes))
            / max(float(np.median(lat_slopes)), 1e-9), 1
        ),
        "repeats": len(lat_slopes),
        "per_dispatch_ms": round(dispatch_p50_ms, 2),
        "latency_note": (
            "value = on-chip scan-slope latency (amortizes host dispatch); "
            "per_dispatch_ms = wall clock per host-dispatched frame, "
            "reference timing semantics — includes this rig's ~30 ms "
            "remote-tunnel RTT that a co-located deployment would not pay"
        ),
    }

    if not args.no_train:
        from stgx.bench.train_throughput import (
            _V5E_HBM_GBPS,
            _V5E_PEAK_TFLOPS,
            measure_train_throughput,
        )
        from stgx.utils.flops import (
            rt_stgcn_macs_per_frame,
            rt_stgcn_train_hbm_bytes_per_frame,
        )
        from stgx.utils.loss import Loss

        fps, _, fps_samples = measure_train_throughput(
            model, Loss(np.ones(52, np.float32), "logits"),
            dtype=jnp.bfloat16, return_samples=True,
        )
        tflops = fps * 3 * 2 * rt_stgcn_macs_per_frame() / 1e12
        result.update(
            train_frames_per_s_bf16=round(fps),
            train_repeat_median=round(float(np.median(fps_samples))),
            train_repeat_spread_pct=round(
                100.0 * (max(fps_samples) - min(fps_samples))
                / max(float(np.median(fps_samples)), 1e-9), 1
            ),
            train_model_tflops=round(tflops, 2),
            train_mfu_pct=round(100 * tflops / _V5E_PEAK_TFLOPS, 1),
            # the binding roofline: this model is HBM-bound (see
            # stgx.utils.flops.rt_stgcn_train_hbm_bytes_per_frame)
            train_hbm_sol_pct=round(
                100 * fps * rt_stgcn_train_hbm_bytes_per_frame()
                / (_V5E_HBM_GBPS * 1e9), 1
            ),
        )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
