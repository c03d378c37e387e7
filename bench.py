"""Headline benchmark: RT-ST-GCN streaming per-frame latency on one TPU
chip, plus the bf16 train-step throughput/MFU the blueprint targets.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms/frame", "vs_baseline": N,
   "train_frames_per_s_bf16": N, "train_model_tflops": N, "train_mfu_pct": N}

Baseline for the headline metric: the reference's published RT-ST-GCN₉ fp32
per-frame latency of 20 ms (simulated CPU deployment,
/root/reference/README.md:271; BASELINE.md). ``vs_baseline`` is the speedup
factor baseline/ours (>1 = faster than the reference). The BASELINE.md
north-star target is <33 ms/frame on one core. The train_* fields track the
other BASELINE.md target (train-step fraction of the chip's matmul peak) —
measured fwd+bwd+adam via stgx.bench.train_throughput's on-device scan
slope; model-TFLOP/s uses the analytic per-frame MACs × 3 (bwd ≈ 2× fwd)
× 2 FLOP/MAC.

Model: flagship RT-ST-GCN at its canonical 9-layer PKU-MMD configuration
(52 classes, 25 joints, Γ=9, channels 64→256), random weights (latency is
weight-independent), 256 streamed frames after warmup.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from stgx.graph import load_skeleton
    from stgx.models import MODELS
    from stgx.bench.streaming import measure_stream_latency_onchip
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

    model = MODELS["rt-st-gcn"](
        num_classes=52,
        in_feat=3,
        graph=load_skeleton("pku-mmd"),
        normalization="BatchNorm",
    )
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(2048, 25, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(frames[None, :16]))

    # streaming loop kept on-device (lax.scan over the sequential FIFO
    # recurrence): the hardware's real frame-to-frame latency, not the
    # remote-tunnel dispatch RTT
    per_frame_ms = measure_stream_latency_onchip(
        model, "rt-st-gcn", params, frames
    )

    fps, _ = measure_train_throughput(
        model, Loss(np.ones(52, np.float32), "logits"), dtype=jnp.bfloat16
    )
    tflops = fps * 3 * 2 * rt_stgcn_macs_per_frame() / 1e12

    baseline_ms = 20.0  # reference README.md:271 (RT-ST-GCN₉, fp32, per frame)
    print(
        json.dumps(
            {
                "metric": "rtstgcn9_streaming_latency",
                "value": round(per_frame_ms, 4),
                "unit": "ms/frame",
                "vs_baseline": round(baseline_ms / per_frame_ms, 2),
                "train_frames_per_s_bf16": round(fps),
                "train_model_tflops": round(tflops, 2),
                "train_mfu_pct": round(100 * tflops / _V5E_PEAK_TFLOPS, 1),
                # the binding roofline: this model is HBM-bound (see
                # stgx.utils.flops.rt_stgcn_train_hbm_bytes_per_frame)
                "train_hbm_sol_pct": round(
                    100 * fps * rt_stgcn_train_hbm_bytes_per_frame()
                    / (_V5E_HBM_GBPS * 1e9), 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
