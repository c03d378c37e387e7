"""Headline benchmark: RT-ST-GCN streaming per-frame latency on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms/frame", "vs_baseline": N}

Baseline: the reference's published RT-ST-GCN₉ fp32 per-frame latency of
20 ms (simulated CPU deployment, /root/reference/README.md:271; BASELINE.md).
``vs_baseline`` is the speedup factor baseline/ours (>1 = faster than the
reference). The BASELINE.md north-star target is <33 ms/frame on one core.

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

    baseline_ms = 20.0  # reference README.md:271 (RT-ST-GCN₉, fp32, per frame)
    print(
        json.dumps(
            {
                "metric": "rtstgcn9_streaming_latency",
                "value": round(per_frame_ms, 4),
                "unit": "ms/frame",
                "vs_baseline": round(baseline_ms / per_frame_ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
