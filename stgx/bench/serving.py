"""Serving capacity: concurrent real-time streams one TPU chip sustains.

The reference's deployment story is one stream on one CPU
(/root/reference/processor.py:870-982: a single simulated capture replayed
frame by frame). A TPU serving deployment runs MANY captures at once: the
streaming cell's FIFO carry is batched over a leading stream axis
(``init_stream_state(..., batch=B)``), so one dispatch advances B streams
by one frame each. This tool measures the per-step latency of that batched
cell on-device and converts it to the deployable capacity figure:

    streams(B) = B                    if step_latency(B) <= 1/fps
    capacity   = max over measured B  (largest real-time batch)

Per-step latency is measured tunnel-safely like every other bench here
(docs/PERF.md methodology): the B-stream cell is scanned L frames
on-device, one timed region = one dispatch, and the per-step cost is the
min-slope between a short and a long stream with repeat spread reported.

Numerics note: the FIFO carries never mix streams, and with
``normalization="LayerNorm"`` co-served streams are bit-independent. With
``BatchNorm`` the family's stat-recomputing BN (the BN-adaptation trick)
computes statistics over everything in the batch — so B co-served streams
*share adaptation statistics*, a deployment semantics choice: adaptation
pools over the serving population instead of a single capture (the
reference's published accuracy is batch=1, a single simulated capture,
processor.py:870-982). Both properties are pinned by
``tests/test_serving.py``.

Run (real TPU):
    python -m stgx.bench.serving [--model rt-st-gcn] [--batches 128,1024]
        [--fps 30] [--frames 512] [--dtype float32]

Prints one JSON line per batch size plus a final capacity summary.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from stgx.bench.streaming import _streaming_fns

__all__ = ["measure_stream_capacity_onchip"]


def measure_stream_capacity_onchip(model, name, params, batch: int,
                                   l_long: int = 512, repeats: int = 3,
                                   seed: int = 0, dtype=None):
    """Per-step latency (ms) of the B-stream batched streaming cell.

    Returns ``(step_ms, slopes)`` — the min-slope headline plus the
    per-repeat slope samples (the long scan runs ``l_long`` steps
    on-device, so one repeat's timed region amortizes the tunnel RTT
    ``l_long``× and the slope cancels what remains).
    """
    import jax
    import jax.numpy as jnp

    init_state, stream_step = _streaming_fns(name)
    if init_state is None:
        raise ValueError(f"{name!r} has no O(1) streaming cell")
    state = init_state(model, params, batch=batch)
    if dtype is not None:
        params = jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            params,
        )
        state = jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            state,
        )

    @jax.jit
    def run(params, state, frames):
        def body(carry, x_t):
            logits, new_state = stream_step(model, params, carry, x_t)
            return new_state, logits[0, 0]

        _, ys = jax.lax.scan(body, state, frames)
        return ys[-1]  # tiny readback forces full execution

    rng = np.random.default_rng(seed)
    v = model.graph["num_node"]
    c = model.in_feat
    frames = jnp.asarray(
        rng.normal(size=(l_long, batch, v, c)).astype(np.float32)
    )
    if dtype is not None:
        frames = frames.astype(dtype)
    l_short = max(l_long // 8, 1)

    def timed(fr):
        np.asarray(run(params, state, fr))  # compile + warm
        times = []
        for r in range(repeats):
            fr_r = fr * (1.0 + 0.01 * r)  # defeat result caching
            fr_r.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(run(params, state, fr_r))
            times.append(time.perf_counter() - t0)
        return times

    ts_short = timed(frames[:l_short])
    ts_long = timed(frames)
    scale = 1e3 / (l_long - l_short)
    step_ms = max((min(ts_long) - min(ts_short)) * scale, 0.0)
    slopes = [
        max((tl - ts) * scale, 0.0) for ts, tl in zip(ts_short, ts_long)
    ]
    return float(step_ms), slopes


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="rt-st-gcn",
                    choices=["rt-st-gcn", "co-st-gcn"])
    ap.add_argument("--batches", default="128,1024",
                    help="comma-list of concurrent-stream batch sizes")
    ap.add_argument("--fps", type=float, default=30.0,
                    help="real-time frame rate each stream must sustain")
    ap.add_argument("--frames", type=int, default=512,
                    help="on-device scan length for the long stream")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from stgx.graph import load_skeleton
    from stgx.models import MODELS

    model = MODELS[args.model](
        num_classes=52, in_feat=3, graph=load_skeleton("pku-mmd"),
        normalization="BatchNorm",
    )
    rng = np.random.default_rng(0)
    warm = rng.normal(size=(1, 16, 25, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(warm))
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

    budget_ms = 1e3 / args.fps
    capacity = 0
    results = []
    for b in (int(s) for s in args.batches.split(",")):
        step_ms, slopes = measure_stream_capacity_onchip(
            model, args.model, params, b, l_long=args.frames, dtype=dtype,
        )
        realtime = step_ms <= budget_ms
        if realtime:
            capacity = max(capacity, b)
        rec = {
            "model": args.model,
            "dtype": args.dtype,
            "streams": b,
            "step_ms": round(step_ms, 4),
            "step_repeat_spread_pct": round(
                100.0 * (max(slopes) - min(slopes))
                / max(float(np.median(slopes)), 1e-9), 1
            ),
            "frames_per_s": round(b / (step_ms * 1e-3)),
            "per_stream_budget_ms": round(budget_ms, 2),
            "realtime": realtime,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({
        "metric": f"{args.model}_concurrent_{int(args.fps)}fps_streams",
        "capacity": capacity,
        "note": (
            "largest measured batch whose per-step latency fits the "
            "per-frame budget; the true capacity is >= this (batches "
            "between the measured points were not probed)"
        ),
    }))
    return results


if __name__ == "__main__":
    main()
