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

with an optional ``--bisect`` refinement that binary-searches the
real-time boundary to ±``--resolution`` streams.

Per-step latency is measured tunnel-safely like every other bench here
(docs/PERF.md methodology): the B-stream cell is scanned L frames
on-device, one timed region = one dispatch, and the per-step cost is the
min-slope between a short and a long stream with repeat spread reported.

Cell variants (the serving step is bound by per-layer FIFO state
read+write, which scales linearly with B — docs/PERF.md round-4 audit):

* ``--dtype float32|bfloat16`` — the plain cell with params AND state in
  that dtype (bf16 halves state bytes ≈ halves the step).
* ``--quant int8-static [--state-dtype float32|bfloat16|int8]`` — the
  int8 cell (static calibrated scales, stgx/bench/quant.py) with the FIFO
  state held in ``--state-dtype``; int8 state quarters the state bytes vs
  fp32. ``--check-drift`` streams the same capture through the fp32 cell
  and the chosen variant and reports max logit drift + top-1 agreement
  (the FIFO stores each frame once, so storage rounding does not compound
  across frames — see quant._quant_acc_step).

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
        [--quant int8-static --state-dtype int8] [--bisect] [--check-drift]

Prints one JSON line per batch size plus a final capacity summary.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import time

import numpy as np

__all__ = [
    "measure_stream_capacity_onchip",
    "bisect_capacity",
    "check_stream_drift",
]


def _serving_cell(model, name, params, batch, dtype=None, quant=None,
                  state_dtype=None, scales=None):
    """Build the (state0, step_fn, params_like, trace_ctx) for one serving
    variant. ``quant=None`` is the plain fp32/bf16 cell; ``"int8-static"``
    is the int8 cell under calibrated ``scales`` with FIFO state held in
    ``state_dtype`` (stgx/bench/quant.py)."""
    import jax
    import jax.numpy as jnp

    from stgx.bench.streaming import _streaming_fns

    if quant is None:
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

        def step(p, s, x_t):
            return stream_step(model, p, s, x_t)

        return state, step, params, contextlib.nullcontext()

    if quant != "int8-static":
        raise ValueError(f"unknown quant mode {quant!r}")
    from stgx.bench.quant import QUANT_MODELS, quant_mode

    if scales is None:
        raise ValueError("int8-static serving needs calibrated scales")
    quantize, qstep_fn, qinit = QUANT_MODELS[name]
    qparams = quantize(model, params)
    state = qinit(model, batch=batch, dtype=state_dtype or jnp.float32)

    def step(p, s, x_t):
        return qstep_fn(model, p, s, x_t)

    return state, step, qparams, quant_mode("static", scales)


def measure_stream_capacity_onchip(model, name, params, batch: int,
                                   l_long: int = 512, repeats: int = 3,
                                   seed: int = 0, dtype=None, quant=None,
                                   state_dtype=None, scales=None,
                                   timer=time.perf_counter):
    """Per-step latency (ms) of the B-stream batched streaming cell.

    Returns ``(step_ms, slopes)`` — the min-slope headline plus the
    per-repeat slope samples (the long scan runs ``l_long`` steps
    on-device, so one repeat's timed region amortizes the tunnel RTT
    ``l_long``× and the slope cancels what remains). ``timer`` is
    injectable so tests can pin the slope arithmetic on fake clocks.
    """
    import jax
    import jax.numpy as jnp

    if l_long < 2:
        raise ValueError(
            f"l_long must be >= 2 for a slope (got {l_long}): the per-step "
            "cost is the slope between a short and a long on-device scan"
        )
    state, stream_step, params, ctx = _serving_cell(
        model, name, params, batch, dtype=dtype, quant=quant,
        state_dtype=state_dtype, scales=scales,
    )

    @jax.jit
    def run(params, state, frames):
        def body(carry, x_t):
            logits, new_state = stream_step(params, carry, x_t)
            return new_state, logits[0, 0]

        _, ys = jax.lax.scan(body, state, frames)
        return ys[-1]  # tiny readback forces full execution

    rng = np.random.default_rng(seed)
    v = model.graph["num_node"]
    c = model.in_feat
    frames = jnp.asarray(
        rng.normal(size=(l_long, batch, v, c)).astype(np.float32)
    )
    if dtype is not None and quant is None:
        frames = frames.astype(dtype)
    l_short = max(l_long // 8, 1)

    def timed(fr):
        np.asarray(run(params, state, fr))  # compile + warm
        times = []
        for r in range(repeats):
            # perturb inputs between repeats ((r+1): repeat 0 must differ
            # from the warm-up run too)
            fr_r = fr * (1.0 + 0.01 * (r + 1))
            fr_r.block_until_ready()
            t0 = timer()
            np.asarray(run(params, state, fr_r))
            times.append(timer() - t0)
        return times

    with ctx:
        ts_short = timed(frames[:l_short])
        ts_long = timed(frames)
    # drop this probe's executables: stale programs from earlier batch
    # sizes in the same sweep otherwise accumulate device memory until a
    # later compile OOMs spuriously (seen at Γ=69 bf16: B=1024 "OOMed"
    # mid-bisect yet runs fine in a fresh process); no reuse is lost —
    # every probe has a different batch shape
    jax.clear_caches()
    scale = 1e3 / (l_long - l_short)
    step_ms = max((min(ts_long) - min(ts_short)) * scale, 0.0)
    slopes = [
        max((tl - ts) * scale, 0.0) for ts, tl in zip(ts_short, ts_long)
    ]
    return float(step_ms), slopes


def bisect_capacity(probe_ms, lo: int, hi: int, budget_ms: float,
                    resolution: int = 128):
    """Binary-search the real-time boundary: largest B with
    ``probe_ms(B) <= budget_ms``, assuming step latency is monotone in B.

    ``lo`` must already be known real-time (or 0) and ``hi`` known late.
    Returns ``(capacity_lo, first_late_hi)`` with
    ``first_late_hi - capacity_lo <= resolution``.
    """
    if hi - lo <= resolution:
        return lo, hi
    while hi - lo > resolution:
        mid = (lo + hi) // 2
        # keep probes on resolution multiples so reported capacity is tidy
        mid -= mid % resolution
        if mid <= lo or mid >= hi:
            break
        if probe_ms(mid) <= budget_ms:
            lo = mid
        else:
            hi = mid
    return lo, hi


def check_stream_drift(model, name, params, l: int = 256, batch: int = 4,
                       seed: int = 0, quant=None, state_dtype=None,
                       scales=None, dtype=None):
    """Stream the same capture through the fp32 reference cell and the
    chosen serving variant; returns drift stats of the per-frame logits.

    This is the numerics side of the state-dtype lever: each FIFO slot is
    quantized once at write (not re-accumulated), so the drift should stay
    bounded across the stream rather than grow with it.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    v = model.graph["num_node"]
    c = model.in_feat
    frames = jnp.asarray(
        rng.normal(size=(l, batch, v, c)).astype(np.float32)
    )

    def run_variant(quant_, state_dtype_, dtype_):
        state, step, p, ctx = _serving_cell(
            model, name, params, batch, dtype=dtype_, quant=quant_,
            state_dtype=state_dtype_, scales=scales,
        )
        fr = frames.astype(dtype_) if dtype_ is not None else frames

        @jax.jit
        def run(p, state, fr):
            def body(carry, x_t):
                logits, new_state = step(p, carry, x_t)
                return new_state, logits

            _, ys = jax.lax.scan(body, state, fr)
            return ys

        with ctx:
            return np.asarray(run(p, state, fr), np.float32)

    ref = run_variant(None, None, None)
    got = run_variant(quant, state_dtype, dtype)
    err = np.abs(got - ref)
    denom = np.maximum(np.abs(ref).max(), 1e-9)
    half = l // 2
    return {
        "max_abs_drift": float(err.max()),
        "max_rel_drift": float(err.max() / denom),
        # bounded-vs-compounding check: late-stream drift vs early-stream
        "max_abs_drift_first_half": float(err[:half].max()),
        "max_abs_drift_second_half": float(err[half:].max()),
        "top1_agreement": float(
            (got.argmax(-1) == ref.argmax(-1)).mean()
        ),
    }


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
    ap.add_argument("--quant", default=None, choices=["int8-static"],
                    help="measure the int8 streaming cell instead of the "
                    "plain one (static calibrated scales)")
    ap.add_argument("--state-dtype", default=None,
                    choices=["float32", "bfloat16", "int8"],
                    help="FIFO-state dtype for the quantized cell "
                    "(state bytes bind the serving step)")
    ap.add_argument("--kernel", type=int, default=None,
                    help="temporal kernel Γ override (default: the model's)")
    ap.add_argument("--bisect", action="store_true",
                    help="binary-search the real-time boundary between the "
                    "largest real-time and smallest late measured batch")
    ap.add_argument("--resolution", type=int, default=128,
                    help="bisection resolution in streams")
    ap.add_argument("--check-drift", action="store_true",
                    help="also stream one capture through fp32 and the "
                    "chosen variant and report logit drift stats")
    ap.add_argument("--acc-step-impls", default=None,
                    help="comma-list of streaming-accumulator forms to A/B "
                    "in THIS process (taps,fifo_sum — stgx/ops/temporal.py); "
                    "default: leave the global default untouched")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from stgx.graph import load_skeleton
    from stgx.models import MODELS

    kw = {}
    if args.kernel is not None:
        kw["kernel"] = args.kernel
    model = MODELS[args.model](
        num_classes=52, in_feat=3, graph=load_skeleton("pku-mmd"),
        normalization="BatchNorm", **kw,
    )
    rng = np.random.default_rng(0)
    warm = rng.normal(size=(1, 16, 25, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(warm))
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

    scales = None
    state_dtype = None
    variant = {"model": args.model, "dtype": args.dtype}
    if args.quant:
        from stgx.bench.quant import QUANT_MODELS, calibrate_scales

        state_dtype = {
            "float32": jnp.float32, "bfloat16": jnp.bfloat16,
            "int8": jnp.int8, None: jnp.float32,
        }[args.state_dtype]
        quantize, _, _ = QUANT_MODELS[args.model]
        qparams = quantize(model, params)
        calib = rng.normal(size=(256, 25, 3)).astype(np.float32)
        scales = calibrate_scales(model, qparams, calib, args.model)
        variant.update(quant=args.quant,
                       state_dtype=args.state_dtype or "float32")
        dtype = None  # the quant cell manages its own dtypes

    if args.check_drift:
        drift = check_stream_drift(
            model, args.model, params, quant=args.quant,
            state_dtype=state_dtype, scales=scales, dtype=dtype,
        )
        print(json.dumps({**variant, "drift": drift}), flush=True)

    budget_ms = 1e3 / args.fps
    impls = (args.acc_step_impls or "").split(",") if args.acc_step_impls \
        else [None]

    def probe(b):
        from stgx.ops.temporal import get_acc_step_impl, set_acc_step_impl

        by_impl = {}
        saved = get_acc_step_impl()
        try:
            for impl in impls:
                if impl is not None:
                    set_acc_step_impl(impl)
                by_impl[impl] = measure_stream_capacity_onchip(
                    model, args.model, params, b, l_long=args.frames,
                    dtype=dtype, quant=args.quant, state_dtype=state_dtype,
                    scales=scales,
                )
        except Exception as e:
            # runtime OOM reports RESOURCE_EXHAUSTED; the tunnel's AOT
            # compiler reports a compile-time "Ran out of memory ... hbm"
            if ("RESOURCE_EXHAUSTED" not in str(e)
                    and "Ran out of memory" not in str(e)):
                raise
            # B streams' FIFO state exceeds HBM: report as the memory
            # ceiling (late forever) rather than crashing the sweep
            rec = {**variant, "streams": b, "oom": True, "realtime": False}
            print(json.dumps(rec), flush=True)
            return float("inf"), rec
        finally:
            set_acc_step_impl(saved)
        if len(by_impl) > 1:
            print(json.dumps({
                **variant, "streams": b,
                "acc_step_ab_ms": {
                    k: round(v[0], 4) for k, v in by_impl.items()
                },
            }), flush=True)
        step_ms, slopes = by_impl[impls[0]]
        rec = {
            **variant,
            "streams": b,
            "step_ms": round(step_ms, 4),
            "step_repeat_spread_pct": round(
                100.0 * (max(slopes) - min(slopes))
                / max(float(np.median(slopes)), 1e-9), 1
            ),
            "frames_per_s": round(b / (step_ms * 1e-3)),
            "per_stream_budget_ms": round(budget_ms, 2),
            "realtime": step_ms <= budget_ms,
        }
        print(json.dumps(rec), flush=True)
        return step_ms, rec

    capacity, first_late = 0, None
    results = []
    for b in (int(s) for s in args.batches.split(",")):
        step_ms, rec = probe(b)
        results.append(rec)
        if rec["realtime"]:
            capacity = max(capacity, b)
        else:
            first_late = b if first_late is None else min(first_late, b)

    note = (
        "largest measured batch whose per-step latency fits the per-frame "
        "budget; batches between the measured points were not probed"
    )
    if args.bisect and first_late is not None and first_late > capacity:
        capacity, first_late = bisect_capacity(
            lambda b: probe(b)[0], capacity, first_late, budget_ms,
            resolution=args.resolution,
        )
        note = (
            f"bisected real-time boundary: capacity is in "
            f"[{capacity}, {first_late})"
        )
    print(json.dumps({
        "metric": f"{args.model}_concurrent_{int(args.fps)}fps_streams",
        **{k: v for k, v in variant.items() if k != "model"},
        "capacity": capacity,
        "note": note,
    }))
    return results


if __name__ == "__main__":
    main()
