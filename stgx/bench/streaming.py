"""Streaming (continual) inference benchmark: per-frame latency, model size,
accuracy — the stgx counterpart of the reference's simulated-deployment
benchmark (/root/reference/processor.py:870-982, README.md:263-272).

The deployed realtime loop is: jit the one-frame streaming cell once, then
call it per arriving frame, threading the FIFO carry. Two latency views are
reported: per-dispatch wall clock exactly like the reference's
``_forward_rt`` timing (processor.py:416-419) — which through a remote TPU
tunnel is dominated by the ~30 ms RTT — and the on-chip per-frame latency
measured as the slope of a device-resident ``lax.scan`` stream.
"""

from __future__ import annotations

import csv
import json
import os
import time

import numpy as np

__all__ = ["run_streaming_benchmark", "measure_stream_latency", "param_bytes"]


def param_bytes(params) -> int:
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


WINDOW_MODELS = (
    "st-gcn", "aa-gcn", "shift-gcn", "shift-gcn++", "shift-gcn++-teacher"
)


def _quant_models():
    from stgx.bench.quant import QUANT_MODELS

    return QUANT_MODELS


def _streaming_fns(name):
    if name == "rt-st-gcn":
        from stgx.models import rtstgcn as mod
    elif name == "co-st-gcn":
        from stgx.models import costgcn as mod
    elif name in WINDOW_MODELS:
        # window classifiers stream by re-running the window per frame
        # (reference WindowSegment.get_segment_rt, segment_generator.py:147-149)
        return None, None
    else:
        raise ValueError(f"no streaming form for model {name!r}")
    return mod.init_stream_state, mod.stream_step


def _window_stream_fns(model, window: int):
    import jax
    import jax.numpy as jnp

    def init_state(model_, params, batch=1, dtype=jnp.float32):
        v = model_.graph["num_node"]
        c = model_.in_feat
        return {"buf": jnp.zeros((batch, window, v, c), dtype=dtype)}

    def stream_step(model_, params, state, x_t):
        buf = jnp.roll(state["buf"], -1, axis=1).at[:, -1].set(x_t)
        out = model_.apply(params, buf)
        if isinstance(out, tuple):
            out = out[0]
        return out, {"buf": buf}

    return init_state, stream_step


def measure_stream_latency(model, name, params, frames, warmup: int = 20,
                           window: int = 50):
    """Per-frame latency stats over a ``(L, V, C)`` capture.

    Returns (mean_ms, p50_ms, p99_ms, logits (L, classes)).
    """
    import jax
    import jax.numpy as jnp

    init_state, stream_step = _streaming_fns(name)
    if init_state is None:
        init_state, stream_step = _window_stream_fns(model, window)
    state = init_state(model, params, batch=1)

    @jax.jit
    def step(params, state, x_t):
        return stream_step(model, params, state, x_t)

    frames = jnp.asarray(frames)
    # compile + warm up on the first frame
    for _ in range(max(warmup, 1)):
        logits, st = step(params, state, frames[0][None])
        jax.block_until_ready(logits)

    outs = []
    times = []
    for t in range(frames.shape[0]):
        x_t = frames[t][None]
        t0 = time.perf_counter()
        logits, state = step(params, state, x_t)
        jax.block_until_ready(logits)
        times.append(time.perf_counter() - t0)
        outs.append(np.asarray(logits)[0])
    times_ms = np.asarray(times) * 1e3
    return (
        float(times_ms.mean()),
        float(np.percentile(times_ms, 50)),
        float(np.percentile(times_ms, 99)),
        np.stack(outs),
    )


def measure_stream_latency_onchip(model, name, params, frames, repeats: int = 4,
                                  window: int = 50, return_samples=False):
    """Amortized per-frame latency with the streaming loop kept on-device.

    The per-frame recurrence (FIFO carry) stays strictly sequential inside a
    ``lax.scan``, so this measures the hardware's real frame-to-frame compute
    latency. Two defenses against the remote-TPU tunnel's measurement traps:
    results are read back to host inside the timed region (async dispatch
    otherwise returns before execution), and the per-frame cost is taken as
    the **slope** between a short and a long stream, cancelling the fixed
    per-call RTT (~30 ms through the tunnel).

    The headline value is the slope of the minimum times per length (tunnel
    jitter is one-sided — docs/PERF.md methodology). With
    ``return_samples=True`` also returns the per-repeat slope list (r-th
    short paired with r-th long dispatch) so callers can report the repeat
    spread alongside the value instead of a bare point estimate.
    """
    import jax
    import jax.numpy as jnp

    init_state, stream_step = _streaming_fns(name)
    if init_state is None:
        init_state, stream_step = _window_stream_fns(model, window)
    state = init_state(model, params, batch=1)

    @jax.jit
    def run(params, state, frames):
        def body(carry, x_t):
            logits, new_state = stream_step(model, params, carry, x_t[None])
            return new_state, logits

        final, ys = jax.lax.scan(body, state, frames)
        return ys[-1]  # small readback forces full execution

    frames = jnp.asarray(frames)
    l_long = frames.shape[0]
    l_short = max(l_long // 8, 1)

    def timed(fr):
        np.asarray(run(params, state, fr))  # compile + warm
        times = []
        for r in range(repeats):
            fr_r = fr * (1.0 + 0.01 * (r + 1))  # differ from warm-up too
            np.asarray(fr_r)
            t0 = time.perf_counter()
            np.asarray(run(params, state, fr_r))
            times.append(time.perf_counter() - t0)
        return times

    if l_long <= l_short:
        # degenerate stream (e.g. a 1-frame trial): no slope to take —
        # report the single-dispatch wall time, RTT included
        val = float(min(timed(frames)) * 1e3 / max(l_long, 1))
        return (val, [val]) if return_samples else val
    ts_short = timed(frames[:l_short])
    ts_long = timed(frames)
    scale = 1e3 / (l_long - l_short)
    per_frame_ms = max((min(ts_long) - min(ts_short)) * scale, 0.0)
    if return_samples:
        slopes = [
            max((tl - ts) * scale, 0.0)
            for ts, tl in zip(ts_short, ts_long)
        ]
        return float(per_frame_ms), slopes
    return float(per_frame_ms)


def measure_quant_onchip(model, name, qparams, frames, repeats: int = 3,
                         mode: str = "dynamic", scales=None,
                         state_dtype=None):
    """On-chip scan-slope per-frame latency of the int8 streaming cell in a
    given quantization mode ("dynamic"/"static"/"w8" — see stgx.bench.quant).

    The ``quant_mode`` context stays open across every trace in the timed
    region (short + long streams jit separately), so static scales bind
    consistently at each trace. ``state_dtype`` picks the FIFO-state dtype
    (int8 requires mode="static"; see quant._fifo_put).
    """
    import jax
    import jax.numpy as jnp

    from stgx.bench.quant import QUANT_MODELS, quant_mode

    _, qstep_fn, qinit = QUANT_MODELS[name]
    state0 = qinit(model, dtype=state_dtype or jnp.float32)
    frames = jnp.asarray(frames)
    l_long = frames.shape[0]
    l_short = max(l_long // 8, 1)

    @jax.jit
    def qrun(qparams, state, frames):
        def body(carry, x_t):
            ql, st = qstep_fn(model, qparams, carry, x_t[None])
            return st, ql

        _, ys = jax.lax.scan(body, state, frames)
        return ys[-1]

    with quant_mode(mode, scales):
        def timed(fr):
            np.asarray(qrun(qparams, state0, fr))  # compile + warm
            best = float("inf")
            for r in range(repeats):
                fr_r = fr * (1.0 + 0.01 * (r + 1))
                np.asarray(fr_r)
                t0 = time.perf_counter()
                np.asarray(qrun(qparams, state0, fr_r))
                best = min(best, time.perf_counter() - t0)
            return best

        if l_long <= l_short:
            return float(timed(frames) * 1e3 / max(l_long, 1))
        t_short = timed(frames[:l_short])
        t_long = timed(frames)
    return float(max((t_long - t_short) / (l_long - l_short) * 1e3, 0.0))


def run_streaming_benchmark(cfg) -> int:
    """CLI entry: benchmark the configured continual model on one val trial,
    write latency.csv / model-size.csv / accuracy.csv like the reference."""
    import jax

    from stgx.config import build_model
    from stgx.data import build_datasets, load_actions
    from stgx.utils.checkpoint import latest_epoch, restore_params

    proc = cfg["processor"]
    name = proc["model"]
    out_dir = proc["out"]
    os.makedirs(out_dir, exist_ok=True)

    # same dataset construction as train/test — file- and dir-mode configs
    # both benchmark (reference _build_dataloader, processor.py:61-84)
    _, val = build_datasets(proc)
    actions = load_actions(proc["actions"])
    model = build_model(cfg, len(actions))

    x, y = val[0]
    params = model.init(jax.random.PRNGKey(0), np.asarray(x[None]))
    if proc.get("torch_checkpoint"):
        from stgx.utils.torch_import import load_reference_checkpoint

        try:
            imported = load_reference_checkpoint(
                proc["torch_checkpoint"], model, name
            )
            # validate the imported tree against init before trusting it —
            # an arch-mismatched checkpoint otherwise dies deep in apply()
            got = jax.tree_util.tree_leaves_with_path(imported)
            want = jax.tree_util.tree_leaves_with_path(params)
            got_s = {jax.tree_util.keystr(p): np.shape(l) for p, l in got}
            want_s = {jax.tree_util.keystr(p): np.shape(l) for p, l in want}
            if got_s != want_s:
                missing = sorted(set(want_s) ^ set(got_s))[:4]
                # arch mismatch is a config error: abort rather than write
                # plausible-looking artifacts from random weights
                raise SystemExit(
                    f"torch_checkpoint does not match the model arch "
                    f"(e.g. {missing}); fix the config or drop the key"
                )
            params = imported
            print(
                f"imported reference torch checkpoint {proc['torch_checkpoint']}"
            )
        except (OSError, KeyError, ValueError) as e:
            # unreadable/structurally-broken file: benchmark still runs,
            # loudly, with random weights (matching the orbax branch below)
            print(f"torch checkpoint import failed ({e}); benchmarking random init")
    else:
        ckpt = proc.get("checkpoint") or latest_epoch(out_dir)
        if ckpt and os.path.isdir(ckpt):
            try:
                params = restore_params(ckpt, params)
            except Exception as e:  # benchmark still runs with random weights
                print(f"checkpoint load failed ({e}); benchmarking random init")

    n_frames = min(len(x), 256)
    mean_ms, p50_ms, p99_ms, logits = measure_stream_latency(
        model, name, params, x[:n_frames],
        window=cfg["arch"].get("receptive_field", 50),
    )
    top1 = logits.argmax(-1)
    acc = float((top1 == y[:n_frames]).mean())
    size_mb = param_bytes(params) / 1e6
    # the dispatch-free view: through the remote tunnel the wall numbers
    # above are dominated by the ~30 ms per-call RTT, so also report the
    # on-device scan-slope per-frame latency (the deployable figure)
    onchip_ms = measure_stream_latency_onchip(
        model, name, params, x[:n_frames],
        window=cfg["arch"].get("receptive_field", 50),
    )

    # int8 PTQ pass over every model with a continual cell (reference's flow
    # is model-generic, processor.py:905-939; its published table includes
    # both RT-ST-GCN and CoST-GCN int8 rows, README.md:269-270)
    int8 = {}
    if name in _quant_models():
        import time as _time

        import jax
        import jax.numpy as jnp

        from stgx.bench.quant import QUANT_MODELS, quantized_size_bytes

        quantize, qstep_fn, qinit = QUANT_MODELS[name]
        qparams = quantize(model, params)
        try:  # window models size their re-run buffer from the config
            qstate = qinit(
                model, window=cfg["arch"].get("receptive_field", 50)
            )
        except TypeError:
            qstate = qinit(model)

        @jax.jit
        def qstep(qparams, state, x_t):
            return qstep_fn(model, qparams, state, x_t)

        frames_q = jnp.asarray(x[:n_frames])
        for _ in range(10):  # warm
            ql, qs = qstep(qparams, qstate, frames_q[0][None])
            jax.block_until_ready(ql)
        qtimes, qouts = [], []
        st = qstate
        for t in range(n_frames):
            t0 = _time.perf_counter()
            ql, st = qstep(qparams, st, frames_q[t][None])
            jax.block_until_ready(ql)
            qtimes.append(_time.perf_counter() - t0)
            qouts.append(np.asarray(ql)[0])
        q_top1 = np.stack(qouts).argmax(-1)

        # on-chip amortized latency (same scan-slope method as fp32), one
        # row per quantization mode: dynamic per-tensor scales, static
        # calibrated scales (the reference's own calibrate pass,
        # processor.py:909-913), and weight-only int8 — measured in THIS
        # process so the numbers are comparable
        from stgx.bench.quant import calibrate_scales

        int8_onchip = measure_quant_onchip(
            model, name, qparams, frames_q, mode="dynamic"
        )
        scales = calibrate_scales(model, qparams, frames_q, name)
        int8_static_onchip = measure_quant_onchip(
            model, name, qparams, frames_q, mode="static", scales=scales
        )
        w8_onchip = measure_quant_onchip(
            model, name, qparams, frames_q, mode="w8"
        )
        int8 = {
            "int8_p50_ms": float(np.percentile(np.asarray(qtimes) * 1e3, 50)),
            "int8_onchip_ms": float(int8_onchip),
            "int8_static_onchip_ms": float(int8_static_onchip),
            "w8_onchip_ms": float(w8_onchip),
            "int8_top1": float((q_top1 == y[:n_frames]).mean()),
            "int8_size_mb": quantized_size_bytes(qparams) / 1e6,
            "int8_agrees_fp32": float((q_top1 == top1).mean()),
        }

    with open(os.path.join(out_dir, "latency.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            ["mean_ms", "p50_ms", "p99_ms", "onchip_ms", "frames",
             "int8_p50_ms", "int8_onchip_ms", "int8_static_onchip_ms",
             "w8_onchip_ms"]
        )
        w.writerow(
            [mean_ms, p50_ms, p99_ms, onchip_ms, n_frames,
             int8.get("int8_p50_ms"), int8.get("int8_onchip_ms"),
             int8.get("int8_static_onchip_ms"), int8.get("w8_onchip_ms")]
        )
    with open(os.path.join(out_dir, "model-size.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["fp32_mb", "int8_mb"])
        w.writerow([size_mb, int8.get("int8_size_mb")])

    print(
        json.dumps(
            {
                "model": name,
                "latency_ms_per_frame": mean_ms,
                "p50_ms": p50_ms,
                "p99_ms": p99_ms,
                "onchip_ms": float(onchip_ms),
                "top1": acc,
                "model_size_mb": size_mb,
                **int8,
            }
        )
    )
    return 0
