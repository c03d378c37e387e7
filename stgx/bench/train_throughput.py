"""Training-step throughput + rooflines (rt-st-gcn / co-st-gcn / st-gcn).

Measures one-chip jitted train-step frames/s (fwd + bwd + adam) at each
family's canonical PKU-MMD configuration and reports the achieved fraction
of the chip's matmul peak — plus, for rt-st-gcn, the binding HBM roofline
(the model is memory-bound; docs/PERF.md) — using the analytic MACs
counters (stgx/utils/flops.py; the reference publishes the same figures,
/root/reference/README.md:263-272).

Tunnel-TPU-safe measurement (see .claude/skills/verify): the step is
scanned S times on-device so one timed region is one dispatch, host
readback forces completion, and the slope between two scan lengths cancels
the per-dispatch RTT and its jitter.

Run: ``python -m stgx.bench.train_throughput [--dtype bfloat16] [--remat]``
"""

from __future__ import annotations

import argparse
import time

import numpy as np

__all__ = ["measure_train_throughput"]

# MXU peak for one TPU v5e chip (bf16 inputs — also what fp32 matmuls feed
# at default precision). Override via --peak-tflops for other chips.
_V5E_PEAK_TFLOPS = 197.0
# HBM bandwidth for one v5e chip — the binding roofline for this model's
# small-channel matmuls (see stgx.utils.flops.rt_stgcn_train_hbm_bytes_per_frame)
_V5E_HBM_GBPS = 819.0


def measure_train_throughput(
    model, loss, frames_per_trial=1024, trials=8, scan_lengths=(2, 10),
    dtype=None, iters=3, seed=0, fwd_only=False, use_mask=True,
    kind="frame", return_samples=False, compiler_options=None,
):
    """Returns (frames_per_second, seconds_per_step) — and, with
    ``return_samples=True``, a third element: the per-repeat frames/s list
    (i-th short-scan dispatch paired with i-th long-scan dispatch), so the
    caller can report the scan-slope repeat spread next to the headline.

    The train step runs ``S`` times *on-device* inside one ``lax.scan``
    (params/opt-state threaded as the carry), so a timed region is a single
    dispatch; per-step cost is the slope between the two ``scan_lengths``.
    Per-dispatch host costs — the tunnel's ~30 ms RTT *and its jitter*,
    which drowned a per-step slope taken across separate dispatches (20%
    drift between repeats of the same variant in one process) — cancel in
    the on-device slope. ``iters`` timed dispatches per length; the minimum
    is kept (jitter is one-sided). ``fwd_only`` drops the grad/adam half
    (forward + loss only) for ablation; the carry then threads the loss back
    in so the scan body isn't hoisted. ``compiler_options`` (a dict of XLA
    backend flags, e.g. ``{"xla_tpu_scoped_vmem_limit_kib": "65536"}``) is
    passed to the AOT ``.compile()`` — this is how ``stgx.bench.xla_probe``
    A/Bs scheduler/fusion flags WITHIN one process (env-var XLA_FLAGS would
    force cross-process comparisons, which drift ~20% on the tunnel)."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    tx = optax.adam(1e-4)
    l_frames = frames_per_trial

    def train_step(params, opt_state, x, y, mask):
        if not use_mask:
            # ungated path for full buckets (mask statically all-ones —
            # the Trainer's mask-elision case)
            mask = None

        def loss_fn(p):
            if dtype is not None:
                p = jax.tree.map(
                    lambda a: a.astype(dtype)
                    if a.dtype == jnp.float32 else a, p
                )
                x_ = x.astype(dtype)
            else:
                x_ = x
            out = model.apply(p, x_, train=True, mask=mask)
            if kind == "window":
                # window classifiers emit (B, C) per window; the per-frame
                # series is the window batch (Trainer._frame_outputs)
                ce, mse = loss(
                    out.astype(jnp.float32)[None],
                    y.reshape(1, -1),
                    None if mask is None else mask[:, 0][None],
                )
            else:
                ce, mse = loss(out.astype(jnp.float32), y, mask)
            return ce + mse

        if fwd_only:
            # fold the loss into params' first leaf so iteration i+1 depends
            # on iteration i — otherwise XLA hoists the whole scan body
            l = loss_fn(params)
            leaves, treedef = jax.tree.flatten(params)
            leaves[0] = leaves[0] + 0.0 * l
            return jax.tree.unflatten(treedef, leaves), opt_state, l
        l, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    def make_many(s):
        def many(params, opt_state, x, y, mask):
            def body(carry, _):
                p, o = carry
                p, o, l = train_step(p, o, x, y, mask)
                return (p, o), l

            (p, o), ls = lax.scan(body, (params, opt_state), None, length=s)
            return p, o, ls[-1]

        return jax.jit(many, donate_argnums=(0, 1))

    rng = np.random.default_rng(seed)
    v = model.graph["num_node"]
    c = model.in_feat
    ncls = model.num_classes
    x = jnp.asarray(
        rng.normal(size=(trials, l_frames, v, c)).astype(np.float32)
    )
    if kind == "window":
        # trials = windows per step; l_frames = receptive field W. One
        # window classifies one frame in continual operation
        # (WindowSegment.get_segment_rt), so windows/s IS frames/s.
        y = jnp.asarray(rng.integers(0, ncls, size=(trials,)))
    else:
        y = jnp.asarray(rng.integers(0, ncls, size=(trials, l_frames)))
    mask = jnp.ones((trials, l_frames), jnp.float32)

    res = {}
    for s in scan_lengths:
        fn = make_many(s)
        params = model.init(jax.random.PRNGKey(0), x[:1, :64])
        opt_state = tx.init(params)
        if compiler_options:
            fn = fn.lower(params, opt_state, x, y, mask).compile(
                compiler_options=compiler_options
            )
        params, opt_state, l = fn(params, opt_state, x, y, mask)  # compile
        np.asarray(l)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            params, opt_state, l = fn(params, opt_state, x, y, mask)
            np.asarray(l)  # host readback: force real completion
            times.append(time.perf_counter() - t0)
        res[s] = times
    s0, s1 = min(scan_lengths), max(scan_lengths)
    sec_per_step = (min(res[s1]) - min(res[s0])) / (s1 - s0)
    per_step = trials if kind == "window" else trials * l_frames
    if return_samples:
        fps_samples = [
            per_step * (s1 - s0) / (t1 - t0)
            for t0, t1 in zip(res[s0], res[s1])
            if t1 > t0
        ]
        return per_step / sec_per_step, sec_per_step, fps_samples
    return per_step / sec_per_step, sec_per_step


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="rt-st-gcn",
                    choices=["rt-st-gcn", "co-st-gcn", "st-gcn"])
    ap.add_argument("--dtype", default=None, choices=[None, "bfloat16"],
                    help="compute dtype (default fp32 params end-to-end)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--frames", type=int, default=1024,
                    help="frames per stacked trial (rt) / windows per step "
                    "(st-gcn, W=50 each)")
    ap.add_argument("--kernel", type=int, default=9,
                    help="temporal kernel Γ (the published matrix also "
                    "carries Γ=69 rows, reference README.md:270-272)")
    ap.add_argument("--peak-tflops", type=float, default=_V5E_PEAK_TFLOPS)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from stgx.graph import load_skeleton
    from stgx.models import MODELS
    from stgx.utils.flops import (
        rt_stgcn_macs_per_frame,
        stgcn_macs_per_window,
    )
    from stgx.utils.loss import Loss

    kind = "window" if args.model == "st-gcn" else "frame"
    if kind == "window":
        # canonical 9-layer PKU-MMD ST-GCN on its 50-frame window
        # (configs/pku-mmd/as_is/stgcn.json); one window classifies one
        # frame in continual operation, so windows/s compares directly to
        # the reference's frames-of-training-per-second
        model = MODELS["st-gcn"](
            num_classes=52, in_feat=3, graph=load_skeleton("pku-mmd"),
            normalization="BatchNorm", remat=args.remat, kernel=args.kernel,
        )
        frames = 50
        trials = max(1, args.frames // frames)
    else:
        model = MODELS[args.model](
            num_classes=52, in_feat=3, graph=load_skeleton("pku-mmd"),
            normalization="BatchNorm", remat=args.remat, kernel=args.kernel,
        )
        frames, trials = args.frames, 8
    loss = Loss(np.ones(52, np.float32), "logits")
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

    fps, sec_step = measure_train_throughput(
        model, loss, frames_per_trial=frames, trials=trials, dtype=dtype,
        kind=kind,
    )
    # fwd ≈ macs, bwd ≈ 2×fwd; 2 FLOPs per MAC
    if kind == "window":
        unit_macs = stgcn_macs_per_window(kernel=args.kernel)
    elif args.model == "co-st-gcn":
        from stgx.utils.flops import costgcn_macs_per_frame

        unit_macs = costgcn_macs_per_frame(kernel=args.kernel)
    else:
        unit_macs = rt_stgcn_macs_per_frame()
    flops_per_frame = 3 * 2 * unit_macs
    achieved_tflops = fps * flops_per_frame / 1e12
    sol = achieved_tflops / args.peak_tflops
    unit = "windows" if kind == "window" else "frames"
    hbm_note = ""
    dtype_bytes = 2 if args.dtype == "bfloat16" else 4
    if args.model != "rt-st-gcn":
        # the whole family is HBM-bound (docs/PERF.md round-4 audit):
        # report the binding memory roofline next to the MXU one
        from stgx.utils.flops import stgcn_train_hbm_bytes_per_window

        if kind == "window":
            bpw = stgcn_train_hbm_bytes_per_window(dtype_bytes=dtype_bytes)
        else:  # co-st-gcn: full frame resolution, no stride decimation
            bpw = stgcn_train_hbm_bytes_per_window(
                window=1, stride=(1,) * 9, dtype_bytes=dtype_bytes
            )
        hbm_sol = fps * bpw / 1e9 / _V5E_HBM_GBPS
        hbm_note = (
            f"; {fps * bpw / 1e9:.0f} GB/s minimal traffic, "
            f"{hbm_sol * 100:.0f}% of the binding HBM roofline"
        )
    if args.model == "rt-st-gcn":
        from stgx.utils.flops import rt_stgcn_train_hbm_bytes_per_frame

        bytes_per_frame = rt_stgcn_train_hbm_bytes_per_frame(
            dtype_bytes=dtype_bytes
        )
        hbm_gbps = fps * bytes_per_frame / 1e9
        hbm_sol = hbm_gbps / _V5E_HBM_GBPS
        hbm_note = (
            f"; {hbm_gbps:.0f} GB/s minimal traffic, {hbm_sol * 100:.0f}% "
            f"of {_V5E_HBM_GBPS:.0f} GB/s HBM roofline"
        )
    print(
        f"{args.model} train step: {fps / 1e3:.1f}k {unit}/s "
        f"({achieved_tflops:.2f} model-TFLOP/s, {sol * 100:.1f}% of "
        f"{args.peak_tflops:.0f} TF MXU peak{hbm_note}) "
        f"[dtype={args.dtype or 'float32'} remat={args.remat} "
        f"step={sec_step * 1e3:.1f}ms]"
    )


if __name__ == "__main__":
    main()
