"""Training-step throughput + roofline for the flagship RT-ST-GCN.

Measures one-chip jitted train-step frames/s (fwd + bwd + adam) at the
canonical 9-layer PKU-MMD configuration and reports the achieved fraction
of the chip's matmul speed-of-light, using the analytic per-frame MACs
(stgx/utils/flops.py; the reference publishes the same MACs figures,
/root/reference/README.md:263-272).

Tunnel-TPU-safe measurement (see .claude/skills/verify): host readback in
the timed region and a slope between two stacked-trial counts to cancel
the fixed per-dispatch RTT.

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


def measure_train_throughput(
    model, loss, frames_per_trial=1024, trial_counts=(2, 8), dtype=None,
    iters=6, seed=0, fwd_only=False,
):
    """Returns (frames_per_second, seconds_per_step_at_max) via RTT-free
    slope between the two ``trial_counts`` stack sizes. ``fwd_only`` drops
    the grad/adam half (forward + loss only) for ablation."""
    import jax
    import jax.numpy as jnp
    import optax

    tx = optax.adam(1e-4)
    l_frames = frames_per_trial

    def train_step(params, opt_state, x, y, mask):
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
            ce, mse = loss(out.astype(jnp.float32), y, mask)
            return ce + mse

        if fwd_only:
            return params, opt_state, loss_fn(params)
        l, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    fn = jax.jit(train_step, donate_argnums=(0, 1))
    rng = np.random.default_rng(seed)
    res = {}
    for n in trial_counts:
        x = jnp.asarray(
            rng.normal(size=(n, l_frames, 25, 3)).astype(np.float32)
        )
        y = jnp.asarray(rng.integers(0, 52, size=(n, l_frames)))
        mask = jnp.ones((n, l_frames), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x[:1, :64])
        opt_state = tx.init(params)
        params, opt_state, l = fn(params, opt_state, x, y, mask)  # compile
        np.asarray(l)
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, l = fn(params, opt_state, x, y, mask)
            np.asarray(l)  # host readback: force real completion
        res[n] = (time.perf_counter() - t0) / iters
    n0, n1 = min(trial_counts), max(trial_counts)
    sec_per_frame = (res[n1] - res[n0]) / ((n1 - n0) * l_frames)
    return 1.0 / sec_per_frame, res[n1]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default=None, choices=[None, "bfloat16"],
                    help="compute dtype (default fp32 params end-to-end)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--peak-tflops", type=float, default=_V5E_PEAK_TFLOPS)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from stgx.graph import load_skeleton
    from stgx.models import MODELS
    from stgx.utils.flops import rt_stgcn_macs_per_frame
    from stgx.utils.loss import Loss

    model = MODELS["rt-st-gcn"](
        num_classes=52, in_feat=3, graph=load_skeleton("pku-mmd"),
        normalization="BatchNorm", remat=args.remat,
    )
    loss = Loss(np.ones(52, np.float32), "logits")
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

    fps, sec_step = measure_train_throughput(
        model, loss, frames_per_trial=args.frames, dtype=dtype
    )
    # fwd ≈ macs, bwd ≈ 2×fwd; 2 FLOPs per MAC
    flops_per_frame = 3 * 2 * rt_stgcn_macs_per_frame()
    achieved_tflops = fps * flops_per_frame / 1e12
    sol = achieved_tflops / args.peak_tflops
    print(
        f"rt-st-gcn train step: {fps / 1e3:.1f}k frames/s "
        f"({achieved_tflops:.2f} model-TFLOP/s, {sol * 100:.1f}% of "
        f"{args.peak_tflops:.0f} TF peak) "
        f"[dtype={args.dtype or 'float32'} remat={args.remat} "
        f"step={sec_step * 1e3:.1f}ms]"
    )


if __name__ == "__main__":
    main()
