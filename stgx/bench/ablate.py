"""Subtractive op-cost profile of the RT-ST-GCN train step.

The remote-compile tunnel makes trace-based profiling impractical (the
profiler runs server-side), so this measures where the step time goes by
*ablation*: monkeypatch one hot op at a time to a shape-preserving no-op,
re-jit the full train step, and read each op's marginal cost as
``t(full) - t(variant)``. The variants keep every other op (and XLA's
fusion context) intact, so the marginals are honest about what removing
the op's HBM traffic + FLOPs would actually buy.

Subtractive variants (shape-preserving no-ops):
  full        — unmodified step (the number bench.py reports)
  no_norm     — batch/layer norm -> affine only (no stats passes)
  no_acc      — causal window-sum -> identity
  no_tcn      — temporal conv -> strided identity (st-gcn family)
  no_agg      — adjacency aggregation -> broadcast over P (keeps the
                P-expanded intermediate's HBM traffic, drops the K=25 dot)
  matmul_only — whole gcn -> one partition-summed channel matmul (drops
                the P-expanded intermediate entirely)
  fwd_only    — forward + loss only (no grad/adam)

Implementation A/Bs (same math, different formulation — measured results
in docs/PERF.md):
  acc_reduce_window / acc_slices / acc_toeplitz / acc_pallas — the four
      causal window-sum forms (stgx/ops/temporal.py, pallas_acc.py)
  gcn_wfirst   — channel-matmul-first graph conv
  rt_fused     — cross-op fused Pallas layer core (rejected 3.2× slower,
                 docs/PERF.md A/B log); rt_fused_fwd isolates its forward
  dots_native  — dots emit the compute dtype instead of preferred-fp32+cast
  norm_native  — norm statistics in the compute dtype (no fp32 upcast)
  no_mask      — ungated step (mask=None end to end)
  pad_v32      — skeleton padded V=25→32 (tile-padding probe: +7.5% step
                 for +28..64% V-dim FLOPs — docs/PERF.md round-4 audit)
  remat        — per-layer rematerialization

Run: ``python -m stgx.bench.ablate [--model st-gcn] [--dtype bfloat16]
[--frames 1024] [--only full,no_acc,...]`` — keep every comparison within
ONE run; cross-process numbers drift (docs/PERF.md methodology).
"""

from __future__ import annotations

import argparse
import contextlib
import json

import numpy as np


@contextlib.contextmanager
def _patched(monkey):
    saved = [(mod, name, getattr(mod, name)) for mod, name, _ in monkey]
    try:
        for mod, name, fn in monkey:
            setattr(mod, name, fn)
        yield
    finally:
        for mod, name, fn in saved:
            setattr(mod, name, fn)


def _gcn_layer_inner(layer, x, A, mask):
    return layer(x, A, train=True, mask=mask)


def _variants():
    import jax.numpy as jnp

    import stgx.models.rtstgcn as rtstgcn
    import stgx.models.stgcn as stgcn
    import stgx.ops.graph_conv as graph_conv
    import stgx.ops.norms as norms

    def affine_bn(x, weight, bias, axes, eps=1e-5, mask=None):
        return weight * x + bias

    def affine_ln(x, weight, bias, eps=1e-5):
        return weight * x + bias

    def identity_acc(x, kernel_size, stride):
        return x

    def broadcast_agg(x, A):
        n, l, v, c = x.shape
        return jnp.broadcast_to(x[:, :, :, None], (n, l, v, A.shape[0], c))

    def gcn_native_out(x, A, W, b=None):
        # same math, but the dots emit x.dtype directly instead of
        # preferred fp32 + a cast (MXU accumulation is fp32 either way —
        # this probes whether the converts fuse into the dot epilogues)
        agg = jnp.einsum("nlvc,pvw->nlwpc", x, A)
        y = jnp.einsum("nlwpc,pcd->nlwd", agg, W)
        if b is not None:
            y = y + jnp.einsum("pvw,pd->wd", A, b).astype(y.dtype)
        return y

    def bn_native_stats(x, weight, bias, axes, eps=1e-5, mask=None):
        # stats in the compute dtype (probes the cost of the fp32 upcast)
        if mask is None:
            mean = jnp.mean(x, axis=axes, keepdims=True)
            var = jnp.mean(x * x, axis=axes, keepdims=True) - mean * mean
        else:
            m = mask[:, :, None, None].astype(x.dtype)
            count = jnp.sum(m, axis=axes, keepdims=True) * (
                x.shape[2] if 2 in axes else 1
            )
            mean = jnp.sum(x * m, axis=axes, keepdims=True) / count
            var = jnp.sum(x * x * m, axis=axes, keepdims=True) / count \
                - mean * mean
        return weight * ((x - mean) / jnp.sqrt(var + eps)) + bias

    def matmul_only(x, A, W, b=None):
        y = jnp.einsum("nlvc,pcd->nlvd", x, W,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        return y if b is None else y + jnp.sum(b, 0).astype(x.dtype)

    def no_tcn(x, W, b=None, stride=1, dilation=1, padding="same"):
        # temporal conv -> strided identity (tcn is C_out->C_out, so only
        # the frame decimation is kept); shape-preserving for "same"
        y = x[:, ::stride] if padding == "same" else x
        return y if b is None else y + b.astype(y.dtype)

    import jax
    from flax import linen as nn

    import stgx.models._remat as _remat
    import stgx.ops.rt_fused as rt_fused
    import stgx.ops.temporal as temporal
    from stgx.ops.pallas_acc import causal_accumulate_pallas

    def _pallas_acc(x, kernel_size, stride):
        return causal_accumulate_pallas(x, kernel_size, stride)

    return {
        "full": [],
        "no_norm": [(norms, "batch_norm", affine_bn),
                    (norms, "layer_norm", affine_ln)],
        "no_acc": [(rtstgcn, "causal_accumulate", identity_acc)],
        "acc_reduce_window": [(rtstgcn, "causal_accumulate",
                               temporal._reduce_window_accumulate)],
        "acc_slices": [(rtstgcn, "causal_accumulate",
                        temporal._slices_accumulate)],
        "acc_toeplitz": [(rtstgcn, "causal_accumulate",
                          temporal._block_toeplitz_accumulate)],
        "acc_pallas": [(rtstgcn, "causal_accumulate", _pallas_acc)],
        "no_agg": [(graph_conv, "gcn_aggregate", broadcast_agg)],
        "matmul_only": [(stgcn, "partitioned_gcn", matmul_only),
                        (graph_conv, "partitioned_gcn", matmul_only)],
        # partitioned_gcn reads the module global at trace time, so patching
        # _IMPL flips every call site
        "gcn_wfirst": [(graph_conv, "_IMPL", "einsum_wfirst")],
        # cross-op fused Pallas layer core: gcn + causal window-sum in one
        # VMEM pass (stgx/ops/rt_fused.py) — the inter-op HBM traffic probe
        "rt_fused": [(rt_fused, "_ENABLED", True)],
        # fused kernel, forward only: splits the fused A/B's loss between
        # the fwd kernel and the (smaller-tile, VMEM-accumulating) bwd kernel
        "rt_fused_fwd": [(rt_fused, "_ENABLED", True)],
        "fwd_only": [],
        "no_mask": [],
        # joint-padded skeleton: V=25 -> 32 with 7 extra chain-connected
        # joints (no patch — main() swaps the skeleton). Tests the window-
        # family lane/sublane padding hypothesis: activations tile V 25->32
        # physically either way, so if this measures ~equal, 22% of the
        # V-dim work the hardware already does is pad waste; if it slows by
        # the +28% FLOP ratio, there is no pad slack to reclaim.
        "pad_v32": [],
        "remat": [],
        "dots_native": [(stgcn, "partitioned_gcn", gcn_native_out),
                        (graph_conv, "partitioned_gcn", gcn_native_out)],
        "norm_native": [(norms, "batch_norm", bn_native_stats)],
        "no_tcn": [(stgcn, "temporal_conv", no_tcn)],
        # selective remat: keep dot outputs, recompute elementwise in the
        # backward (between full-save and the full per-layer remat variant)
        "remat_dots": [
            (_remat, "gcn_layer", nn.remat(
                _gcn_layer_inner,
                policy=jax.checkpoint_policies.dots_saveable,
            )),
        ],
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="rt-st-gcn",
                    choices=["rt-st-gcn", "st-gcn"])
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--frames", type=int, default=1024,
                    help="frames per trial (rt) / windows per step (st-gcn)")
    ap.add_argument("--only", default=None, help="comma-list of variants")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from stgx.bench.train_throughput import measure_train_throughput
    from stgx.graph import load_skeleton
    from stgx.models import MODELS
    from stgx.utils.loss import Loss

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    loss = Loss(np.ones(52, np.float32), "logits")
    kind = "window" if args.model == "st-gcn" else "frame"

    results = {}
    variants = _variants()
    names = args.only.split(",") if args.only else list(variants)
    for name in names:
        skel = load_skeleton("pku-mmd")
        if name == "pad_v32":
            # pad joints get self-loops like every real joint (the
            # _with_self_loops convention, stgx/graph.py) so the spatial
            # partition treats them structurally identically
            skel["num_node"] = 32
            skel["edge"] = list(skel["edge"]) + [
                (i, i + 1) for i in range(24, 31)
            ] + [(i, i) for i in range(25, 32)]
        model = MODELS[args.model](
            num_classes=52, in_feat=3, graph=skel,
            normalization="BatchNorm",
            remat=(name in ("remat", "remat_dots")),
        )
        if kind == "window":
            frames, trials = 50, max(1, args.frames // 50)
        else:
            frames, trials = args.frames, 8
        with _patched(variants[name]):
            fps, sec = measure_train_throughput(
                model, loss, frames_per_trial=frames, trials=trials,
                dtype=dtype, kind=kind,
                fwd_only=(name in ("fwd_only", "rt_fused_fwd")),
                use_mask=(name != "no_mask"),
            )
        results[name] = fps
        unit = "windows_per_s" if kind == "window" else "frames_per_s"
        print(json.dumps({"variant": name, unit: round(fps),
                          "step_ms": round(sec * 1e3, 1)}), flush=True)

    if "full" in results:
        base = 1e6 / results["full"]  # µs per unit
        per = "µs/window" if kind == "window" else "µs/frame"
        for name, fps in results.items():
            if name == "full":
                continue
            saved = base - 1e6 / fps
            print(f"{name}: marginal cost {saved:.2f} {per} "
                  f"({100 * saved / base:.1f}% of step)")


if __name__ == "__main__":
    main()
