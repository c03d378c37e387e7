"""Bounded XLA-flag probe at the bf16 materialization excess (round-4
verdict weak #5): the RT train step runs at ~100% of its *compiled
schedule's* roofline but the schedule carries 4.09 MB/frame vs the 2.60
analytic minimum (docs/PERF.md HLO audit). Six hand kernels failed to beat
it; this probes the zero-code lever — XLA scheduler/fusion flags — before
calling the 66%-of-SoL headline immovable.

Method: every variant compiles WITHIN ONE PROCESS via the AOT path's
``compiler_options`` (cross-process comparisons drift ~20% through the
tunnel — CLAUDE.md), brackets with a no-flag baseline before and after,
and measures with the on-device scan slope.

Flags probed (one axis each, chosen against the audit's diagnosis that the
excess is *materialized op-boundary buffers*):

* ``xla_tpu_scoped_vmem_limit_kib`` — larger scoped-VMEM budgets let the
  fusion passes keep bigger operand windows on-chip;
* ``xla_tpu_memory_bound_loop_optimizer_options`` — the backend's own
  optimizer for HBM-bound loop nests;
* ``xla_tpu_rwb_fusion`` — toggles reduce+broadcast fusion (the
  window-sum's reduce-window sits in the hot loop);
* ``xla_tpu_licm_size_inflation_ratio`` — loop-invariant code motion
  budget (the scan body re-reads weights each step).

Unknown-flag errors are caught and reported per variant — if the tunnel
backend rejects an option, that is a finding, not a crash.

Run (real TPU):  python -m stgx.bench.xla_probe [--model rt-st-gcn]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

VARIANTS = [
    ("baseline_pre", None),
    ("scoped_vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("scoped_vmem_80m", {"xla_tpu_scoped_vmem_limit_kib": "81920"}),
    ("mem_bound_loop_opt",
     {"xla_tpu_memory_bound_loop_optimizer_options": "enabled:true"}),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    ("licm_inflation_2x", {"xla_tpu_licm_size_inflation_ratio": "2.0"}),
    ("baseline_post", None),
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="rt-st-gcn",
                    choices=["rt-st-gcn", "co-st-gcn", "st-gcn"])
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--only", default=None,
                    help="comma-list of variant names to run")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from stgx.bench.train_throughput import measure_train_throughput
    from stgx.graph import load_skeleton
    from stgx.models import MODELS
    from stgx.utils.loss import Loss

    kind = "window" if args.model == "st-gcn" else "frame"
    model = MODELS[args.model](
        num_classes=52, in_feat=3, graph=load_skeleton("pku-mmd"),
        normalization="BatchNorm",
    )
    loss = Loss(np.ones(52, np.float32), "logits")
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    if kind == "window":
        frames, trials = 50, max(1, args.frames // 50)
    else:
        frames, trials = args.frames, 8

    names = args.only.split(",") if args.only else [n for n, _ in VARIANTS]
    results = {}
    for name, opts in VARIANTS:
        if name not in names:
            continue
        try:
            fps, sec, samples = measure_train_throughput(
                model, loss, frames_per_trial=frames, trials=trials,
                dtype=dtype, kind=kind, compiler_options=opts,
                return_samples=True,
            )
            rec = {
                "variant": name, "flags": opts,
                "frames_per_s": round(fps),
                "repeat_spread_pct": round(
                    100.0 * (max(samples) - min(samples))
                    / max(float(np.median(samples)), 1e-9), 1),
                "step_ms": round(sec * 1e3, 2),
            }
            results[name] = fps
        except Exception as e:  # unknown flag / backend rejection
            rec = {"variant": name, "flags": opts,
                   "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(rec), flush=True)

    if "baseline_pre" in results and "baseline_post" in results:
        b0, b1 = results["baseline_pre"], results["baseline_post"]
        drift = abs(b1 - b0) / max(b0, 1e-9)
        best = max(results, key=results.get)
        print(json.dumps({
            "baseline_bracket_drift_pct": round(100 * drift, 1),
            "best_variant": best,
            "best_vs_baseline_pct": round(
                100 * (results[best] / max(b0, b1) - 1), 1),
        }), flush=True)
    return results


if __name__ == "__main__":
    main()
