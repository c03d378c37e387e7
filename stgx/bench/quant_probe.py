"""Localize the RT-ST-GCN static-vs-dynamic int8 inversion (round-4 verdict
weak #1): the static mode strictly removes work (no per-matmul abs-max
reduction) yet measured 58% SLOWER than dynamic on RT-ST-GCN₉ (0.0225 vs
0.0142 ms/frame) while reaching parity/better on both CoST-GCN configs.

One process, on-chip scan-slope (docs/PERF.md methodology). Variants:

* the four modes (fp32 / dynamic / static / w8) — reproduce the inversion;
* ``static_ones`` — static mode with every scale = 1.0: if timing follows
  the scale *values*, XLA is specializing on the constants;
* ``hybrid:<family>`` — static scales only for one site family (``fcn``,
  ``gcn``, ``res``), dynamic elsewhere: localizes which matmul's constant
  scale regresses the schedule;
* optimized-HLO op histograms of the scan for dynamic vs static — what
  does the static lowering trace that the dynamic one doesn't?

Run (real TPU):
    python -m stgx.bench.quant_probe [--frames 4096] [--kernel 9]
"""

from __future__ import annotations

import argparse
import collections
import json
import re

import numpy as np


def _hlo_histogram(text: str) -> collections.Counter:
    """Opcode histogram of an HLO module text (post-optimization).

    Instruction lines read ``%name = SHAPE opcode(args), ...`` where SHAPE
    is a single space-free token (`bf16[8,25]{1,0:T(8,128)}` — TPU layout
    annotations contain colons and parens) or a parenthesized tuple."""
    ops = collections.Counter()
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith(("%", "ROOT ")) or " = " not in line:
            continue
        rhs = line.split(" = ", 1)[1]
        if rhs.startswith("("):  # tuple shape: skip to its matching paren
            depth = 0
            for i, ch in enumerate(rhs):
                depth += ch == "("
                depth -= ch == ")"
                if depth == 0:
                    rhs = rhs[i + 1:]
                    break
        else:  # scalar/array shape: one space-free token
            parts = rhs.split(None, 1)
            rhs = parts[1] if len(parts) > 1 else ""
        m = re.match(r"\s*([\w\-]+)\(", rhs)
        if m:
            ops[m.group(1)] += 1
    return ops


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4096)
    ap.add_argument("--kernel", type=int, default=9)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--skip-hybrids", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from stgx.bench import quant
    from stgx.bench.quant import QUANT_MODELS, calibrate_scales, quant_mode
    from stgx.bench.streaming import (
        measure_quant_onchip,
        measure_stream_latency_onchip,
    )
    from stgx.graph import load_skeleton
    from stgx.models import MODELS

    model = MODELS["rt-st-gcn"](
        num_classes=52, in_feat=3, graph=load_skeleton("pku-mmd"),
        normalization="BatchNorm", kernel=args.kernel,
    )
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(args.frames, 25, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(frames[None, :8]))
    quantize, qstep_fn, qinit = QUANT_MODELS["rt-st-gcn"]
    qparams = quantize(model, params)
    scales = calibrate_scales(model, qparams, frames, "rt-st-gcn")

    out = {"model": f"rt-st-gcn-{args.kernel}", "frames": args.frames}

    def put(k, v):
        out[k] = round(v, 5)
        print(json.dumps({k: out[k]}), flush=True)

    put("fp32_ms", measure_stream_latency_onchip(
        model, "rt-st-gcn", params, frames, repeats=args.repeats))
    put("dynamic_ms", measure_quant_onchip(
        model, "rt-st-gcn", qparams, frames, repeats=args.repeats,
        mode="dynamic"))
    put("static_ms", measure_quant_onchip(
        model, "rt-st-gcn", qparams, frames, repeats=args.repeats,
        mode="static", scales=scales))
    put("w8_ms", measure_quant_onchip(
        model, "rt-st-gcn", qparams, frames, repeats=args.repeats,
        mode="w8"))

    # scale VALUES as constants: same trace structure, different constants
    ones = {k: 1.0 for k in scales}
    put("static_ones_ms", measure_quant_onchip(
        model, "rt-st-gcn", qparams, frames, repeats=args.repeats,
        mode="static", scales=ones))

    if not args.skip_hybrids:
        # hybrid: static for one family, dynamic elsewhere — monkeypatch the
        # activation quantizer to fall back to a live scale off-family
        orig = quant._quantize_act

        def hybrid_factory(fam):
            def hybrid(x, scale=None, site=None):
                use_static = (
                    site is not None
                    and (
                        site.startswith("fcn") if fam == "fcn"
                        else f".{fam}" in site
                    )
                )
                if scale is None and use_static:
                    s = scales[site]
                    xq = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
                    return xq, s
                # live per-tensor scale
                s = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
                xq = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
                return xq, s
            return hybrid

        for fam in ("fcn", "gcn", "res"):
            quant._quantize_act = hybrid_factory(fam)
            try:
                put(f"hybrid_{fam}_static_ms", measure_quant_onchip(
                    model, "rt-st-gcn", qparams, frames,
                    repeats=args.repeats, mode="dynamic"))
            finally:
                quant._quantize_act = orig

    # optimized-HLO histograms: what extra ops does each mode schedule?
    state0 = qinit(model)

    def make_run(mode, sc):
        @jax.jit
        def run(qp, st, fr):
            def body(carry, x_t):
                ql, s2 = qstep_fn(model, qp, carry, x_t[None])
                return s2, ql

            _, ys = jax.lax.scan(body, st, fr)
            return ys[-1]
        with quant_mode(mode, sc):
            return run.lower(
                qparams, state0, jnp.asarray(frames[:64])
            ).compile()

    hists = {}
    for mode, sc in [("dynamic", None), ("static", scales)]:
        hists[mode] = _hlo_histogram(make_run(mode, sc).as_text())
    diff = {
        op: hists["static"][op] - hists["dynamic"][op]
        for op in set(hists["static"]) | set(hists["dynamic"])
        if hists["static"][op] != hists["dynamic"][op]
    }
    out["hlo_op_diff_static_minus_dynamic"] = dict(
        sorted(diff.items(), key=lambda kv: -abs(kv[1]))
    )
    out["hlo_total_ops"] = {
        m: sum(h.values()) for m, h in hists.items()
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
