"""Int8 post-training quantization for streaming inference.

The stgx counterpart of the reference's FX-graph PTSQ benchmark path
(/root/reference/processor.py:870-982 + models/rtstgcn/rtstgcn.py:630-739):
quantize the continual model's matmuls to int8, then measure latency, size
and accuracy against fp32. TPU-idiomatic scheme (no FX graph surgery):

* **weights** — symmetric per-output-channel int8 (``s_w = max|w|/127``);
* **activations** — symmetric per-tensor int8 with *dynamic* scales taken
  from the live tensor (subsuming the reference's observer calibration pass,
  processor.py:909-913 — no separate calibrate step needed);
* matmuls run int8×int8→int32 on the MXU (``preferred_element_type=int32``)
  and rescale into fp32 for norms/activations; the tiny adjacency contraction
  stays fp32.

The quantized streaming cell reads the same trained params — quantization is
a pure transformation, mirroring `prepare→calibrate→convert`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stgx.graph import Graph
from stgx.models.rtstgcn import _stream_norm
from stgx.ops.temporal import causal_accumulate_step, init_accumulator_state

__all__ = [
    "quantize_weight",
    "int8_matmul",
    "quantize_rtstgcn",
    "quantized_stream_step",
    "quantized_size_bytes",
]


def quantize_weight(w):
    """Per-output-channel (last axis) symmetric int8. Returns (w_q, scales)."""
    s = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1))) / 127.0
    s = jnp.maximum(s, 1e-12)
    w_q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return w_q, s


def _quantize_act(x, scale=None):
    if scale is None:
        scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


def int8_matmul(x, w_q, s_w, act_scale=None):
    """``x @ w`` with int8 inputs and int32 accumulation on the MXU."""
    x_q, s_x = _quantize_act(x, act_scale)
    acc = jax.lax.dot_general(
        x_q,
        w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (s_x * s_w)


def quantize_rtstgcn(model, params):
    """Quantize every matmul weight of an RtStgcn param tree.

    Returns a qparams dict holding int8 kernels + scales, fp32 biases and
    norm params, and the folded per-layer adjacency.
    """
    p = params["params"]
    g = Graph(strategy=model.strategy, **model.graph)
    A0 = jnp.asarray(g.A, dtype=jnp.float32)

    q = {"norm_in": p["norm_in"], "layers": []}
    q["fcn_in"] = (*quantize_weight(p["fcn_in"]["kernel"]), p["fcn_in"]["bias"])
    for i in range(len(model.in_ch)):
        lp = p[f"layers_{i}"]
        A = A0 * p["edge_importance"][i] if model.importance else A0
        gw = lp["GraphConv_0"]["kernel"]  # (P, Cin, Cout)
        pcin = gw.shape[0] * gw.shape[1]
        wq, sw = quantize_weight(gw.reshape(pcin, -1))
        layer = {
            "A": A,
            "gcn": (wq, sw, lp["GraphConv_0"]["bias"]),
            "norms": {
                k: lp[k]
                for k in lp
                if k.startswith(("LayerNorm", "BatchNorm"))
            },
        }
        if "res_kernel" in lp:
            layer["res"] = quantize_weight(lp["res_kernel"])
        q["layers"].append(layer)
    q["fcn_out"] = (*quantize_weight(p["fcn_out"]["kernel"]), p["fcn_out"]["bias"])
    return q


def quantized_stream_step(model, qparams, state, x_t):
    """One frame through the int8 streaming cell (same math as
    ``rtstgcn.stream_step`` with int8 matmuls)."""
    kind = model.normalization
    q = qparams

    x = _stream_norm(kind, q["norm_in"], x_t, per_joint=True)
    wq, sw, b = q["fcn_in"]
    x = int8_matmul(x, wq, sw) + b

    new_state = []
    for i, layer in enumerate(q["layers"]):
        cin, cout = model.in_ch[i], model.out_ch[i]
        residual = bool(model.residual[i])
        identity = cin == cout and model.stride[i] == 1
        norm_names = sorted(layer["norms"])
        n_idx = 0
        if not residual:
            res = 0.0
        elif identity:
            res = x
        else:
            rq, rs = layer["res"]
            res = int8_matmul(x, rq, rs)
            res = _stream_norm(kind, layer["norms"][norm_names[n_idx]], res)
            n_idx += 1

        # gcn: aggregate with fp32 A (tiny), then one int8 matmul over (P·Cin)
        A = layer["A"]
        agg = jnp.einsum("nvc,pvw->nwpc", x, A)  # (N, V, P, Cin)
        n_, v_ = agg.shape[0], agg.shape[1]
        wq, sw, gb = layer["gcn"]
        y = int8_matmul(agg.reshape(n_, v_, -1), wq, sw)
        y = y + jnp.einsum("pvw,pd->wd", A, gb)

        y, st = causal_accumulate_step(state[i], y, model.kernel, model.stride[i])
        new_state.append(st)
        y = _stream_norm(kind, layer["norms"][norm_names[n_idx]], y)
        y = jax.nn.relu(y)
        x = y + res
        if residual:
            x = jax.nn.relu(x)

    x = jnp.mean(x, axis=1)
    wq, sw, b = q["fcn_out"]
    return int8_matmul(x, wq, sw) + b, new_state


def init_quant_stream_state(model, batch=1, dtype=jnp.float32):
    return [
        init_accumulator_state(
            batch, model.graph["num_node"], model.out_ch[i], model.kernel,
            model.stride[i], dtype=dtype,
        )
        for i in range(len(model.in_ch))
    ]


def quantized_size_bytes(qparams) -> int:
    def leaf_bytes(x):
        x = np.asarray(x)
        return x.size * x.dtype.itemsize

    return sum(leaf_bytes(l) for l in jax.tree.leaves(qparams))
