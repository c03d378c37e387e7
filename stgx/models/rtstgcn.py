"""RT-ST-GCN — the continual realtime model (the reference paper's own).

Two forms share one parameter set, the property the whole design rests on:

* **Batch (training) form** — per-layer: partitioned graph conv (edge
  importance folded into A) followed by a *causal uniform temporal
  accumulation* ``y[t] = Σ_{i<Γ//s} x[t-i·s]``, then norm→ReLU, residual
  add, ReLU (if residual), dropout. This is what the reference's
  ``OfflineLayer`` intends with its Toeplitz matmul
  (/root/reference/models/rtstgcn/rtstgcn.py:220-389; broken as committed —
  the behavior is pinned by the FIFO simulation in
  models/rtstgcn/test_rtstgcn.py:52-92, see SURVEY.md §5.9). Time is never
  downsampled; ``stride`` only widens the tap spacing.

* **Streaming (inference) form** — identical math one frame at a time with
  an O(1) ring-buffer carry per layer (reference ``OnlineLayer`` /
  ``AggregateStgcn``, rtstgcn.py:392-627). In stgx the carry is an explicit
  pytree threaded through ``stream_step`` / ``lax.scan`` — no module state,
  so it jits, shards, and donates.

FIFO ≡ batch equivalence is asserted in tests/test_rtstgcn_equiv.py
(generalizing the reference's integer-exact test). Note the reference's
streaming BatchNorm computes stats per-frame (a true behavioral gap between
its two forms); with LayerNorm the two forms match exactly, and stgx
reproduces the reference's per-frame-stats behavior for BatchNorm.

Output: ``(N, L, num_classes)`` per-frame logits.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stgx.graph import Graph
from stgx.models.stgcn import GraphConv, make_norm, torch_bias_init, torch_conv_init
from stgx.models import _remat
from stgx.ops.graph_conv import partitioned_gcn
from stgx.ops.norms import batch_norm, layer_norm
from stgx.ops.temporal import (
    causal_accumulate,
    causal_accumulate_step,
    init_accumulator_state,
)

__all__ = ["RtStgcn"]


class RtLayer(nn.Module):
    """One RT-ST-GCN layer (batch form).

    Matches reference OfflineLayer ordering: residual branch uses a *plain*
    (unstrided, bias-free) 1×1 conv + norm when shapes differ
    (rtstgcn.py:324-331); main branch is gcn → causal accumulate → norm →
    ReLU; combine is ``dropout(relu(x + res))`` when residual else
    ``dropout(x + 0)`` (rtstgcn.py:333-340,386-389).
    """

    in_channels: int
    out_channels: int
    gamma: int
    partitions: int
    num_joints: int
    stride: int = 1
    dropout: float = 0.0
    residual: bool = True
    normalization: str = "LayerNorm"

    @nn.compact
    def __call__(self, x, A, *, train: bool = False, mask=None):
        if not self.residual:
            res = 0.0
        elif self.in_channels == self.out_channels and self.stride == 1:
            res = x
        else:
            rw = self.param(
                "res_kernel",
                torch_conv_init(self.in_channels),
                (self.in_channels, self.out_channels),
            )
            res = jnp.einsum("nlvc,cd->nlvd", x, rw)
            res = make_norm(self.normalization, self.out_channels, self.num_joints)(
                res, mask=mask
            )

        from stgx.ops.rt_fused import rt_fused_enabled

        if rt_fused_enabled() and self.gamma // self.stride > 1:
            x = GraphConv(self.in_channels, self.out_channels, self.partitions)(
                x, A, fused_acc=(self.gamma, self.stride)
            )
        else:
            x = GraphConv(self.in_channels, self.out_channels, self.partitions)(x, A)
            x = causal_accumulate(x, self.gamma, self.stride)
        x = make_norm(self.normalization, self.out_channels, self.num_joints)(
            x, mask=mask
        )
        x = nn.relu(x)

        x = x + res
        if self.residual:
            x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class RtStgcn(nn.Module):
    """Per-frame segmentation RT-ST-GCN. ``(N, L, V, C)`` → ``(N, L, classes)``."""

    num_classes: int
    in_feat: int
    graph: dict[str, Any]
    strategy: str = "spatial"
    normalization: str = "BatchNorm"
    kernel: int = 9
    in_ch: Sequence[int] = (64, 64, 64, 64, 128, 128, 128, 256, 256)
    out_ch: Sequence[int] = (64, 64, 64, 128, 128, 128, 256, 256, 256)
    stride: Sequence[int] = (1, 1, 1, 2, 1, 1, 2, 1, 1)
    residual: Sequence[int] = (1, 1, 1, 1, 1, 1, 1, 1, 1)
    dropout: Sequence[float] = (0,) * 9
    importance: bool = True
    remat: bool = False  # per-layer jax.checkpoint (training only)

    def setup(self):
        g = Graph(strategy=self.strategy, **self.graph)
        self.A = jnp.asarray(g.A, dtype=jnp.float32)
        self.num_joints = g.num_node
        self.partitions = self.A.shape[0]
        self.norm_in = make_norm(
            self.normalization, self.in_feat, self.num_joints, per_joint=True
        )
        self.fcn_in = nn.Dense(
            self.in_ch[0],
            kernel_init=torch_conv_init(self.in_feat),
            bias_init=torch_bias_init(self.in_feat),
        )
        self.layers = [
            RtLayer(
                in_channels=self.in_ch[i],
                out_channels=self.out_ch[i],
                gamma=self.kernel,
                partitions=self.partitions,
                num_joints=self.num_joints,
                stride=self.stride[i],
                dropout=self.dropout[i],
                residual=bool(self.residual[i]),
                normalization=self.normalization,
            )
            for i in range(len(self.in_ch))
        ]
        if self.importance:
            self.edge_importance = self.param(
                "edge_importance",
                nn.initializers.ones,
                (len(self.in_ch), self.partitions, self.num_joints, self.num_joints),
            )
        self.fcn_out = nn.Dense(
            self.num_classes,
            kernel_init=torch_conv_init(self.out_ch[-1]),
            bias_init=torch_bias_init(self.out_ch[-1]),
        )

    def _layer_A(self, i):
        return self.A * self.edge_importance[i] if self.importance else self.A

    def __call__(self, x, *, train: bool = False, mask=None):
        x = self.norm_in(x, mask=mask)
        x = self.fcn_in(x)
        for i, layer in enumerate(self.layers):
            if self.remat and train:
                x = _remat.gcn_layer(layer, x, self._layer_A(i), mask)
            else:
                x = layer(x, self._layer_A(i), train=train, mask=mask)
        x = jnp.mean(x, axis=2)  # pool joints only: (N, L, C)
        return self.fcn_out(x)


# -- streaming (FIFO) inference ----------------------------------------------
#
# Pure functions over the *same* trained params — the stgx equivalent of the
# reference's `_swap_layers_for_inference` weight copy (rtstgcn.py:160-187),
# except no copy is needed: the streaming path just reads the batch params.


def init_stream_state(model: RtStgcn, params, batch: int = 1,
                      dtype=jnp.float32):
    """Zero FIFO carries for all layers: the 'empty buffer' start state."""
    return [
        init_accumulator_state(
            batch, model.graph["num_node"], model.out_ch[i], model.kernel,
            model.stride[i], dtype=dtype,
        )
        for i in range(len(model.in_ch))
    ]


def _stream_norm(kind, p, x_t, per_joint: bool = False):
    """Apply a norm to a single frame ``(N, V, C)`` with per-frame stats,
    matching the reference's streaming behavior (BN stats over one frame)."""
    x = x_t[:, None]  # (N, 1, V, C)
    if kind == "LayerNorm":
        y = layer_norm(x, p["scale"], p["bias"])
    else:
        y = batch_norm(
            x, p["scale"], p["bias"], axes=(0, 1) if per_joint else (0, 1, 2)
        )
    return y[:, 0]


def stream_step(model: RtStgcn, params, state, x_t):
    """One frame through the whole network.

    Args:
        params: the trained batch-form variables (``model.init`` output).
        state: list of per-layer accumulator carries.
        x_t: ``(N, V, C_in)`` one input frame.

    Returns:
        ``(logits_t, new_state)`` with ``logits_t`` of shape
        ``(N, num_classes)``; equals column ``t`` of the batch form (exactly
        for LayerNorm; for BatchNorm modulo the reference's own per-frame
        statistics discrepancy).
    """
    p = params["params"]
    kind = model.normalization

    # input norm on the single frame (per-(v,c) channels like the batch form)
    x = _stream_norm(kind, p["norm_in"], x_t, per_joint=True)
    x = x @ p["fcn_in"]["kernel"] + p["fcn_in"]["bias"]

    new_state = []
    g = Graph(strategy=model.strategy, **model.graph)
    A0 = jnp.asarray(g.A, dtype=x.dtype)
    for i in range(len(model.in_ch)):
        lp = p[f"layers_{i}"]
        A = A0 * p["edge_importance"][i] if model.importance else A0

        cin, cout = model.in_ch[i], model.out_ch[i]
        identity = cin == cout and model.stride[i] == 1
        residual = bool(model.residual[i])
        norm_names = sorted(k for k in lp if k.startswith(("LayerNorm", "BatchNorm")))
        n_idx = 0
        if not residual:
            res = 0.0
        elif identity:
            res = x
        else:
            res = x @ lp["res_kernel"]
            res = _stream_norm(kind, lp[norm_names[n_idx]], res)
            n_idx += 1

        # gcn on one frame: (N, V, C) via batch dims trick
        y = partitioned_gcn(
            x[:, None], A, lp["GraphConv_0"]["kernel"], lp["GraphConv_0"]["bias"]
        )[:, 0]
        y, st = causal_accumulate_step(
            state[i], y, model.kernel, model.stride[i]
        )
        new_state.append(st)
        y = _stream_norm(kind, lp[norm_names[n_idx]], y)
        y = nn.relu(y)
        x = y + res
        if residual:
            x = nn.relu(x)

    x = jnp.mean(x, axis=1)  # pool joints: (N, C)
    logits = x @ p["fcn_out"]["kernel"] + p["fcn_out"]["bias"]
    return logits, new_state


def stream_sequence(model: RtStgcn, params, x, state=None):
    """Scan a whole ``(N, L, V, C)`` capture through the streaming cell.

    Returns ``(logits (N, L, classes), final_state)``. The per-frame cell is
    identical to what a deployed realtime loop would jit and call once per
    arriving frame.
    """
    if state is None:
        state = init_stream_state(model, params, batch=x.shape[0], dtype=x.dtype)

    def body(carry, x_t):
        logits, new_state = stream_step(model, params, carry, x_t)
        return new_state, logits

    final_state, ys = jax.lax.scan(body, state, jnp.moveaxis(x, 1, 0))
    return jnp.moveaxis(ys, 0, 1), final_state
