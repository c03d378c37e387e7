"""CoST-GCN — continual ST-GCN baseline (Hedegaard et al. 2023).

Converts the ST-GCN layer to continual operation: the (Γ,1) temporal conv
becomes *causal* (a 'valid' conv over a FIFO of past frames, dilation equal
to the layer's nominal stride — no temporal downsampling), and the residual
is delayed by Γ//2 frames so both branches refer to the same wall-clock frame
(reference models/costgcn/costgcn.py:106-211: fifo at :151-152,200-206,
dilated valid conv at :163-173, delayed residual at :211).

The reference's committed batch path is stale — its Model head is a window
classifier while its segment generator expects per-frame series (SURVEY.md
§5.9-adjacent); stgx implements the intended continual semantics: per-frame
logits ``(N, L, classes)`` with joints-only pooling, which is also what its
own benchmark path measures.

Batch/streaming tap ordering convention: the batch form is a left-padded
causal dilated conv; the streaming cell applies the time-reversed kernel to
its FIFO so both forms share one parameter set (equivalence asserted in
tests/test_costgcn_equiv.py).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stgx.graph import Graph
from stgx.models.stgcn import GraphConv, make_norm, torch_bias_init, torch_conv_init
from stgx.models.rtstgcn import _stream_norm
from stgx.models import _remat
from stgx.ops.graph_conv import partitioned_gcn
from stgx.ops.temporal import temporal_conv

__all__ = ["CoStgcn", "init_stream_state", "stream_step", "stream_sequence"]


class CoStgcnLayer(nn.Module):
    """gcn → (norm, relu, causal dilated conv, norm, dropout) → +res[t-Γ//2]."""

    in_channels: int
    out_channels: int
    gamma: int
    partitions: int
    num_joints: int
    dilation: int = 1  # the reference reuses its 'stride' array as dilation
    dropout: float = 0.0
    residual: bool = True
    normalization: str = "LayerNorm"

    @nn.compact
    def __call__(self, x, A, *, train: bool = False, mask=None):
        delay = self.gamma // 2
        if not self.residual:
            res = 0.0
        else:
            if self.in_channels == self.out_channels:
                res = x
            else:
                rw = self.param(
                    "res_kernel",
                    torch_conv_init(self.in_channels),
                    (self.in_channels, self.out_channels),
                )
                rb = self.param(
                    "res_bias",
                    torch_bias_init(self.in_channels),
                    (self.out_channels,),
                )
                res = jnp.einsum("nlvc,cd->nlvd", x, rw) + rb
                res = make_norm(
                    self.normalization, self.out_channels, self.num_joints
                )(res, mask=mask)
            # delay by Γ//2: frame t of the main branch aligns with res[t-Γ//2]
            res = jnp.pad(res, ((0, 0), (delay, 0), (0, 0), (0, 0)))[:, : x.shape[1]]

        x = GraphConv(self.in_channels, self.out_channels, self.partitions)(x, A)
        x = make_norm(self.normalization, self.out_channels, self.num_joints)(
            x, mask=mask
        )
        x = nn.relu(x)
        tw = self.param(
            "tcn_kernel",
            torch_conv_init(self.out_channels * self.gamma),
            (self.gamma, self.out_channels, self.out_channels),
        )
        tb = self.param(
            "tcn_bias",
            torch_bias_init(self.out_channels * self.gamma),
            (self.out_channels,),
        )
        x = temporal_conv(x, tw, tb, dilation=self.dilation, padding="causal")
        x = make_norm(self.normalization, self.out_channels, self.num_joints)(
            x, mask=mask
        )
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.relu(x + res)


class CoStgcn(nn.Module):
    """Continual ST-GCN: ``(N, L, V, C)`` → per-frame logits ``(N, L, classes)``."""

    num_classes: int
    in_feat: int
    graph: dict[str, Any]
    strategy: str = "spatial"
    normalization: str = "LayerNorm"
    kernel: int = 9
    in_ch: Sequence[int] = (64, 64, 64, 64, 128, 128, 128, 256, 256)
    out_ch: Sequence[int] = (64, 64, 64, 128, 128, 128, 256, 256, 256)
    dilation: Sequence[int] = (1, 1, 1, 2, 1, 1, 2, 1, 1)
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
            CoStgcnLayer(
                in_channels=self.in_ch[i],
                out_channels=self.out_ch[i],
                gamma=self.kernel,
                partitions=self.partitions,
                num_joints=self.num_joints,
                dilation=self.dilation[i],
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

    def __call__(self, x, *, train: bool = False, mask=None):
        x = self.norm_in(x, mask=mask)
        x = self.fcn_in(x)
        for i, layer in enumerate(self.layers):
            A = self.A * self.edge_importance[i] if self.importance else self.A
            if self.remat and train:
                x = _remat.gcn_layer(layer, x, A, mask)
            else:
                x = layer(x, A, train=train, mask=mask)
        x = jnp.mean(x, axis=2)  # pool joints
        return self.fcn_out(x)


# -- streaming form -----------------------------------------------------------


def init_stream_state(model: CoStgcn, params, batch: int = 1, dtype=jnp.float32):
    """Per-layer carries: main-branch FIFO (depth (Γ-1)·d) and residual FIFO
    (depth Γ//2), all starting empty (zeros)."""
    v = model.graph["num_node"]
    state = []
    for i in range(len(model.in_ch)):
        c = model.out_ch[i]
        depth = (model.kernel - 1) * model.dilation[i] + 1
        # shift FIFOs with static tap indices (newest at slot depth-1):
        # cursor-indexed rings defeated XLA's in-place carry aliasing in the
        # scan serving loop and paid full-state copies per frame (see
        # stgx/ops/temporal.py causal_accumulate_step and docs/PERF.md)
        state.append(
            {
                "fifo": jnp.zeros((depth, batch, v, c), dtype=dtype),
                "res_fifo": jnp.zeros(
                    (max(model.kernel // 2, 1), batch, v, c), dtype=dtype
                ),
            }
        )
    return state


def stream_step(model: CoStgcn, params, state, x_t):
    """One frame in → one logits frame out, matching column t of the batch
    form (exactly under LayerNorm)."""
    p = params["params"]
    kind = model.normalization
    gamma = model.kernel

    x = _stream_norm(kind, p["norm_in"], x_t, per_joint=True)
    x = x @ p["fcn_in"]["kernel"] + p["fcn_in"]["bias"]

    g = Graph(strategy=model.strategy, **model.graph)
    A0 = jnp.asarray(g.A, dtype=x.dtype)

    new_state = []
    for i in range(len(model.in_ch)):
        lp = p[f"layers_{i}"]
        st = state[i]
        A = A0 * p["edge_importance"][i] if model.importance else A0
        d = model.dilation[i]
        cin, cout = model.in_ch[i], model.out_ch[i]
        residual = bool(model.residual[i])
        norm_names = sorted(k for k in lp if k.startswith(("LayerNorm", "BatchNorm")))
        n_idx = 0

        # residual branch value for the *current* frame
        if residual:
            if cin == cout:
                res_now = x
            else:
                res_now = x @ lp["res_kernel"] + lp["res_bias"]
                res_now = _stream_norm(kind, lp[norm_names[n_idx]], res_now)
                n_idx += 1
            # delayed residual: slot 0 holds t - Γ//2; shift res_now in
            delay = gamma // 2
            if delay > 0:
                res = st["res_fifo"][0]
                res_fifo = jnp.concatenate(
                    [st["res_fifo"][1:], res_now[None]], axis=0
                )
            else:
                res, res_fifo = res_now, st["res_fifo"]
        else:
            res, res_fifo = 0.0, st["res_fifo"]

        y = partitioned_gcn(
            x[:, None], A, lp["GraphConv_0"]["kernel"], lp["GraphConv_0"]["bias"]
        )[:, 0]
        y = _stream_norm(kind, lp[norm_names[n_idx]], y)
        n_idx += 1
        y = nn.relu(y)

        # shift into the main FIFO, then apply the Γ-tap dilated kernel:
        # batch causal conv gives y[t] = Σ_j W[j]·u[t-(Γ-1-j)·d]
        fifo = jnp.concatenate([st["fifo"][1:], y[None]], axis=0)
        depth = fifo.shape[0]
        # u[t-k·d] sits at static slot depth-1-k·d; weight for it is W[Γ-1-k]
        u = jnp.stack(
            [fifo[depth - 1 - k * d] for k in range(gamma)], axis=0
        )
        W = jnp.flip(lp["tcn_kernel"], axis=0)  # W'[k] = W[Γ-1-k]
        y = jnp.einsum("knvc,kcd->nvd", u, W) + lp["tcn_bias"]
        y = _stream_norm(kind, lp[norm_names[n_idx]], y)

        new_state.append({"fifo": fifo, "res_fifo": res_fifo})
        x = nn.relu(y + res)

    x = jnp.mean(x, axis=1)
    return x @ p["fcn_out"]["kernel"] + p["fcn_out"]["bias"], new_state


def stream_sequence(model: CoStgcn, params, x, state=None):
    if state is None:
        state = init_stream_state(model, params, batch=x.shape[0], dtype=x.dtype)

    def body(carry, x_t):
        logits, new = stream_step(model, params, carry, x_t)
        return new, logits

    final_state, ys = jax.lax.scan(body, state, jnp.moveaxis(x, 1, 0))
    return jnp.moveaxis(ys, 0, 1), final_state
