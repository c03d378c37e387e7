"""ST-GCN (Yan et al. 2018) — batch window classifier.

Capability parity with the reference implementation
(/root/reference/models/stgcn/stgcn.py:8-193): input norm → 1×1 feature
remap → stack of ``StgcnLayer`` (partitioned graph conv + centered (Γ,1)
temporal conv + residual) with per-layer learnable edge-importance masks →
global (L, V) average pool → 1×1 classifier head. Consumes a window of
frames, emits one logit vector per window.

stgx layout: activations are ``(N, L, V, C)``; output ``(N, num_classes)``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stgx.graph import Graph
from stgx.models import _remat
from stgx.ops.graph_conv import partitioned_gcn
from stgx.ops.norms import BatchNorm, LayerNorm
from stgx.ops.temporal import temporal_conv

__all__ = ["Stgcn", "StgcnLayer", "torch_conv_init", "torch_bias_init"]


def torch_conv_init(fan_in: int):
    """torch Conv2d default weight init: kaiming_uniform(a=√5) ⇒
    U(-1/√fan_in, 1/√fan_in) with the *torch* fan-in (kernel taps × C_in),
    passed explicitly because stgx parameter shapes differ from torch's."""
    return torch_bias_init(fan_in)


def torch_bias_init(fan_in: int):
    """torch Conv2d default bias init: U(-1/√fan_in, 1/√fan_in)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (fan_in**0.5)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def make_norm(kind: str, features: int, num_joints: int, per_joint: bool = False):
    """Input/intra-layer norm factory matching the reference's two choices
    (stgcn.py:46,152: LayerNorm([C,1,V]) vs BatchNorm without running stats)."""
    if kind == "LayerNorm":
        return LayerNorm(num_joints=num_joints, features=features)
    if kind == "BatchNorm":
        return BatchNorm(features=features, num_joints=num_joints, per_joint=per_joint)
    raise ValueError(f"unknown normalization: {kind!r}")


class GraphConv(nn.Module):
    """Partitioned graph conv with torch-parity parameter shapes."""

    in_channels: int
    out_channels: int
    partitions: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, A, fused_acc=None):
        W = self.param(
            "kernel",
            torch_conv_init(self.in_channels),
            (self.partitions, self.in_channels, self.out_channels),
        )
        b = (
            self.param(
                "bias",
                torch_bias_init(self.in_channels),
                (self.partitions, self.out_channels),
            )
            if self.use_bias
            else None
        )
        if A.ndim == 4:
            # per-sample adjacency (AAGCN attention): batch the contraction
            # partition axis inside V: keeps the (P, C) contraction dim
            # contiguous for the dot (see stgx/ops/graph_conv.py)
            agg = jnp.einsum("nlvc,npvw->nlwpc", x, A, preferred_element_type=jnp.float32).astype(x.dtype)
            y = jnp.einsum("nlwpc,pcd->nlwd", agg, W, preferred_element_type=jnp.float32).astype(x.dtype)
            if b is not None:
                y = y + jnp.einsum("npvw,pd->nwd", A, b)[:, None].astype(x.dtype)
            return y
        if fused_acc is not None:
            # RT-layer chain: gcn + causal window-sum in one Pallas VMEM
            # pass (stgx/ops/rt_fused.py); parameter tree is unchanged, so
            # checkpoints are interchangeable with the XLA path
            from stgx.ops.rt_fused import rt_fused_gcn_acc

            return rt_fused_gcn_acc(x, A, W, b, *fused_acc)
        return partitioned_gcn(x, A, W, b)


class StgcnLayer(nn.Module):
    """gcn → (norm, relu, temporal conv, norm, dropout) → +residual → relu.

    Mirrors reference StgcnLayer (stgcn.py:104-193) including the
    zero-residual branch for ``residual=False`` and the strided 1×1-conv
    residual when shapes change.
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
    dilation: int = 1

    @nn.compact
    def __call__(self, x, A, *, train: bool = False, mask=None):
        identity_res = (
            self.in_channels == self.out_channels and self.stride == 1
        )
        # a strided layer shortens the frame axis; norms past the stride see
        # the decimated mask (the pre-stride mask keeps the gcn norm exact)
        smask = mask[:, :: self.stride] if mask is not None else None
        if not self.residual:
            res = 0.0
        elif identity_res:
            res = x
        else:
            rw = self.param(
                "res_kernel",
                torch_conv_init(self.in_channels),
                (self.in_channels, self.out_channels),
            )
            rb = self.param(
                "res_bias", torch_bias_init(self.in_channels), (self.out_channels,)
            )
            res = (
                jnp.einsum("nlvc,cd->nlvd", x[:, :: self.stride], rw) + rb
            )
            res = make_norm(
                self.normalization, self.out_channels, self.num_joints
            )(res, mask=smask)

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
        x = temporal_conv(x, tw, tb, stride=self.stride, dilation=self.dilation)
        x = make_norm(self.normalization, self.out_channels, self.num_joints)(
            x, mask=smask
        )
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.relu(x + res)


class Stgcn(nn.Module):
    """Window-classifier ST-GCN. Output ``(N, num_classes)`` per input window."""

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
            StgcnLayer(
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

    def __call__(self, x, *, train: bool = False, mask=None):
        """x: ``(N, L, V, C_in)`` → logits ``(N, num_classes)``."""
        x = self.norm_in(x, mask=mask)
        x = self.fcn_in(x)
        for i, layer in enumerate(self.layers):
            A = self.A * self.edge_importance[i] if self.importance else self.A
            if self.remat and train:
                x = _remat.gcn_layer(layer, x, A, mask)
            else:
                x = layer(x, A, train=train, mask=mask)
            if mask is not None:
                mask = mask[:, :: self.stride[i]]
        x = jnp.mean(x, axis=(1, 2))  # global (L, V) pool
        return self.fcn_out(x)
