"""MS-TCN — multi-stage temporal convolutional network (Farha & Gall 2019).

Parity with the reference (/root/reference/models/mstcn/mstcn.py:6-116):
a generator ``SingleStage`` over the raw features followed by refinement
stages over (an adapter of) the previous stage's class scores. Each stage is
1×1 in-conv → N ``DilatedResidualLayer`` (kernel k, dilation 2^i, symmetric
padding = dilation, ReLU, 1×1 conv, dropout, residual add) → 1×1 out-conv.
Joint features are average-pooled after the generator stage (mstcn.py:58).

Output: ``(stages, N, L, num_classes)`` per-frame logits per stage (the
reference's ``(stages, 1, classes, L)``, batched and channels-last).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stgx.models import _remat

from stgx.models.stgcn import torch_bias_init, torch_conv_init
from stgx.ops.temporal import temporal_conv

__all__ = ["MsTcn", "SingleStage"]


def output_adapter(kind: str):
    if kind == "logits":
        return lambda x: x
    if kind == "logsoftmax":
        return lambda x: jax.nn.log_softmax(x, axis=-1)
    if kind == "softmax":
        return lambda x: jax.nn.softmax(x, axis=-1)
    raise ValueError(f"unknown output adapter: {kind!r}")


class DilatedResidualLayer(nn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        w = self.param(
            "conv_kernel",
            torch_conv_init(self.features * self.kernel),
            (self.kernel, self.features, self.features),
        )
        b = self.param(
            "conv_bias",
            torch_bias_init(self.features * self.kernel),
            (self.features,),
        )
        # reference pads by `dilation` on both sides regardless of kernel
        # (mstcn.py:109) — same-length only for kernel 3, kept for parity
        y = temporal_conv(x, w, b, dilation=self.dilation, padding=self.dilation)
        y = nn.relu(y)
        y = nn.Dense(
            self.features,
            kernel_init=torch_conv_init(self.features),
            bias_init=torch_bias_init(self.features),
        )(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return x + y


class SingleStage(nn.Module):
    out_channels: int
    num_filters: int = 64
    num_layers: int = 10
    kernel: int = 3
    dropout: float = 0.0
    remat: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Dense(
            self.num_filters,
            kernel_init=torch_conv_init(x.shape[-1]),
            bias_init=torch_bias_init(x.shape[-1]),
        )(x)
        for i in range(self.num_layers):
            layer = DilatedResidualLayer(
                features=self.num_filters,
                kernel=self.kernel,
                dilation=2**i,
                dropout=self.dropout,
            )
            if self.remat and train:
                x = _remat.seq_layer(layer, x)
            else:
                x = layer(x, train=train)
        return nn.Dense(
            self.out_channels,
            kernel_init=torch_conv_init(self.num_filters),
            bias_init=torch_bias_init(self.num_filters),
        )(x)


class MsTcn(nn.Module):
    """``(N, L, V, C)`` → ``(stages, N, L, classes)``."""

    num_classes: int
    in_feat: int
    stages: int = 4
    filters: Sequence[int] = (64, 64, 64, 64)
    layers: Sequence[int] = (10, 10, 10, 10)
    kernel: Sequence[int] = (3, 3, 3, 3)
    dropout: Sequence[float] = (0.5, 0.5, 0.5, 0.5)
    refine: str = "softmax"
    output_type: str = "logits"
    remat: bool = False  # per-layer jax.checkpoint (training only)

    @nn.compact
    def __call__(self, x, *, train: bool = False, mask=None):
        prob = output_adapter(self.refine)
        out = output_adapter(self.output_type)

        y = SingleStage(
            out_channels=self.num_classes,
            num_filters=self.filters[0],
            num_layers=self.layers[0],
            kernel=self.kernel[0],
            dropout=self.dropout[0],
        )(x, train=train)
        y = jnp.mean(y, axis=2)  # pool joints after the generator (N, L, C)
        outputs = [out(y)]

        for s in range(1, self.stages):
            y = SingleStage(
                out_channels=self.num_classes,
                num_filters=self.filters[s],
                num_layers=self.layers[s],
                kernel=self.kernel[s],
                dropout=self.dropout[s],
                remat=self.remat,
            )(prob(y)[:, :, None, :], train=train)[:, :, 0, :]
            outputs.append(out(y))
        return jnp.stack(outputs)
