"""Shift-GCN (Cheng et al. 2020) — shift-based spatial/temporal modeling.

Restores the model family the reference ships disabled (its
``models/__init__.py:7-8,18-19`` comments both shift models out because the
CUDA shift extension isn't vendored — SURVEY.md §2.19). Semantics follow the
reference module structure (/root/reference/models/shiftgcn/shiftgcn.py):

* **Spatial shift block** (shiftgcn.py:77-142): joint-circular channel
  rotation in, learnable feature-mask gate ``tanh(M)+1``, pointwise linear,
  reverse rotation out, norm, plus a 1×1-conv downsample residual;
* **Temporal shift block** (shiftgcn.py:48-74): norm → learnable per-channel
  temporal shift (the stgx Pallas/banded op) → 1×1 linear → ReLU → second
  learnable shift with stride → norm;
* **Model** (shiftgcn.py:165-216): input norm, 10 units
  (64×4 → 128×3(stride 2) → 256×3(stride 2)), global pool, linear head.

Deviation noted: the reference (via the upstream repo) uses running-stats
BatchNorm; stgx uses its framework-wide batch-stat norms (the BN-adaptation
semantics every other family here trains with).

Window classifier: ``(N, L, V, C)`` → ``(N, num_classes)``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stgx.models import _remat

from stgx.graph import Graph
from stgx.models.stgcn import make_norm, torch_bias_init, torch_conv_init
from stgx.ops.shift import spatial_shift, temporal_shift

__all__ = ["ShiftGcn", "SpatialShiftBlock", "TemporalShiftBlock"]


def shift_init(scale: float = 1.0):
    """Uniform(-scale, scale) init for learnable temporal shifts."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


class SpatialShiftBlock(nn.Module):
    in_channels: int
    out_channels: int
    num_joints: int
    normalization: str = "BatchNorm"

    @nn.compact
    def __call__(self, x0, *, train: bool = False, mask=None):
        cin, cout = self.in_channels, self.out_channels
        W = self.param(
            "kernel",
            nn.initializers.normal(stddev=(1.0 / cout) ** 0.5),
            (cin, cout),
        )
        b = self.param("bias", nn.initializers.zeros, (cout,))
        # the reference inits the gate mask to zeros ⇒ gate = tanh(0)+1 = 1
        gate = self.param(
            "feature_mask", nn.initializers.zeros, (self.num_joints, cin)
        )

        x = spatial_shift(x0)
        x = x * (jnp.tanh(gate) + 1.0)
        x = x @ W + b
        x = spatial_shift(x, reverse=True)
        x = make_norm(self.normalization, cout, self.num_joints, per_joint=True)(
            x, mask=mask
        )

        if cin != cout:
            dw = self.param("down_kernel", torch_conv_init(cin), (cin, cout))
            db = self.param("down_bias", torch_bias_init(cin), (cout,))
            res = x0 @ dw + db
            res = make_norm(self.normalization, cout, self.num_joints)(
                res, mask=mask
            )
        else:
            res = x0
        return nn.relu(x + res)


class TemporalShiftBlock(nn.Module):
    in_channels: int
    out_channels: int
    num_joints: int
    stride: int = 1
    normalization: str = "BatchNorm"

    @nn.compact
    def __call__(self, x, *, train: bool = False, mask=None):
        cin, cout = self.in_channels, self.out_channels
        x = make_norm(self.normalization, cin, self.num_joints)(x, mask=mask)
        s_in = self.param("shift_in", shift_init(1.0), (cin,))
        s_out = self.param("shift_out", shift_init(1.0), (cout,))
        x = temporal_shift(x, s_in)
        lw = self.param("linear_kernel", torch_conv_init(cin), (cin, cout))
        lb = self.param("linear_bias", torch_bias_init(cin), (cout,))
        x = nn.relu(x @ lw + lb)
        x = temporal_shift(x, s_out, stride=self.stride)
        smask = mask[:, :: self.stride] if mask is not None else None
        return make_norm(self.normalization, cout, self.num_joints)(
            x, mask=smask
        )


class ShiftUnit(nn.Module):
    in_channels: int
    out_channels: int
    num_joints: int
    stride: int = 1
    residual: bool = True
    normalization: str = "BatchNorm"

    @nn.compact
    def __call__(self, x, *, train: bool = False, mask=None):
        y = SpatialShiftBlock(
            self.in_channels, self.out_channels, self.num_joints,
            self.normalization,
        )(x, train=train, mask=mask)
        y = TemporalShiftBlock(
            self.out_channels, self.out_channels, self.num_joints,
            self.stride, self.normalization,
        )(y, train=train, mask=mask)
        smask = mask[:, :: self.stride] if mask is not None else None
        if not self.residual:
            res = 0.0
        elif self.in_channels == self.out_channels and self.stride == 1:
            res = x
        else:
            rw = self.param(
                "res_kernel", torch_conv_init(self.in_channels),
                (self.in_channels, self.out_channels),
            )
            rb = self.param(
                "res_bias", torch_bias_init(self.in_channels),
                (self.out_channels,),
            )
            res = x[:, :: self.stride] @ rw + rb
            res = make_norm(
                self.normalization, self.out_channels, self.num_joints
            )(res, mask=smask)
        return nn.relu(y + res)


class ShiftGcn(nn.Module):
    """10-unit Shift-GCN window classifier."""

    num_classes: int
    in_feat: int
    graph: dict[str, Any]
    strategy: str = "spatial"
    normalization: str = "BatchNorm"
    in_ch: Sequence[int] = (3, 64, 64, 64, 64, 128, 128, 128, 256, 256)
    out_ch: Sequence[int] = (64, 64, 64, 64, 128, 128, 128, 256, 256, 256)
    stride: Sequence[int] = (1, 1, 1, 1, 2, 1, 1, 2, 1, 1)
    residual: Sequence[int] = (0, 1, 1, 1, 1, 1, 1, 1, 1, 1)
    # accepted for config-schema compatibility; shift blocks have no Γ/dropout
    kernel: int = 9
    dropout: Sequence[float] = ()
    importance: bool = False
    remat: bool = False  # per-layer jax.checkpoint (training only)

    def setup(self):
        g = Graph(strategy=self.strategy, **self.graph)
        self.num_joints = g.num_node
        in_ch = (self.in_feat,) + tuple(self.in_ch[1:])
        self.data_bn = make_norm(
            self.normalization, self.in_feat, self.num_joints, per_joint=True
        )
        self.units = [
            ShiftUnit(
                in_channels=in_ch[i],
                out_channels=self.out_ch[i],
                num_joints=self.num_joints,
                stride=self.stride[i],
                residual=bool(self.residual[i]),
                normalization=self.normalization,
            )
            for i in range(len(self.out_ch))
        ]
        self.fc = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(
                stddev=(2.0 / self.num_classes) ** 0.5
            ),
        )

    def __call__(self, x, *, train: bool = False, mask=None):
        x = self.data_bn(x, mask=mask)
        m = mask
        for i, unit in enumerate(self.units):
            if self.remat and train:
                x = _remat.unit(unit, x, m)
            else:
                x = unit(x, train=train, mask=m)
            if self.stride[i] > 1 and m is not None:
                m = m[:, :: self.stride[i]]
        x = jnp.mean(x, axis=(1, 2))
        return self.fc(x)
