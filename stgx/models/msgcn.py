"""MS-GCN — ST-GCN generator + MS-TCN refinement (Filtjens et al.).

Parity with the reference (/root/reference/models/msgcn/msgcn.py:9-63): the
generator is a full window-classifier ST-GCN applied to every frame's
receptive-field window (the window batch dim doubles as time), its per-window
logits are re-laid as a time series, then MS-TCN ``SingleStage`` refinement
stages run over that series through the configured ``refine`` adapter.

Input: window tensor ``(T, W, V, C)`` — one receptive-field window per
output frame (built by stgx.parallel.segments.sliding_windows).
Output: ``(stages+1, 1, T, num_classes)``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from stgx.models.mstcn import SingleStage, output_adapter
from stgx.models.stgcn import Stgcn

__all__ = ["MsGcn"]


class MsGcn(nn.Module):
    num_classes: int
    in_feat: int
    graph: dict[str, Any]
    strategy: str = "spatial"
    normalization: str = "LayerNorm"
    kernel: int = 9
    in_ch: Sequence[int] = (64, 64, 64, 64, 128, 128, 128, 256, 256)
    out_ch: Sequence[int] = (64, 64, 64, 128, 128, 128, 256, 256, 256)
    stride: Sequence[int] = (1, 1, 1, 2, 1, 1, 2, 1, 1)
    residual: Sequence[int] = (1, 1, 1, 1, 1, 1, 1, 1, 1)
    dropout: Sequence[float] = (0,) * 9
    importance: bool = True
    # refinement config (reference msgcn.py:23-30 reads the 'ms-tcn' group)
    stages: int = 4
    filters: Sequence[int] = (64, 64, 64, 64)
    layers: Sequence[int] = (10, 10, 10, 10)
    refine_kernel: Sequence[int] = (3, 3, 3, 3)
    refine_dropout: Sequence[float] = (0.5, 0.5, 0.5, 0.5)
    refine: str = "softmax"
    output_type: str = "logits"
    remat: bool = False  # per-layer jax.checkpoint (training only)

    @nn.compact
    def __call__(self, windows, *, train: bool = False, mask=None):
        prob = output_adapter(self.refine)
        out = output_adapter(self.output_type)

        gen = Stgcn(
            num_classes=self.num_classes,
            in_feat=self.in_feat,
            graph=self.graph,
            strategy=self.strategy,
            normalization=self.normalization,
            kernel=self.kernel,
            in_ch=self.in_ch,
            out_ch=self.out_ch,
            stride=self.stride,
            residual=self.residual,
            dropout=self.dropout,
            importance=self.importance,
            remat=self.remat,
        )
        y = gen(windows, train=train, mask=mask)  # (T, classes), windows = time
        y = y[None]  # (1, T, classes)
        outputs = [out(y)]
        for s in range(self.stages):
            y = SingleStage(
                out_channels=self.num_classes,
                num_filters=self.filters[s],
                num_layers=self.layers[s],
                kernel=self.refine_kernel[s],
                dropout=self.refine_dropout[s],
                remat=self.remat,
            )(prob(y)[:, :, None, :], train=train)[:, :, 0, :]
            outputs.append(out(y))
        return jnp.stack(outputs)
