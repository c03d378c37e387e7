"""2s-AGCN / AA-GCN — two-stream adaptive graph convolutional network.

Parity with the reference (/root/reference/models/aagcn/aagcn.py:8-151):

* two independent streams (joints, bones); bone vectors point from each
  node's "far" (centrifugal) neighbor to the node, derived from the raw
  spatial partition (aagcn.py:62-68);
* per-layer adaptive adjacency ``A + B + C``: ``A`` is the normalized
  skeleton adjacency, ``B`` a free learnable ``(P, V, V)`` parameter
  initialized to zero (aagcn.py:120), and ``C`` a data-dependent embedded
  attention ``softmax(θᵀφ)`` contracted over the embedding channels *and*
  the whole time axis (aagcn.py:139-145);
* the rest of the layer is a standard StgcnLayer;
* final prediction sums the two streams' outputs after the configured
  ``output_type`` adapter (logits / logsoftmax / softmax — the original
  paper sums probabilities, aagcn.py:94-95).

Output: ``(N, num_classes)`` per window.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from stgx.graph import Graph
from stgx.models import _remat
from stgx.models.stgcn import (
    StgcnLayer,
    make_norm,
    torch_bias_init,
    torch_conv_init,
)

__all__ = ["AaGcn", "bone_vectors"]


def bone_parents(graph_spec: dict, strategy: str = "spatial") -> np.ndarray:
    """Per-joint parent index for bone extraction, -1 when the joint is no
    node's centrifugal neighbor (the center keeps a zero bone vector).

    Reproduces the reference's loop semantics (aagcn.py:65-68): node ``j``'s
    parent is the *last* ``i`` (in index order) whose raw far-partition row
    contains ``j``.
    """
    g = Graph(strategy=strategy, **graph_spec)
    far = g.A_spatial_raw[2].astype(bool)  # rows i → centrifugal neighbors j
    parents = np.full(g.num_node, -1, dtype=np.int32)
    for i in range(g.num_node):
        parents[far[i]] = i
    return parents


def bone_vectors(x, parents):
    """``(N, L, V, C)`` joints → bones: ``x[..., j] - x[..., parent(j)]``."""
    has_parent = parents >= 0
    safe = jnp.where(has_parent, parents, 0)
    bones = x - x[:, :, safe]
    return jnp.where(has_parent[None, None, :, None], bones, 0.0)


class AgcnLayer(nn.Module):
    """Adaptive adjacency (A + B + C) in front of a standard StgcnLayer."""

    in_channels: int
    out_channels: int
    gamma: int
    partitions: int
    num_joints: int
    stride: int = 1
    dropout: float = 0.0
    residual: bool = True
    normalization: str = "LayerNorm"
    coeff_embedding: int = 4

    @nn.compact
    def __call__(self, x, A, *, train: bool = False, mask=None):
        emb = self.out_channels // self.coeff_embedding
        B = self.param(
            "B",
            nn.initializers.zeros,
            (self.partitions, self.num_joints, self.num_joints),
        )
        wt = self.param(
            "theta_kernel",
            torch_conv_init(self.in_channels),
            (self.in_channels, self.partitions * emb),
        )
        bt = self.param(
            "theta_bias", torch_bias_init(self.in_channels), (self.partitions * emb,)
        )
        wp = self.param(
            "phi_kernel",
            torch_conv_init(self.in_channels),
            (self.in_channels, self.partitions * emb),
        )
        bp = self.param(
            "phi_bias", torch_bias_init(self.in_channels), (self.partitions * emb,)
        )
        n, l, v, _ = x.shape
        theta = (x @ wt + bt).reshape(n, l, v, self.partitions, emb)
        phi = (x @ wp + bp).reshape(n, l, v, self.partitions, emb)
        # attention over the full window: contract embedding channels and time
        scores = jnp.einsum(
            "nlvpe,nlwpe->npvw", theta, phi, preferred_element_type=jnp.float32
        )
        C = jax.nn.softmax(scores, axis=-1).astype(x.dtype)

        A_total = A[None] + B[None] + C  # (N, P, V, V)
        return StgcnLayer(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            gamma=self.gamma,
            partitions=self.partitions,
            num_joints=self.num_joints,
            stride=self.stride,
            dropout=self.dropout,
            residual=self.residual,
            normalization=self.normalization,
        )(x, A_total, train=train, mask=mask)


class _Stream(nn.Module):
    """One AAGCN stream: norm_in → fcn_in → AgcnLayers → pool → fcn_out."""

    num_classes: int
    in_feat: int
    num_joints: int
    partitions: int
    A: Any
    normalization: str
    kernel: int
    in_ch: Sequence[int]
    out_ch: Sequence[int]
    stride: Sequence[int]
    residual: Sequence[int]
    dropout: Sequence[float]
    importance: bool
    remat: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False, mask=None):
        x = make_norm(
            self.normalization, self.in_feat, self.num_joints, per_joint=True
        )(x, mask=mask)
        x = nn.Dense(
            self.in_ch[0],
            kernel_init=torch_conv_init(self.in_feat),
            bias_init=torch_bias_init(self.in_feat),
        )(x)
        if self.importance:
            ei = self.param(
                "edge_importance",
                nn.initializers.ones,
                (len(self.in_ch), self.partitions, self.num_joints, self.num_joints),
            )
        for i in range(len(self.in_ch)):
            A = self.A * ei[i] if self.importance else self.A
            layer = AgcnLayer(
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
            if self.remat and train:
                x = _remat.gcn_layer(layer, x, A, mask)
            else:
                x = layer(x, A, train=train, mask=mask)
            if mask is not None:
                # strided layers shorten the frame axis (see StgcnLayer)
                mask = mask[:, :: self.stride[i]]
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(
            self.num_classes,
            kernel_init=torch_conv_init(self.out_ch[-1]),
            bias_init=torch_bias_init(self.out_ch[-1]),
        )(x)


class AaGcn(nn.Module):
    """Two-stream AAGCN window classifier: ``(N, L, V, C)`` → ``(N, classes)``."""

    num_classes: int
    in_feat: int
    graph: dict[str, Any]
    strategy: str = "spatial"
    normalization: str = "LayerNorm"
    output_type: str = "logits"
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
        self._parents = jnp.asarray(bone_parents(self.graph, self.strategy))
        common = dict(
            num_classes=self.num_classes,
            in_feat=self.in_feat,
            num_joints=g.num_node,
            partitions=self.A.shape[0],
            A=self.A,
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
        self.joint_stream = _Stream(**common)
        self.bone_stream = _Stream(**common)

    def _prob(self, x):
        if self.output_type == "logits":
            return x
        if self.output_type == "logsoftmax":
            return jax.nn.log_softmax(x, axis=-1)
        if self.output_type == "softmax":
            return jax.nn.softmax(x, axis=-1)
        raise ValueError(f"unknown output_type: {self.output_type!r}")

    def __call__(self, x, *, train: bool = False, mask=None):
        bones = bone_vectors(x, self._parents)
        yj = self.joint_stream(x, train=train, mask=mask)
        yb = self.bone_stream(bones, train=train, mask=mask)
        return self._prob(yj) + self._prob(yb)
