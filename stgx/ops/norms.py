"""Normalization layers with the reference's exact statistics semantics.

Two norms exist in the reference model family, both essential to its
unequal-length-trials trick (README.md:31 of the reference; "BN adaptation"):

* ``LayerNorm([C, 1, V])`` (reference models/utils/layernorm.py:4-28):
  normalizes each (n, l) sample over the joint and channel dims jointly,
  using torch's default **unbiased** variance (correction=1). Affine params
  are shaped per (v, c).

* ``BatchNorm`` with ``track_running_stats=False`` (reference
  models/utils/batchnorm.py:3-23 and stgcn.py:46,152): **batch statistics are
  recomputed at eval time too** — there are no running stats. Two flavors:
  the input norm treats every (v, c) pair as a channel (stats over N, L);
  per-layer BN treats c as the channel (stats over N, L, V). Torch BN
  normalizes with **biased** variance.

Under a GSPMD-sharded ``jit``, the batch-stat means below reduce over the
``data`` and ``seq`` mesh axes automatically (XLA inserts the psums), which
is exactly the distributed "BN adaptation" the reference approximated with
single-process DataParallel.

Both accept an optional boolean frame mask ``(N, L)`` so padded frames from
length-bucketed trials don't pollute the statistics (the reference avoided
this by construction — its segments always tile the padded length exactly).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["layer_norm", "batch_norm", "LayerNorm", "BatchNorm"]


def layer_norm(x, weight, bias, eps: float = 1e-5):
    """Per-(n, l) normalization over the (V, C) dims with unbiased variance.

    Args:
        x: ``(N, L, V, C)``.
        weight, bias: ``(V, C)`` affine parameters.
    """
    dt = x.dtype
    x = x.astype(jnp.float32)  # stats in fp32 under bf16 compute
    n = x.shape[-1] * x.shape[-2]
    mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
    centered = x - mean
    # torch.var default is unbiased (correction=1) — keep for parity
    var = jnp.sum(centered * centered, axis=(-2, -1), keepdims=True) / (n - 1)
    x = centered / jnp.sqrt(var + eps)
    return (weight * x + bias).astype(dt)


def batch_norm(x, weight, bias, axes, eps: float = 1e-5, mask=None):
    """Batch-stat normalization (biased variance, no running stats).

    Args:
        x: ``(N, L, V, C)``.
        axes: reduction axes — ``(0, 1)`` for per-(v, c) channels (input
            norm) or ``(0, 1, 2)`` for per-c channels (layer BN).
        weight, bias: affine params broadcastable over the kept dims.
        mask: optional ``(N, L)`` bool; padded frames excluded from stats.
    """
    dt = x.dtype
    x = x.astype(jnp.float32)  # stats in fp32 under bf16 compute
    if mask is None:
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean(x * x, axis=axes, keepdims=True) - mean * mean
    else:
        m = mask[:, :, None, None].astype(x.dtype)
        count = jnp.sum(m, axis=axes, keepdims=True) * (
            x.shape[2] if 2 in axes else 1
        )
        mean = jnp.sum(x * m, axis=axes, keepdims=True) / count
        var = jnp.sum(x * x * m, axis=axes, keepdims=True) / count - mean * mean
    x = (x - mean) / jnp.sqrt(var + eps)
    return (weight * x + bias).astype(dt)


class LayerNorm(nn.Module):
    """Affine LayerNorm over the trailing (V, C) dims of ``(N, L, V, C)``."""

    num_joints: int
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None):
        shape = (self.num_joints, self.features)
        weight = self.param("scale", nn.initializers.ones, shape)
        bias = self.param("bias", nn.initializers.zeros, shape)
        return layer_norm(x, weight, bias, self.eps)


class BatchNorm(nn.Module):
    """Batch-stat norm; ``per_joint=True`` gives the (v, c)-channel input norm."""

    features: int
    num_joints: int = 0  # only used when per_joint
    per_joint: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None):
        if self.per_joint:
            shape = (self.num_joints, self.features)
            axes = (0, 1)
        else:
            shape = (self.features,)
            axes = (0, 1, 2)
        weight = self.param("scale", nn.initializers.ones, shape)
        bias = self.param("bias", nn.initializers.zeros, shape)
        return batch_norm(x, weight, bias, axes, self.eps, mask)
