"""Explicit sequence-parallel halo exchange over the ``seq`` mesh axis.

The reference reconstructs cross-segment temporal state by *recomputing*
Γ-frame overlaps on every chip (BufferSegment unfold → zero → fold,
segment_generator.py:25-106). On a TPU mesh the idiomatic replacement is a
single neighbor exchange over ICI: each shard sends its edge frames to the
next/previous chip with ``lax.ppermute`` and runs a valid conv on its
halo-extended block — no recompute, no fold.

The GSPMD path (jit + sharding annotations) already does this implicitly
(proven equal to single-device in tests/test_sharding.py); this module is
the explicit ``shard_map`` form for when the schedule must be controlled
by hand — and it is what a future Pallas RDMA kernel would slot into.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.7 top-level export; experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from stgx.ops.temporal import temporal_conv

__all__ = ["halo_exchange", "sp_temporal_conv", "sp_causal_accumulate"]


def halo_exchange(x, left: int, right: int, axis_name: str = "seq"):
    """Extend each shard's frame axis with neighbor edge frames.

    Args:
        x: local block ``(N, L_loc, V, C)``.
        left: frames of left (past) halo to receive from the previous shard.
        right: frames of right (future) halo from the next shard.

    Returns:
        ``(N, left + L_loc + right, V, C)``; boundary shards get zeros
        (matching the zero-padded global sequence).
    """
    n_shards = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    parts = []
    if left > 0:
        # shard i receives the last `left` frames of shard i-1
        src_dst = [(i, i + 1) for i in range(n_shards - 1)]
        from_prev = lax.ppermute(x[:, -left:], axis_name, src_dst)
        from_prev = jnp.where(idx == 0, 0.0, from_prev)
        parts.append(from_prev)
    parts.append(x)
    if right > 0:
        src_dst = [(i + 1, i) for i in range(n_shards - 1)]
        from_next = lax.ppermute(x[:, :right], axis_name, src_dst)
        from_next = jnp.where(idx == n_shards - 1, 0.0, from_next)
        parts.append(from_next)
    return jnp.concatenate(parts, axis=1)


def sp_temporal_conv(mesh, x, W, b=None, stride: int = 1, dilation: int = 1,
                     padding: str = "same"):
    """Sequence-parallel temporal conv: halo exchange + local valid conv.

    ``x`` is sharded ``P(None, 'seq')`` on the frame axis; output keeps that
    sharding. Matches the unsharded :func:`stgx.ops.temporal.temporal_conv`
    exactly (test_halo.py).
    """
    gamma = W.shape[0]
    eff = (gamma - 1) * dilation
    if padding == "same":
        left, right = eff // 2, eff // 2
    elif padding == "causal":
        left, right = eff, 0
    else:
        raise ValueError("sp_temporal_conv supports 'same' or 'causal'")
    n_seq = mesh.shape["seq"]
    l_loc = x.shape[1] // n_seq
    if x.shape[1] % n_seq or l_loc % stride:
        # per-shard length must be a stride multiple so every shard's first
        # output sits on stride phase 0 — then a local *valid* strided conv
        # on the halo-extended block reproduces the global strided conv
        # exactly (local output jl taps global frames
        # [i·L_loc + jl·s − left, … + right], the same window the unsharded
        # conv uses for global output i·L_loc/s + jl)
        raise ValueError(
            f"sequence-parallel strided conv needs the per-shard length "
            f"({x.shape[1]}/{n_seq}) to be a multiple of stride={stride}"
        )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, "seq", None, None), P(), P()),
        out_specs=P(None, "seq", None, None),
    )
    def run(x_loc, W, b):
        ext = halo_exchange(x_loc, left, right)
        return temporal_conv(ext, W, b, stride=stride, dilation=dilation,
                             padding="valid")

    if b is None:
        b = jnp.zeros((W.shape[-1],), W.dtype)
    return run(x, W, b)


def sp_causal_accumulate(mesh, x, kernel_size: int, stride: int):
    """Sequence-parallel RT accumulation: halo of ``(K-1)·s`` past frames,
    then the local sliding-window accumulate."""
    k = kernel_size // stride
    left = (k - 1) * stride

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, "seq", None, None),),
        out_specs=P(None, "seq", None, None),
    )
    def run(x_loc):
        from stgx.ops.temporal import causal_accumulate

        ext = halo_exchange(x_loc, left, 0)
        return causal_accumulate(ext, kernel_size, stride)[:, left:]

    return run(x)
