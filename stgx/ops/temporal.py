"""Temporal ops: learnable (Γ,1) convolutions and the RT causal accumulator.

Three temporal mechanisms exist across the model family:

* **Centered temporal conv** (ST-GCN/AAGCN TCN): kernel Γ over frames with
  same-padding Γ//2 and optional stride (reference models/stgcn/stgcn.py:
  151-161). Implemented with ``lax.conv_general_dilated`` in NHWC layout so
  XLA maps it onto the MXU.

* **Causal dilated conv** (CoST-GCN / MS-TCN): 'valid' conv over a FIFO of
  past frames, equivalently a left-padded dilated conv (reference
  models/costgcn/costgcn.py:163-173, models/mstcn/mstcn.py:108-112 — MS-TCN
  pads symmetrically).

* **Causal uniform accumulation** (RT-ST-GCN): the FIFO/accumulator
  mechanism, ``y[t] = sum_{i=0}^{K-1} x[t - i*s]`` with ``K = Γ // s`` taps
  spaced ``s`` apart. The reference emulates this in batch with a Toeplitz
  matmul (models/rtstgcn/rtstgcn.py:368-379 — broken as committed, see
  SURVEY.md §5.9; the intended behavior is defined by the FIFO simulation in
  models/rtstgcn/test_rtstgcn.py:52-63) and in streaming with a ring buffer
  (rtstgcn.py:591-627). Here the batch form is a tiny depthwise conv of ones
  and the streaming form is an O(1)-per-frame ring-buffer carry for
  ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "temporal_conv",
    "causal_accumulate",
    "causal_accumulate_step",
    "init_accumulator_state",
    "set_acc_impl",
    "get_acc_impl",
    "set_acc_step_impl",
    "get_acc_step_impl",
]

# Accumulator backend, read at trace time (like stgx.ops.graph_conv._IMPL):
# "auto" picks the fastest measured form (stgx/bench/ablate.py A/Bs them in
# one process on the real chip; numbers in causal_accumulate's docstring —
# currently reduce_window everywhere, so "auto" ≡ "xla"); explicit names
# pin one: "reduce_window" | "slices" | "toeplitz" (XLA forms), "pallas"
# (fused VMEM kernel, stgx/ops/pallas_acc.py), "xla" (alias for the default
# XLA form). NB: the Pallas kernel is a per-device op with no GSPMD
# partitioning rule — don't pin "pallas" for a GSPMD-sharded model (the
# sequence-parallel shard_map path, stgx/parallel/halo.py, may still use
# it per shard).
import os as _os

_ACC_IMPLS = ("auto", "pallas", "xla", "reduce_window", "slices", "toeplitz")
_ACC_IMPL = _os.environ.get("STGX_ACC_IMPL", "auto")

# Streaming-step form (causal_accumulate_step): "taps" = K-1 static slices
# summed (the round-4 shift-FIFO form), "fifo_sum" = one reduction over
# the whole FIFO (masked per stride phase) — O(1) HLO ops instead of O(Γ)
# and no materialized (K-1,B,V,C) tap stack. Measured on one v5e
# (serving.py --acc-step-impls, one process each, 2026-08-21): at Γ=9
# taps wins everywhere tried (B=1 and B=2048, fifo_sum +6%); at Γ=69
# taps wins only B=1 (fifo_sum 3.3× worse — latency-bound, the masked
# reduction over the 69-deep FIFO is pure overhead for one stream) while
# fifo_sum wins B≥8 (−23% at B=8, −40% at B=32, −20% at B=256 where the
# tap-stack traffic binds). "auto" (default) picks fifo_sum iff
# K ≥ 16 and the stream batch ≥ 8, else taps.
_ACC_STEP_IMPLS = ("auto", "taps", "fifo_sum")
_ACC_STEP_IMPL = _os.environ.get("STGX_ACC_STEP_IMPL", "auto")


def set_acc_impl(name: str) -> None:
    global _ACC_IMPL
    if name not in _ACC_IMPLS:
        raise ValueError(f"unknown acc impl: {name!r}")
    _ACC_IMPL = name


def get_acc_impl() -> str:
    return _ACC_IMPL


def set_acc_step_impl(name: str) -> None:
    global _ACC_STEP_IMPL
    if name not in _ACC_STEP_IMPLS:
        raise ValueError(f"unknown acc step impl: {name!r}")
    _ACC_STEP_IMPL = name


def get_acc_step_impl() -> str:
    return _ACC_STEP_IMPL


def temporal_conv(x, W, b=None, stride: int = 1, dilation: int = 1,
                  padding: str | int = "same"):
    """Temporal convolution over the frame axis of ``(N, L, V, C)``.

    Args:
        x: ``(N, L, V, C_in)``.
        W: ``(Γ, C_in, C_out)`` temporal kernel (no joint mixing).
        b: optional ``(C_out,)``.
        stride: temporal stride.
        dilation: temporal dilation.
        padding: ``"same"`` (centered, pads Γ_eff//2 both sides like the
            reference's padding=(Γ-1)//2), ``"causal"`` (left pad only), an
            int for symmetric explicit padding, or ``"valid"``.

    Returns:
        ``(N, ceil(L/stride), V, C_out)`` for "same"; shorter for "valid".
    """
    gamma = W.shape[0]
    eff = (gamma - 1) * dilation
    if padding == "same":
        pad = [(eff // 2, eff // 2)]
    elif padding == "causal":
        pad = [(eff, 0)]
    elif padding == "valid":
        pad = [(0, 0)]
    else:
        pad = [(padding, padding)]
    # treat V as a second spatial dim with kernel 1: NHWC x HWIO -> NHWC.
    # NB: preferred_element_type=fp32 with bf16 operands breaks
    # lax.conv's VJP (the transposed conv gets an fp32 cotangent against
    # the bf16 kernel); emit the operand dtype instead — the MXU still
    # accumulates in fp32 internally, so the rounding is identical
    y = lax.conv_general_dilated(
        x,
        W[:, None].astype(x.dtype),  # (Γ, 1, C_in, C_out)
        window_strides=(stride, 1),
        padding=pad + [(0, 0)],
        rhs_dilation=(dilation, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    ).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


def causal_accumulate(x, kernel_size: int, stride: int):
    """Batch form of the RT-ST-GCN FIFO: ``y[t] = sum_i x[t - i*stride]``.

    ``K = kernel_size // stride`` taps spaced ``stride`` frames apart, frames
    before the start treated as zero (empty FIFO). Output has the same length
    as the input — the RT model never downsamples time; ``stride`` only
    widens the tap spacing (reference rtstgcn.py:368-379).

    Four implementations, selectable via ``set_acc_impl`` / STGX_ACC_IMPL
    and A/B-able in one process with ``stgx.bench.ablate``: "reduce_window"
    (default), "slices", "toeplitz" (block-Toeplitz MXU matmuls), "pallas"
    (fused VMEM kernel, stgx/ops/pallas_acc.py). Measured marginal bf16
    train-step cost on one v5e (on-device scan slope, ~1% repeatability):
    reduce_window 1.25 µs/frame (best), pallas MXU-Toeplitz 2.17, XLA
    toeplitz 3.1, slices worst — XLA's reduce_window graph beats every
    hand-scheduled form on these shapes. A cumsum-difference formulation
    looks cheaper on paper but XLA lowers ``cumsum`` itself to a
    full-length reduce-window — O(L) per element; the reference's dense
    L×L Toeplitz matmul (rtstgcn.py:368-379) wastes O(L²) work (the
    "toeplitz" form here is its O(L·128) block-banded repair).
    """
    k = kernel_size // stride
    n, l, v, c = x.shape
    if k <= 1:
        return x

    impl = _ACC_IMPL
    if impl in ("auto", "xla"):
        # best measured XLA form on the training shapes (see docstring)
        impl = "reduce_window"
    if impl == "pallas":
        from stgx.ops.pallas_acc import (
            causal_accumulate_pallas,
            pallas_acc_supported,
        )

        span_ok = (k - 1) * stride <= 128  # kernel's 128-frame block reach
        if span_ok and pallas_acc_supported(l, v * c, x.dtype.itemsize):
            return causal_accumulate_pallas(x, kernel_size, stride)
        # lane tile's time axis exceeds the kernel's VMEM budget, or the
        # window span exceeds the one-previous-block reach — fall back
        return _reduce_window_accumulate(x, kernel_size, stride)
    if impl == "toeplitz":
        return _block_toeplitz_accumulate(x, kernel_size, stride)
    if impl == "slices":
        return _slices_accumulate(x, kernel_size, stride)
    return _reduce_window_accumulate(x, kernel_size, stride)


def _slices_accumulate(x, kernel_size: int, stride: int):
    """XLA fallback: K statically-shifted strided slices, summed unrolled."""
    k = kernel_size // stride
    n, l, v, c = x.shape
    if k <= 1:
        return x
    # fp32 accumulation under fp32 compute (pins the FIFO ≡ batch equivalence
    # tests bit-exactly); under bf16 compute stay in bf16 — K ≤ 9 terms, and
    # the fp32 round-trip would double this op's HBM traffic
    acc_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32

    pad = (k - 1) * stride
    xp = jnp.pad(
        x.astype(acc_dtype), ((0, 0), (pad, 0), (0, 0), (0, 0))
    )
    # y[t] = sum_i x[t - i*stride], accumulated oldest tap first; summation
    # order is pinned only up to the FIFO≡batch tolerance (integer-exact
    # regardless of order, tests/test_integer_exact.py; fp32 at 1e-4)
    y = xp[:, : l]
    for i in range(k - 2, -1, -1):
        y = y + xp[:, pad - i * stride : pad - i * stride + l]
    return y.astype(x.dtype)


def _toeplitz_bands(k: int, stride: int, block: int):
    """Constant 0/1 band matrices for the block-Toeplitz window-sum:
    ``T0[i, j] = [i - j ∈ taps]`` (within-block), ``T1[i, j] =
    [i + block - j ∈ taps]`` (from the previous block), taps =
    {0, stride, ..., (k-1)·stride}."""
    import numpy as np

    i = np.arange(block)[:, None]
    j = np.arange(block)[None, :]

    def band(d):
        return (
            (d >= 0) & (d <= (k - 1) * stride) & (d % stride == 0)
        ).astype(np.float32)

    return band(i - j), band(i + block - j)


def _block_toeplitz_accumulate(x, kernel_size: int, stride: int,
                               block: int = 128):
    """MXU form of the causal window-sum: time is split into 128-frame
    blocks and each output block is ``T0 @ z_b + T1 @ z_{b-1}`` with
    constant 0/1 band matrices. The adds ride the MXU (adding ~2·128 MACs
    per element ≈ 1% of the model's FLOPs) instead of the VPU's sublane
    shifts, and the backward is the same pair of (transposed) matmuls. This
    is the reference's L×L Toeplitz construction (rtstgcn.py:368-379) made
    O(L·block) and compute-bound-free."""
    k = kernel_size // stride
    n, l, v, c = x.shape
    if k <= 1:
        return x
    if (k - 1) * stride > block:
        return _slices_accumulate(x, kernel_size, stride)
    t0, t1 = _toeplitz_bands(k, stride, block)
    t0 = jnp.asarray(t0, x.dtype)
    t1 = jnp.asarray(t1, x.dtype)
    pad_l = (-l) % block
    xp = (
        jnp.pad(x, ((0, 0), (0, pad_l), (0, 0), (0, 0))) if pad_l else x
    )
    nb = (l + pad_l) // block
    z = xp.reshape(n, nb, block, v * c)
    zprev = jnp.concatenate(
        [jnp.zeros_like(z[:, :1]), z[:, :-1]], axis=1
    )
    y = jnp.einsum(
        "ij,nbjq->nbiq", t0, z, preferred_element_type=jnp.float32
    ) + jnp.einsum(
        "ij,nbjq->nbiq", t1, zprev, preferred_element_type=jnp.float32
    )
    return y.astype(x.dtype).reshape(n, l + pad_l, v, c)[:, :l]


def _reduce_window_accumulate(x, kernel_size: int, stride: int):
    """Default form: causal width-K ``lax.reduce_window`` (per stride phase
    when ``stride > 1``)."""
    k = kernel_size // stride
    n, l, v, c = x.shape
    if k <= 1:
        return x
    acc_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32

    def window_sum(t, time_axis):
        dims = [1] * t.ndim
        strides = [1] * t.ndim
        pad = [(0, 0)] * t.ndim
        dims[time_axis] = k
        pad[time_axis] = (k - 1, 0)  # causal: frames before start are zero
        # NB: init must be a weak-typed Python scalar — a traced/concrete
        # array init breaks reduce_window's reverse-mode autodiff rule
        return lax.reduce_window(
            t.astype(acc_dtype), 0.0, lax.add,
            window_dimensions=dims, window_strides=strides, padding=pad,
        )

    if stride == 1:
        return window_sum(x, 1).astype(x.dtype)
    # phase decomposition: pad L to a stride multiple, reshape to
    # (phase-major) (n, l', s, v, c), window-sum over the per-phase time axis
    lp = -(-l // stride) * stride
    xp = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0), (0, 0)))
    xp = xp.reshape(n, lp // stride, stride, v, c)
    y = window_sum(xp, 1)
    return y.reshape(n, lp, v, c)[:, :l].astype(x.dtype)


def init_accumulator_state(batch, num_joints, channels, kernel_size, stride,
                           dtype=jnp.float32):
    """Zero carry for the streaming accumulator: a shift FIFO of the last
    ``(K-1)*stride`` aggregated frames, newest at slot ``depth-1``."""
    k = kernel_size // stride
    # +1 so the oldest tap (t - (K-1)*stride) is still live after x_t is
    # shifted in at time t
    depth = (k - 1) * stride + 1
    return {
        "fifo": jnp.zeros((depth, batch, num_joints, channels), dtype=dtype),
    }


def causal_accumulate_step(state, x_t, kernel_size: int, stride: int):
    """One streaming step of the causal accumulator.

    Args:
        state: carry from :func:`init_accumulator_state`.
        x_t: ``(N, V, C)`` the current aggregated frame.

    Returns:
        ``(y_t, new_state)`` with ``y_t = sum_{i=0..K-1} x[t - i*stride]``,
        exactly matching :func:`causal_accumulate` frame ``t`` (the FIFO ≡
        batch equivalence the reference proves in test_rtstgcn.py:52-92).

    Implementation is a SHIFT FIFO with static tap indices, not a
    cursor-indexed ring: a dynamic-index gather (``fifo[slots]`` with a
    traced cursor) defeats XLA's in-place carry aliasing inside the
    ``lax.scan`` serving loop, so every frame paid full-state copies — the
    round-4 serving probe measured the accumulator at 91% of the batched
    step (B=2048 bf16: 15.78 ms/step ring vs 8.22 ms shifted, identical
    numerics; a running-sum form measured 7.46 ms but changes the float
    add order and admits drift, rejected — docs/PERF.md).
    """
    k = kernel_size // stride
    if k == 1:
        return x_t, state

    impl = _ACC_STEP_IMPL
    if impl == "auto":
        # measurement-backed rule (see _ACC_STEP_IMPLS note): deep kernels
        # at serving batches are bound by the tap-stack traffic, single
        # streams and shallow kernels by op count
        impl = "fifo_sum" if (k >= 16 and x_t.shape[0] >= 8) else "taps"
    fifo = jnp.concatenate([state["fifo"][1:], x_t[None]], axis=0)
    depth = fifo.shape[0]
    if impl == "fifo_sum":
        # one fused reduction over the whole FIFO instead of K-1 static
        # slices (the slice list is O(Γ) ops at Γ=69); non-tap slots are
        # masked by a constant 0/1 vector when stride > 1 — values equal
        # the taps form up to fp add order
        if stride == 1:
            y_t = jnp.sum(fifo, axis=0)
        else:
            tap_mask = jnp.asarray(
                [(depth - 1 - s) % stride == 0 for s in range(depth)],
                fifo.dtype,
            )
            y_t = jnp.sum(fifo * tap_mask[:, None, None, None], axis=0)
        return y_t, {"fifo": fifo}
    # frame (t - i*stride) sits at static slot depth-1-i*stride
    taps = [fifo[depth - 1 - i * stride] for i in range(1, k)]
    y_t = x_t + jnp.sum(jnp.stack(taps), axis=0)
    return y_t, {"fifo": fifo}
