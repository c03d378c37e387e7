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
]


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
    # treat V as a second spatial dim with kernel 1: NHWC x HWIO -> NHWC
    y = lax.conv_general_dilated(
        x,
        W[:, None].astype(x.dtype),  # (Γ, 1, C_in, C_out)
        window_strides=(stride, 1),
        padding=pad + [(0, 0)],
        rhs_dilation=(dilation, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
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

    Implemented as a causal width-K sliding window-sum (``lax.reduce_window``
    with left padding), per stride phase when ``stride > 1``. K is small
    (Γ/s ≤ 9 here) so this is O(K) VPU adds per element. A cumsum-difference
    formulation looks cheaper on paper but XLA lowers ``cumsum`` itself to a
    full-length reduce-window — O(L) per element — which profiling showed
    eating half the train step; an L×L Toeplitz matmul (the reference's
    construction, rtstgcn.py:368-379) similarly wastes O(L²) work.
    """
    k = kernel_size // stride
    n, l, v, c = x.shape
    if k <= 1:
        return x

    # fp32 accumulation under fp32 compute (pins the FIFO ≡ batch equivalence
    # tests bit-exactly); under bf16 compute stay in bf16 — K ≤ 9 terms, and
    # the fp32 round-trip would double this op's HBM traffic
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
    """Zero carry for the streaming accumulator: a ring buffer of the last
    ``(K-1)*stride`` aggregated frames plus its write cursor."""
    k = kernel_size // stride
    # +1 so the oldest tap (t - (K-1)*stride) is still live after x_t is
    # written into the ring at time t
    depth = (k - 1) * stride + 1
    return {
        "fifo": jnp.zeros((depth, batch, num_joints, channels), dtype=dtype),
        "idx": jnp.zeros((), dtype=jnp.int32),
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
    """
    k = kernel_size // stride
    depth = state["fifo"].shape[0]
    idx = state["idx"]

    if k == 1:
        return x_t, state

    # taps at offsets stride, 2*stride, ..., (k-1)*stride into the past;
    # ring index of frame (t - d) is (idx - d) mod depth, where idx is the
    # slot that frame t is about to be written into... we write first.
    fifo = lax.dynamic_update_index_in_dim(state["fifo"], x_t, idx, axis=0)

    offsets = jnp.arange(1, k, dtype=jnp.int32) * stride  # (k-1,) static shape
    slots = jnp.mod(idx - offsets, depth)
    y_t = x_t + jnp.sum(fifo[slots], axis=0)

    new_state = {"fifo": fifo, "idx": jnp.mod(idx + 1, depth)}
    return y_t, new_state
