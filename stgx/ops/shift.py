"""Learnable per-channel temporal shift — the capability the reference lost.

The reference imports a non-vendored CUDA extension for this op
(``from cuda.shift import Shift``, /root/reference/models/shiftgcn/
shiftgcn.py:8-11), and its absence is why both shift models are commented out
of the registry (models/__init__.py:7-8,18-19). Semantics (Cheng et al. 2020,
Shift-GCN): each channel ``c`` has a learnable real-valued shift ``s_c``;
``y[t, c] = (1-a)·x[t·stride + ⌊s_c⌋, c] + a·x[t·stride + ⌈s_c⌉, c]`` with
``a = s_c - ⌊s_c⌋`` and zeros outside the sequence.

TPU-native formulation: instead of a per-channel gather (hostile to the VPU's
lane layout), the shift is decomposed into a **banded blend** — with shifts
clamped to ``[-K, K]``, ``y = Σ_k w_k(c) · x[t+k]`` over the static band
``k ∈ [-K, K+1]``, where ``w_k`` is the interpolation indicator. This is
(2K+2) vectorized FMAs, fully differentiable in both ``x`` and ``shift``
(the indicators are piecewise-constant; d/ds flows through ``a`` exactly as
the CUDA kernel's analytic gradient), and it fuses.

Two implementations with identical semantics:
* :func:`temporal_shift` — pure jnp (training path; XLA fuses the band);
* :func:`temporal_shift_pallas` — one fused Pallas kernel over VMEM tiles
  (inference hot path; custom VJP backed by the jnp form).

Also here: :func:`spatial_shift` — Shift-GCN's fixed joint-circular channel
rotation (shiftgcn.py:108-118: channel ``j`` of joint ``i`` reads joint
``(i ± j) mod V``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "temporal_shift",
    "temporal_shift_pallas",
    "spatial_shift",
    "shift_band_weights",
    "MAX_SHIFT",
]

MAX_SHIFT = 8  # static band half-width K; shifts clamp to [-K, K]


def shift_band_weights(shift, max_shift: int = MAX_SHIFT):
    """``(2K+2, C)`` interpolation weights for the banded formulation."""
    s = jnp.clip(shift, -max_shift, max_shift)
    f = jnp.floor(s)
    a = s - f
    k = jnp.arange(-max_shift, max_shift + 2, dtype=shift.dtype)[:, None]
    return (1.0 - a) * (k == f) + a * (k == f + 1.0)


def temporal_shift(x, shift, stride: int = 1, max_shift: int = MAX_SHIFT):
    """Banded-blend learnable temporal shift.

    Args:
        x: ``(N, L, V, C)``.
        shift: ``(C,)`` learnable per-channel shift (frames; may be negative
            and fractional).
        stride: temporal downsampling of the output grid.

    Returns:
        ``(N, ceil(L/stride), V, C)``.
    """
    n, l, v, c = x.shape
    out_l = -(-l // stride)
    w = shift_band_weights(shift.astype(x.dtype), max_shift)  # (B, C)
    xp = jnp.pad(x, ((0, 0), (max_shift, max_shift + 1 + stride), (0, 0), (0, 0)))
    y = jnp.zeros((n, out_l, v, c), dtype=x.dtype)
    for i, k in enumerate(range(-max_shift, max_shift + 2)):
        start = max_shift + k
        sl = xp[:, start : start + out_l * stride : stride]
        y = y + w[i] * sl
    return y


def spatial_shift(x, reverse: bool = False):
    """Fixed joint-circular channel rotation: ``y[..., i, j] = x[..., (i+j) %
    V, j]`` (or ``i-j`` when ``reverse``), matching the reference index
    tables (shiftgcn.py:108-118)."""
    n, l, v, c = x.shape
    joints = jnp.arange(v)[:, None]
    chans = jnp.arange(c)[None, :]
    src = jnp.mod(joints + (-chans if reverse else chans), v)  # (V, C)
    return jnp.take_along_axis(x, src[None, None], axis=2)


# -- fused Pallas kernel -------------------------------------------------------


def _shift_kernel(x_ref, w_ref, o_ref, *, band: int, block_l: int):
    """One (1, L-block, C) tile: ``o[t] = Σ_k w[k] · x[t + k]``; ``x_ref``
    carries the tile plus ``band`` frames of halo (index 0 = output frame 0's
    ``k = -K`` tap)."""
    acc = jnp.zeros(o_ref.shape[1:], dtype=o_ref.dtype)
    for i in range(band):
        acc = acc + w_ref[i, :][None, :] * x_ref[0, pl.ds(i, block_l), :]
    o_ref[0, :, :] = acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def temporal_shift_pallas(x, shift, stride: int = 1, max_shift: int = MAX_SHIFT):
    """Fused-kernel temporal shift; semantics identical to
    :func:`temporal_shift` (asserted in tests/test_shift.py)."""
    return _temporal_shift_pallas_fwd_impl(x, shift, stride, max_shift)


def _temporal_shift_pallas_fwd_impl(x, shift, stride, max_shift):
    n, l, v, c = x.shape
    band = 2 * max_shift + 2
    w = shift_band_weights(shift.astype(x.dtype), max_shift)  # (band, C)

    # collapse (N, V) into grid rows; channels stay on the lane dim
    xt = jnp.moveaxis(x, 1, 2).reshape(n * v, l, c)
    # one grid row per (n, v) pair; the whole padded row lives in VMEM
    # (L·C ≲ 3 MB for the model family's shapes), so the L dim needs no
    # halo-overlapping block arithmetic
    xp = jnp.pad(xt, ((0, 0), (max_shift, max_shift + 1), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_shift_kernel, band=band, block_l=l),
        out_shape=jax.ShapeDtypeStruct((n * v, l, c), x.dtype),
        grid=(n * v,),
        in_specs=[
            pl.BlockSpec(
                (1, l + band - 1, c), lambda r: (r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((band, c), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, l, c), lambda r: (r, 0, 0), memory_space=pltpu.VMEM
        ),
    )(xp, w)
    if stride > 1:
        out = out[:, ::stride]
    return jnp.moveaxis(out.reshape(n, v, -1, c), 1, 2)


def _ts_fwd(x, shift, stride, max_shift):
    return _temporal_shift_pallas_fwd_impl(x, shift, stride, max_shift), (x, shift)


def _ts_bwd(stride, max_shift, res, g):
    x, shift = res
    # gradients via the differentiable banded form (identical math)
    _, vjp = jax.vjp(
        lambda x_, s_: temporal_shift(x_, s_, stride, max_shift), x, shift
    )
    return vjp(g)


temporal_shift_pallas.defvjp(_ts_fwd, _ts_bwd)
