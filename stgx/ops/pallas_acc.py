"""Fused Pallas kernel for the RT-ST-GCN causal window-sum.

``y[t] = sum_{j=0}^{K-1} x[t - j*stride]`` — the batch form of the
reference's FIFO accumulator (/root/reference/models/rtstgcn/rtstgcn.py:
368-379 intent; see stgx/ops/temporal.py). The op is pure bandwidth (K ≤ 9
adds per element), so the floor is one HBM read + one write per direction.
Every XLA formulation over-reads (measured marginal bf16 train-step cost on
v5e, stgx/bench/ablate.py: ``lax.reduce_window`` ~1.2 µs/frame, shifted
slices and a two-einsum block-Toeplitz worse) against a ~0.17 µs two-pass
floor.

Kernel shape: ``(N, L, V, C)`` is viewed as ``(N, L, V*C)``; the grid is
``(N, V*C // TQ)`` and each program holds the FULL time axis of one lane
tile in VMEM. Inside the kernel the window-sum is computed on the **MXU**
as a block-banded Toeplitz product — per 128-frame time block,
``y_b = T0 @ x_b + T1 @ x_{b-1}`` with constant 0/1 band matrices — rather
than as VPU shifted adds: sublane shifts by the 1..8-row tap offsets are
packed-format rotations Mosaic executes slowly for bf16 (a shifted-adds
variant of this same kernel measured ~2.6 µs/frame marginal, worse than
XLA), while the aligned 128×128 dots add only ~2·128 MACs/element (~1% of
the model's matmul FLOPs) and no HBM traffic. The custom VJP is the
mirrored product (transposed bands, halo from the next block).

Measured (scan-slope, one v5e, bf16 train step): this kernel 2.17 µs/frame
marginal vs reduce_window's 1.25 — the dedicated kernel is ~13× over its
own read+write traffic model while XLA's reduce_window graph beats it, so
(as with stgx/ops/pallas_gcn.py) the XLA form stays the default and this
kernel is the selectable alternative (``set_acc_impl("pallas")``) and the
Mosaic reference for the op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["causal_accumulate_pallas", "pallas_acc_supported"]

_TB = 128  # time block = MXU tile
# VMEM budget for (in + out) × double buffering + scratch
_VMEM_BYTES = 10 * 2**20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _bands(k: int, stride: int):
    """(T0, T1) with ``y_b = T0 @ x_b + T1 @ x_{b-1}`` — the same band
    construction as the XLA toeplitz form, at this kernel's block size."""
    from stgx.ops.temporal import _toeplitz_bands

    return _toeplitz_bands(k, stride, _TB)


def _kernel(x_ref, t0_ref, t1_ref, o_ref, *, length: int, reverse: bool):
    """One (1, L, TQ) lane tile. ``reverse`` runs the anti-causal transpose
    (the VJP): halo from the next block instead of the previous."""
    x = x_ref[0]
    t0 = t0_ref[...]
    t1 = t1_ref[...]
    nb = -(-length // _TB)
    for b in range(nb):
        lo = b * _TB
        rows = min(_TB, length - lo)
        xb = x[lo : lo + rows]
        acc = jax.lax.dot_general(
            t0[:rows, :rows], xb,
            dimension_numbers=((( 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if not reverse and b > 0:
            # taps reaching into the previous time block
            acc = acc + jax.lax.dot_general(
                t1[:rows, :], x[lo - _TB : lo],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if reverse and b + 1 < nb:
            nrows = min(_TB, length - (lo + _TB))
            acc = acc + jax.lax.dot_general(
                t1[:rows, :nrows], x[lo + _TB : lo + _TB + nrows],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[0, lo : lo + rows] = acc.astype(o_ref.dtype)


def _pick_tq(l: int, q: int, itemsize: int) -> int:
    tq = min(512, _round_up(q, 128))
    while tq > 128 and 6 * l * tq * itemsize > _VMEM_BYTES:
        tq //= 2
    return tq


def pallas_acc_supported(l: int, q: int, itemsize: int = 2) -> bool:
    """Whether one lane tile's full time axis fits the kernel's VMEM budget."""
    return 6 * l * 128 * itemsize <= _VMEM_BYTES


def _call(x3, k, stride, reverse):
    n, l, q = x3.shape
    tq = _pick_tq(l, q, x3.dtype.itemsize)
    t0, t1 = _bands(k, stride)
    if reverse:
        # transpose of the block-Toeplitz operator: T0ᵀ within-block, T1ᵀ
        # pulling from the NEXT block
        t0, t1 = t0.T, t1.T
    t0 = jnp.asarray(t0, x3.dtype)
    t1 = jnp.asarray(t1, x3.dtype)
    return pl.pallas_call(
        functools.partial(_kernel, length=l, reverse=reverse),
        out_shape=jax.ShapeDtypeStruct((n, l, q), x3.dtype),
        grid=(n, pl.cdiv(q, tq)),
        in_specs=[
            pl.BlockSpec((1, l, tq), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, _TB), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, _TB), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, tq), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
    )(x3, t0, t1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def causal_accumulate_pallas(x, kernel_size: int, stride: int):
    """Drop-in fused form of :func:`stgx.ops.temporal.causal_accumulate`
    (asserted equal in tests/test_pallas_acc.py). TPU backend only;
    ``set_acc_impl("pallas")`` routes here after checking
    :func:`pallas_acc_supported`. Requires ``(K-1)·stride ≤ 128``."""
    return _fwd_impl(x, kernel_size, stride)


def _fwd_impl(x, kernel_size, stride):
    k = kernel_size // stride
    if k <= 1:
        return x
    if (k - 1) * stride > _TB:
        raise ValueError(
            f"window span {(k - 1) * stride} exceeds the {_TB}-frame block"
        )
    n, l, v, c = x.shape
    y = _call(x.reshape(n, l, v * c), k, stride, reverse=False)
    return y.reshape(n, l, v, c)


def _acc_fwd(x, kernel_size, stride):
    return _fwd_impl(x, kernel_size, stride), None


def _acc_bwd(kernel_size, stride, _, g):
    k = kernel_size // stride
    if k <= 1:
        return (g,)
    n, l, v, c = g.shape
    dx = _call(g.reshape(n, l, v * c), k, stride, reverse=True)
    return (dx.reshape(n, l, v, c),)


causal_accumulate_pallas.defvjp(_acc_fwd, _acc_bwd)
