"""Fused Pallas kernel for the RT-ST-GCN causal window-sum.

``y[t] = sum_{j=0}^{K-1} x[t - j*stride]`` — the batch form of the
reference's FIFO accumulator (/root/reference/models/rtstgcn/rtstgcn.py:
368-379 intent; see stgx/ops/temporal.py). The op is pure bandwidth: K ≤ 9
VPU adds per element, so the floor is one HBM read + one write per
direction. XLA's formulations all over-read: ``lax.reduce_window`` costs
~1.1 µs/frame marginal in the bf16 train step (its select-and-scatter-style
VJP dominates) and an unrolled shifted-slice sum ~1.6 µs/frame (measured on
v5e, stgx/bench/ablate.py) against a ~0.17 µs two-pass floor.

Kernel shape: ``(N, L, V, C)`` is viewed as ``(N, L, V*C)``; the grid is
``(N, V*C // TQ)`` and each program holds the FULL time axis of one lane
tile in VMEM (``L·TQ ≤ ~1 MB`` for the model family's shapes — the same
whole-row choice as the shift kernel, stgx/ops/shift.py:120-123). That
keeps index maps trivial (dense prefetch pipelining) and needs no
halo-block arithmetic: the causal history is materialized by one in-VMEM
zero-pad. The custom VJP runs the mirrored (anti-causal) kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["causal_accumulate_pallas", "pallas_acc_supported"]

# VMEM budget for (in + out + padded scratch) × double buffering
_VMEM_BYTES = 10 * 2**20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fwd_kernel(x_ref, o_ref, *, k: int, stride: int, length: int):
    """y[t] = Σ_j x[t - j·s]; frames before the start are zero."""
    pad = (k - 1) * stride
    z = jnp.pad(x_ref[0], ((pad, 0), (0, 0)))  # (pad + L, TQ) in VMEM
    acc = z[: length]  # oldest tap (j = k-1) first
    for j in range(k - 2, -1, -1):
        off = pad - j * stride
        acc = acc + z[off : off + length]
    o_ref[0] = acc


def _bwd_kernel(g_ref, o_ref, *, k: int, stride: int, length: int):
    """dx[t] = Σ_j dy[t + j·s] (anti-causal). No masking needed: blocks span
    the full time axis (never padded on L), and ragged lane-tile padding
    only feeds padded lanes — the op mixes nothing across lanes."""
    pad = (k - 1) * stride
    z = jnp.pad(g_ref[0], ((0, pad), (0, 0)))
    acc = z[pad :]  # farthest-future tap first (mirror of forward)
    for j in range(k - 2, -1, -1):
        off = j * stride
        acc = acc + z[off : off + length]
    o_ref[0] = acc


def _pick_tq(l: int, q: int, itemsize: int) -> int:
    tq = min(512, _round_up(q, 128))
    while tq > 128 and 6 * l * tq * itemsize > _VMEM_BYTES:
        tq //= 2
    return tq


def pallas_acc_supported(l: int, q: int, itemsize: int = 2) -> bool:
    """Whether one lane tile's full time axis fits the kernel's VMEM budget."""
    return 6 * l * 128 * itemsize <= _VMEM_BYTES


def _call(kernel, x3):
    n, l, q = x3.shape
    tq = _pick_tq(l, q, x3.dtype.itemsize)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, l, q), x3.dtype),
        grid=(n, pl.cdiv(q, tq)),
        in_specs=[
            pl.BlockSpec((1, l, tq), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, tq), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
    )(x3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def causal_accumulate_pallas(x, kernel_size: int, stride: int):
    """Drop-in fused form of :func:`stgx.ops.temporal.causal_accumulate`
    (asserted equal in tests/test_pallas_acc.py). TPU backend only; the
    dispatcher checks :func:`pallas_acc_supported` first."""
    return _fwd_impl(x, kernel_size, stride)


def _fwd_impl(x, kernel_size, stride):
    k = kernel_size // stride
    if k <= 1:
        return x
    n, l, v, c = x.shape
    y = _call(
        functools.partial(_fwd_kernel, k=k, stride=stride, length=l),
        x.reshape(n, l, v * c),
    )
    return y.reshape(n, l, v, c)


def _acc_fwd(x, kernel_size, stride):
    return _fwd_impl(x, kernel_size, stride), None


def _acc_bwd(kernel_size, stride, _, g):
    k = kernel_size // stride
    if k <= 1:
        return (g,)
    n, l, v, c = g.shape
    dx = _call(
        functools.partial(_bwd_kernel, k=k, stride=stride, length=l),
        g.reshape(n, l, v * c),
    )
    return (dx.reshape(n, l, v, c),)


causal_accumulate_pallas.defvjp(_acc_fwd, _acc_bwd)
