"""Fused Pallas kernel for the K-partitioned graph convolution.

The two-einsum formulation (stgx/ops/graph_conv.py) materializes the
per-partition aggregation ``(N, L, P, V, C)`` in HBM — at PKU-MMD training
shapes that intermediate is ~3× the activation itself and dominates the
layer's memory traffic. This kernel keeps the whole chain

    for p:  t_p = contract_V(x, A_p);  acc += contract_C(t_p, W_p)

in VMEM per row-tile, so HBM sees only ``read x + write y``.

Mosaic notes (probed on TPU v5e): in-kernel reshapes that merge into the
128-lane dim are unsupported, so the kernel uses two 3D×2D ``dot_general``s
whose results land as ``(lhs_free..., rhs_free)`` — no reshapes or
transposes at all. ``x`` stays in its natural ``(rows, V, C)`` layout with
channels on the lane axis; the intermediate ``(rows, C, W)`` puts the tiny
joint dim on lanes (padded to 128) which bounds the tile size (see
``_tile_rows``). Matmul inputs round to bf16 like every default-precision
TPU matmul — the kernel matches XLA's own two-step ``dot_general`` chain
exactly (0 ULP in probes), not the fp64 einsum.

The conv bias stays outside the kernel (it is the cheap
``Σ_p colsum(A)_p ⊗ b_p`` term, see graph_conv.py), so the custom VJP only
covers the trilinear core. In the backward, ``gx`` is the same trilinear
core with transposed operands (one more fused forward-kernel call — saves a
P-expanded HBM intermediate); the parameter grads ``(gA, gW)`` default to
plain einsums, which XLA CSEs/fuses better than the fully-fused reduction
kernel (``_grads_impl``) — that kernel keeps everything in VMEM but its
row-tile is VMEM-bound to ~16 rows at C=256, starving the MXU (measured
~2x slower than the einsums on the v5e training shapes; selectable with
STGX_GCN_BWD=pallas).

Measured on one TPU v5e (rt-st-gcn 9-layer PKU-MMD shapes, bf16, RTT-free
slope): einsum backend 249.6k frames/s fwd / 200.6k train; pallas backend
98.4k fwd / 149.0k train (the fully-fused grads kernel variant: 72.8k).
XLA's fusion of the einsum chain beats the hand kernel on these shapes —
its V=25 contractions run as big row-batched matmuls, while the kernel's
per-tile (tile,C,V) dots are K=25-starved on the MXU. The einsum backend is
therefore the default everywhere; this kernel stays as the
VMEM-resident alternative (selectable via arch.gcn_impl / STGX_GCN_IMPL)
for regimes where the P-expanded HBM intermediate is the binding
constraint, and as the Mosaic reference for the op.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["partitioned_gcn_pallas", "gcn_core_pallas"]

# Flipped by tests to run the kernel in Pallas interpret mode on CPU (the
# suite runs on a virtual CPU mesh, conftest.py); on TPU leave False.
_INTERPRET = False

# Parameter-grad path: "einsum" (default, fastest measured) or "pallas"
# (fully-fused reduction kernel, kept for small-VMEM regimes). Trace-time.
_BWD_IMPL = os.environ.get("STGX_GCN_BWD", "einsum")

_DN = (((1,), (0,)), ((), ()))  # contract lhs dim 1 with rhs dim 0


def _tile_rows(cin: int) -> int:
    """Row-tile size: the per-partition intermediate ``(tile, C, V→128)``
    is the VMEM high-water mark; keep it ≲ 4 MB fp32 so the whole kernel
    (blocks + double-buffering + intermediates) fits the 16 MB budget."""
    return max(32, min(128, 8192 // max(cin, 64)))


def _kernel(x_ref, a_ref, w_ref, o_ref, *, partitions: int):
    x = x_ref[...]  # (tile, V, Cin), channels on lanes
    acc = None
    for p in range(partitions):
        # Σ_v x[t,v,c]·A[p,v,w] → (tile, Cin, W): neighborhood aggregation
        t1 = lax.dot_general(x, a_ref[p], _DN,
                             preferred_element_type=jnp.float32)
        # Σ_c t1[t,c,w]·W[p,c,d] → (tile, W, D): channel mixing
        y = lax.dot_general(t1, w_ref[p], _DN,
                            preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    o_ref[...] = acc.astype(o_ref.dtype)


@jax.custom_vjp
def gcn_core_pallas(x, A, W):
    """``y[r, w, d] = Σ_{p,v,c} x[r,v,c] · A[p,v,w] · W[p,c,d]`` fused.

    Args:
        x: ``(R, V, C_in)`` flattened rows (R = N·L).
        A: ``(P, V, V)`` adjacency (edge-importance already applied),
            indexed ``A[p, v, w]`` like stgx.ops.graph_conv.
        W: ``(P, C_in, C_out)``.
    """
    return _core_fwd_impl(x, A, W)


def _core_fwd_impl(x, A, W):
    r, v, cin = x.shape
    p, _, cout = W.shape
    if x.dtype == jnp.bfloat16 and min(cin, cout) < 8:
        # Mosaic hits an unsupported tpu.reshape on bf16 blocks whose lane
        # dim is tiny (raw 3/6-channel inputs); run those in fp32 — default
        # matmul precision makes it the same single MXU pass
        return _core_fwd_impl(
            x.astype(jnp.float32), A.astype(jnp.float32),
            W.astype(jnp.float32),
        ).astype(x.dtype)
    tile = _tile_rows(cin)
    n_tiles = -(-r // tile)
    xp = jnp.pad(x, ((0, n_tiles * tile - r), (0, 0), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, partitions=p),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, v, cout), x.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, v, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, v, v), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, v, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_INTERPRET,
    )(xp, A.astype(x.dtype), W.astype(x.dtype))
    return out[:r]


def _grads_kernel(x_ref, g_ref, a_ref, w_ref, ga_ref, gw_ref, *,
                  partitions: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        ga_ref[...] = jnp.zeros_like(ga_ref)
        gw_ref[...] = jnp.zeros_like(gw_ref)

    # Mosaic only lowers single-contracting-dim matmuls, so the Σ over rows
    # runs as a batched dot (rows = batch) + reduction over the leading axis.
    # Blocks upcast to fp32: bf16 batched dots hit an unsupported
    # tpu.reshape in Mosaic, and default matmul precision keeps the MXU
    # pass count identical either way.
    x = x_ref[...].astype(jnp.float32)  # (tile, V, Cin)
    g = g_ref[...].astype(jnp.float32)  # (tile, W, Cout)
    for p in range(partitions):
        # t1[t,c,w] = Σ_v x[t,v,c]·A[p,v,w] — the forward's aggregation
        t1 = lax.dot_general(x, a_ref[p].astype(jnp.float32), _DN,
                             preferred_element_type=jnp.float32)
        # gW[p][c,d] += Σ_t (t1[t]ᵀ·g[t])[c,d]
        bm = lax.dot_general(
            t1, g, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (tile, Cin, Cout)
        gw_ref[p] += jnp.sum(bm, axis=0)
        # u[t,w,c] = Σ_d g[t,w,d]·W[p,c,d]
        u = lax.dot_general(g, w_ref[p].astype(jnp.float32),
                            (((2,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        # gA[p][v,w] += Σ_t (x[t]·u[t]ᵀ)[v,w]
        ba = lax.dot_general(
            x, u, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (tile, V, W)
        ga_ref[p] += jnp.sum(ba, axis=0)


def _grads_impl(x, g, A, W):
    r, v, cin = x.shape
    p, _, cout = W.shape
    # smaller row tile than the forward: the (tile, Cin, Cout) fp32 batched
    # product is the VMEM high-water mark here
    tile = max(8, min(64, 4096 // max(cin, 64)))
    n_tiles = -(-r // tile)
    pad = ((0, n_tiles * tile - r), (0, 0), (0, 0))
    xp = jnp.pad(x, pad)  # zero rows contribute nothing to either grad
    gp = jnp.pad(g, pad)

    ga, gw = pl.pallas_call(
        functools.partial(_grads_kernel, partitions=p),
        out_shape=(
            jax.ShapeDtypeStruct((p, v, v), jnp.float32),
            jax.ShapeDtypeStruct((p, cin, cout), jnp.float32),
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, v, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, v, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, v, v), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((p, v, v), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=_INTERPRET,
    )(xp, gp, A.astype(x.dtype), W.astype(x.dtype))
    return ga, gw


def _core_fwd(x, A, W):
    return _core_fwd_impl(x, A, W), (x, A, W)


def _core_bwd(res, g):
    x, A, W = res
    # gx is the trilinear core itself with transposed operands:
    #   gx[r,v,c] = Σ_{p,w,d} g[r,w,d]·A[p,v,w]·W[p,c,d]
    gx = _core_fwd_impl(
        g.astype(x.dtype), A.transpose(0, 2, 1), W.transpose(0, 2, 1)
    )
    if _BWD_IMPL == "pallas":
        ga, gw = _grads_impl(x, g.astype(x.dtype), A, W)
        return gx, ga.astype(A.dtype), gw.astype(W.dtype)
    gw = jnp.einsum("rvc,pvw,rwd->pcd", x, A, g,
                    preferred_element_type=jnp.float32).astype(W.dtype)
    ga = jnp.einsum("rvc,rwd,pcd->pvw", x, g, W,
                    preferred_element_type=jnp.float32).astype(A.dtype)
    return gx, ga, gw


gcn_core_pallas.defvjp(_core_fwd, _core_bwd)


def partitioned_gcn_pallas(x, A, W, b=None):
    """Drop-in fused replacement for :func:`stgx.ops.graph_conv.partitioned_gcn`
    (same ``(N, L, V, C)`` interface and bias semantics)."""
    n, l, v, c = x.shape
    y = gcn_core_pallas(x.reshape(n * l, v, c), A, W)
    y = y.reshape(n, l, v, W.shape[-1])
    if b is not None:
        y = y + jnp.einsum("pvw,pd->wd", A, b).astype(y.dtype)
    return y
