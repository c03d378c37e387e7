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
covers the trilinear core — backward runs as plain einsums, which XLA
handles well because each gradient contracts away the P·V² factor
immediately.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["partitioned_gcn_pallas", "gcn_core_pallas"]

# Flipped by tests to run the kernel in Pallas interpret mode on CPU (the
# suite runs on a virtual CPU mesh, conftest.py); on TPU leave False.
_INTERPRET = False

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


def _core_fwd(x, A, W):
    return _core_fwd_impl(x, A, W), (x, A, W)


def _core_bwd(res, g):
    x, A, W = res
    # each grad contracts the P·V² factor away first — cheap einsums
    gw = jnp.einsum("rvc,pvw,rwd->pcd", x, A, g,
                    preferred_element_type=jnp.float32).astype(W.dtype)
    ga = jnp.einsum("rvc,rwd,pcd->pvw", x, g, W,
                    preferred_element_type=jnp.float32).astype(A.dtype)
    gx = jnp.einsum("rwd,pvw,pcd->rvc", g, A, W,
                    preferred_element_type=jnp.float32).astype(x.dtype)
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
