"""K-partitioned spatial graph convolution — the SpMM at the heart of every
model in the family.

The reference computes it as ``1x1 conv -> reshape (N,P,C*L,V) -> matmul with
(P,V,V) adjacency -> sum over P`` (/root/reference/models/utils/tgcn.py:58-79).
Algebraically that is

    y[n,l,w,d] = sum_p sum_v sum_c  x[n,l,v,c] * W[p,c,d] * Ahat[p,w,v]

where ``Ahat[p] = (A * edge_importance)[p]`` with rows indexing the output
node's neighborhood. We exploit associativity and contract the *cheap* factor
first: aggregate over the tiny V×V adjacency (V <= 25), then do one big MXU
matmul over the stacked (P*C) contraction dim. For C_in=64..256 and P=3 this
is the FLOP-optimal order whenever C_out >= C_in and turns the whole op into
a single ``(N*L*V, P*C_in) x (P*C_in, C_out)`` matmul that XLA tiles onto the
MXU with the bias and any following elementwise ops fused.

Skeleton adjacencies are dense small matrices, so "SpMM" here is best served
by dense contraction — a sparse gather kernel would waste the MXU.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

__all__ = ["gcn_aggregate", "partitioned_gcn", "set_gcn_impl", "get_gcn_impl"]

# Which implementation `partitioned_gcn` dispatches to: "einsum" (XLA, the
# default) or "pallas" (fused VMEM kernel, stgx/ops/pallas_gcn.py). Read at
# TRACE time — switching after a jit cache is warm requires retracing (the
# Trainer keys its jit cache by shape only, so set this before training).
_IMPL = os.environ.get("STGX_GCN_IMPL", "einsum")


def set_gcn_impl(name: str) -> None:
    """Select the graph-conv backend ("einsum" | "einsum_wfirst" |
    "pallas"); also settable via the STGX_GCN_IMPL env var or the
    `arch.gcn_impl` config key."""
    global _IMPL
    if name not in ("einsum", "einsum_wfirst", "pallas"):
        raise ValueError(f"unknown gcn impl: {name!r}")
    _IMPL = name


def get_gcn_impl() -> str:
    return _IMPL


def gcn_aggregate(x, A):
    """Neighborhood aggregation per partition.

    Args:
        x: ``(N, L, V, C)`` node features.
        A: ``(P, V, V)`` partitioned adjacency, possibly already multiplied by
            the layer's edge-importance mask. Indexed ``A[p, v, w]`` with the
            stgx convention ``y[..., w] = sum_v x[..., v] A[p, v, w]``
            (matching the reference's transposed layout, tgcn.py:76).

    Returns:
        ``(N, L, V, P, C)`` per-partition aggregated features. The partition
        axis sits *inside* V so the consumer matmul's stacked ``(P, C)``
        contraction dim is contiguous — emitting ``(N, L, P, V, C)`` instead
        forces XLA to materialize a physical transpose of the P-expanded
        intermediate (an extra full HBM pass) before the dot.
    """
    y = jnp.einsum("nlvc,pvw->nlwpc", x, A, preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def partitioned_gcn(x, A, W, b=None):
    """Full partitioned graph convolution.

    Args:
        x: ``(N, L, V, C_in)``.
        A: ``(P, V, V)`` (already edge-importance weighted if applicable).
        W: ``(P, C_in, C_out)`` partition-wise pointwise weights.
        b: optional ``(P, C_out)`` per-partition bias. The reference adds the
            1x1-conv bias *before* the adjacency matmul (tgcn.py:71-76), so
            the effective additive term is ``sum_p colsum(A)[p, w] * b[p, d]``
            — reproduced here exactly (it depends on the edge-importance-
            weighted A, so it cannot be folded statically).

    Returns:
        ``(N, L, V, C_out)``.
    """
    if _IMPL == "pallas":
        from stgx.ops.pallas_gcn import partitioned_gcn_pallas

        return partitioned_gcn_pallas(x, A, W, b)
    if _IMPL == "einsum_wfirst":
        # contract channels first: one big (C_in -> P*C_out) MXU matmul
        # WRITES the P-expanded intermediate, the tiny V-aggregation reads
        # it. Same FLOPs as aggregate-first; different producer/consumer
        # efficiency for the 3x intermediate's HBM traffic.
        z = jnp.einsum(
            "nlvc,pcd->nlvpd", x, W, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        y = jnp.einsum(
            "nlvpd,pvw->nlwd", z, A, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    else:
        agg = gcn_aggregate(x, A)
        # one MXU matmul over the stacked (P, C_in) contraction dim
        y = jnp.einsum(
            "nlwpc,pcd->nlwd", agg, W, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    if b is not None:
        y = y + jnp.einsum("pvw,pd->wd", A, b).astype(x.dtype)
    return y
