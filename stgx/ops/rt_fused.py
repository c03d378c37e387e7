"""Cross-op fused Pallas kernel for the whole RT-ST-GCN layer core:

    partitioned graph conv (aggregate -> bias -> channel matmul)
        -> causal uniform window-sum

in ONE VMEM pass, forward and backward. This is the op the per-op kernels
(stgx/ops/pallas_gcn.py, stgx/ops/pallas_acc.py) could never be: they each
still paid one HBM read + write at their boundaries, which is exactly the
traffic XLA's per-op fusion already schedules well (both measured slower
than XLA — see their headers). The win targeted here is *inter-op*: the
XLA graph materializes, per layer, the P-expanded aggregation intermediate
(read+write of 3x the activation, tgcn.py:58-79 shape) and the pre-window-
sum activation (read+write); this kernel keeps both in VMEM, so HBM sees
only ``read x + write y_windowed`` for the chain the reference computes at
/root/reference/models/utils/tgcn.py:76 + models/rtstgcn/rtstgcn.py:368-379.

MEASURED VERDICT (round-4 train-step A/B, docs/PERF.md A/B log): the
traffic win does not translate to time — the fused step runs 3.2x SLOWER
than the XLA chain (15.15 vs 4.80 us/frame bf16; fwd-only 6.16 vs 1.64).
The sequential halo-carried grid serializes the small chunked dots where
XLA overlaps its larger traffic at ~100% of bandwidth. The kernel stays as
the selectable VMEM-resident alternative (``arch.rt_fused``), default off.

Kernel structure (forward), grid = (N, L/T) with the time axis iterated
sequentially (innermost):

* aggregate+matmul as chunked MXU ``dot_general``s per partition:
  ``t1 = x_chunk ·_V A_p`` (small K=V dot, negligible FLOPs) then
  ``y += t1 ·_C W_p`` (the big dot, K = C-chunk) — intermediates never
  leave VMEM; layouts chosen so no in-kernel transpose/reshape is needed
  (Mosaic v5e lowers only single-contracting-dim dots whose results land
  as ``(lhs_free..., rhs_free)``; probed in pallas_gcn.py).
* the conv bias (reference adds it *before* the adjacency matmul, so the
  effective term is ``Σ_p colsum(A)_p ⊗ b_p`` — see graph_conv.py) is added
  before the window-sum, preserving the empty-FIFO edge behavior.
* causal window-sum as K-1 shifted adds over the *outer* (time) dim of the
  fp32 accumulator — outer-dim slices don't touch the (sublane, lane)
  tiling, so these are full-width VPU adds, unlike the packed sublane
  rotations that made the standalone shifted-adds kernel slow
  (pallas_acc.py header). Taps that reach before the tile come from an
  ``(H, V, C)`` VMEM scratch carrying the previous tile's tail — persistent
  across grid steps (sequential time iteration), zeroed at each new batch
  element, so frames before t=0 are zero exactly like the reference's
  empty FIFO (rtstgcn.py:591-627).

The backward kernel mirrors it in reversed time order (the anti-causal
window-sum's halo is the *next* tile's gradient head): ``gx`` is the same
trilinear chain on transposed operands, and ``gA``/``gW``/``g_bias``
accumulate in VMEM across the whole grid (batched dots + outer-dim
reductions), so the backward also runs at ``read x + read g + write gx``
HBM traffic instead of re-materializing the P-expanded intermediates.

Numerics: matches the XLA path's dot chain (aggregate emits fp32 and is
rounded to the compute dtype before the channel matmul, which accumulates
fp32 — identical to gcn_aggregate/partitioned_gcn); the window-sum runs in
fp32 *before* the output cast, where the XLA reduce_window path sums
already-rounded bf16 — the kernel is the (slightly) more accurate of the
two. fp32-in, fp32-out is bit-compatible modulo add order.

Enabled per run via ``set_rt_fused(True)`` / env ``STGX_RT_FUSED=1`` / the
``arch.rt_fused`` config key; like the other Pallas kernels it is a
per-device op with no GSPMD partitioning rule, so the Trainer
force-disables it (with a warning) whenever a multi-device mesh is
configured (stgx/parallel/loop.py Trainer.__post_init__), and
``rt_fused_gcn_acc`` itself falls back to the XLA chain when the causal
halo ``(taps-1)·stride`` exceeds the kernel's time tile (very large
``arch.kernel``), where the in-kernel carry scheme cannot apply.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rt_fused_gcn_acc", "set_rt_fused", "rt_fused_enabled"]

# Flipped by tests to run in interpret mode on the CPU mesh.
_INTERPRET = False

_ENABLED = os.environ.get("STGX_RT_FUSED", "0") not in ("", "0", "false")


def set_rt_fused(on: bool) -> None:
    """Trace-time switch (read by RtLayer) — set before jitting/training."""
    global _ENABLED
    _ENABLED = bool(on)


def rt_fused_enabled() -> bool:
    return _ENABLED


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _chunks(c: int, size: int = 128):
    """Static lane-dim chunk slices (last one may be short)."""
    return [(o, min(size, c - o)) for o in range(0, c, size)]


def _tile_t(cin: int, cout: int, fwd: bool) -> int:
    """Time-tile length: bounded by the fp32 aggregation intermediate
    ``(T, C_chunk, V→128)`` and the two fp32 (T, V, C_out) accumulators;
    the grid stays sequential so smaller tiles cost only per-step overhead,
    not halo recompute."""
    c = max(cin, cout)
    if fwd:
        return 128 if c <= 128 else 64
    return 64 if c <= 128 else 32


# ---------------------------------------------------------------- forward


def _fwd_kernel(x_ref, a_ref, w_ref, be_ref, o_ref, halo_ref, ysum_ref, *,
                taps: int, stride: int, partitions: int, tile: int,
                halo: int):
    t_i = pl.program_id(1)

    @pl.when(t_i == 0)
    def _reset():  # new batch element: frames before t=0 are zero
        halo_ref[...] = jnp.zeros_like(halo_ref)

    x = x_ref[0]  # (T, V, Cin)
    cin = x.shape[-1]
    y = None
    for p in range(partitions):
        for off, width in _chunks(cin):
            xc = x[:, :, off : off + width]
            # aggregate: t1[t,c,w] = Σ_v x[t,v,c]·A[p,v,w]. t1 stays fp32
            # into the next dot: Mosaic can't lower the bf16 middle-dim
            # contraction (the (T,V=25) free-dim merge is an unsupported
            # shape cast — same probe as pallas_gcn.py), and the MXU's
            # default precision rounds fp32 inputs to bf16 anyway, so this
            # matches the XLA chain's rounded-aggregate numerics.
            t1 = lax.dot_general(
                xc, a_ref[p], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # channel matmul: y[t,w,d] += Σ_c t1[t,c,w]·W[p,c,d]
            yp = lax.dot_general(
                t1, w_ref[p, off : off + width, :].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = yp if y is None else y + yp
    # reference bias position: before the accumulator (graph_conv.py)
    y = y + be_ref[...].astype(jnp.float32)[None]

    # causal window-sum over the outer (time) dim, halo = previous tile tail
    ysum_ref[...] = y
    for i in range(1, taps):
        o = i * stride
        ysum_ref[o:, :, :] += y[: tile - o]
        ysum_ref[:o, :, :] += halo_ref[halo - o : halo]
    halo_ref[...] = y[tile - halo :]
    o_ref[0] = ysum_ref[...].astype(o_ref.dtype)


def _fwd_call(x, A, W, beff, gamma: int, stride: int):
    n, l, v, cin = x.shape
    p, _, cout = W.shape
    taps = max(1, gamma // stride)
    halo = max(stride, (taps - 1) * stride)
    tile = _tile_t(cin, cout, fwd=True)
    lp = _ceil_to(l, tile)
    if lp != l:
        x = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0), (0, 0)))
    cdt = x.dtype
    grid = (n, lp // tile)

    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, taps=taps, stride=stride, partitions=p,
            tile=tile, halo=halo,
        ),
        out_shape=jax.ShapeDtypeStruct((n, lp, v, cout), cdt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, v, cin), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, v, v), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, cin, cout), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, cout), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, v, cout), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((halo, v, cout), jnp.float32),
            pltpu.VMEM((tile, v, cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # fp32 temporaries in the unrolled partition loop overflow the
            # 16 MB default scoped-VMEM stack (measured: bwd needs 16.7 MB
            # at tile=64, C=64); v5e has 128 MB of VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(x, A.astype(cdt), W.astype(cdt), beff.astype(cdt))
    return out[:, :l]


# --------------------------------------------------------------- backward


def _bwd_kernel(x_ref, g_ref, a_ref, at_ref, w_ref, wt_ref,
                gx_ref, ga_ref, gw_ref, gbe_ref,
                ghalo_ref, gy_ref, *,
                taps: int, stride: int, partitions: int, tile: int,
                halo: int):
    n_i = pl.program_id(0)
    t_i = pl.program_id(1)

    @pl.when((n_i == 0) & (t_i == 0))
    def _init():
        ga_ref[...] = jnp.zeros_like(ga_ref)
        gw_ref[...] = jnp.zeros_like(gw_ref)
        gbe_ref[...] = jnp.zeros_like(gbe_ref)

    @pl.when(t_i == 0)
    def _reset():  # reversed order: first step is the last time tile
        ghalo_ref[...] = jnp.zeros_like(ghalo_ref)

    g = g_ref[0]  # (T, V, D)
    # anti-causal window-sum: gy[t] = Σ_i g[t + i·stride]; future taps come
    # from the next tile's head, carried in ghalo (grid runs time-reversed)
    gy_ref[...] = g.astype(jnp.float32)
    for i in range(1, taps):
        o = i * stride
        gy_ref[: tile - o, :, :] += g[o:].astype(jnp.float32)
        gy_ref[tile - o :, :, :] += ghalo_ref[:o]
    ghalo_ref[...] = g[:halo].astype(jnp.float32)
    gy = gy_ref[...]
    gbe_ref[...] += jnp.sum(gy, axis=0)

    # all dots run on fp32 operands: Mosaic can't lower the bf16 forms
    # whose free-dim merge hits V=25 (unsupported shape cast — the same
    # probe that pins pallas_gcn._grads_kernel to fp32), and the MXU's
    # default precision rounds the inputs to bf16 on the way in anyway.
    x = x_ref[0].astype(jnp.float32)  # (T, V, Cin)
    cin = x.shape[-1]
    cout = g.shape[-1]
    gx = None
    for p in range(partitions):
        # gz[t,w,c] = Σ_d gy[t,w,d]·W[p,c,d]
        gz = lax.dot_general(
            gy, w_ref[p].astype(jnp.float32), (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # gA[p,v,w] += Σ_{t,c} x[t,v,c]·gz[t,w,c] (batched over t)
        u = lax.dot_general(
            x, gz, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (T, V, V)
        ga_ref[p] += jnp.sum(u, axis=0)
        # gx: the forward chain on transposed operands —
        # gx[t,v,c] = Σ_{w,d} gy[t,w,d]·Aᵀ[p,w,v]·Wᵀ[p,d,c]
        for off, width in _chunks(cout):
            h = lax.dot_general(
                gy[:, :, off : off + width], at_ref[p].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (T, Dc, V)
            gp = lax.dot_general(
                h, wt_ref[p, off : off + width, :].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (T, V, Cin)
            gx = gp if gx is None else gx + gp
        # gW[p,c,d] += Σ_{t,w} t1[t,c,w]·gy[t,w,d] with t1 the forward
        # aggregation, recomputed (cheap K=V dot) — batched over t, then
        # reduced over the outer dim
        for off, width in _chunks(cin):
            t1 = lax.dot_general(
                x[:, :, off : off + width], a_ref[p].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (T, Cc, V)
            for doff, dwidth in _chunks(cout):
                bm = lax.dot_general(
                    t1, gy[:, :, doff : doff + dwidth],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (T, Cc, Dc)
                gw_ref[p, off : off + width, doff : doff + dwidth] += (
                    jnp.sum(bm, axis=0)
                )
    gx_ref[0] = gx.astype(gx_ref.dtype)


def _bwd_call(x, g, A, W, gamma: int, stride: int):
    n, l, v, cin = x.shape
    p, _, cout = W.shape
    taps = max(1, gamma // stride)
    halo = max(stride, (taps - 1) * stride)
    tile = _tile_t(cin, cout, fwd=False)
    lp = _ceil_to(l, tile)
    if lp != l:
        pad = ((0, 0), (0, lp - l), (0, 0), (0, 0))
        x = jnp.pad(x, pad)
        g = jnp.pad(g, pad)  # zero grads past the end keep gy/gW/gA exact
    cdt = x.dtype
    nt = lp // tile
    rev = lambda i, t: (i, nt - 1 - t, 0, 0)  # noqa: E731

    gx, ga, gw, gbe = pl.pallas_call(
        functools.partial(
            _bwd_kernel, taps=taps, stride=stride, partitions=p,
            tile=tile, halo=halo,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, lp, v, cin), cdt),
            jax.ShapeDtypeStruct((p, v, v), jnp.float32),
            jax.ShapeDtypeStruct((p, cin, cout), jnp.float32),
            jax.ShapeDtypeStruct((v, cout), jnp.float32),
        ),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, tile, v, cin), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, v, cout), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((p, v, v), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, v, v), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, cin, cout), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, cout, cin), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, v, cin), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((p, v, v), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, cin, cout), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, cout), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((halo, v, cout), jnp.float32),
            pltpu.VMEM((tile, v, cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,  # see _fwd_call
        ),
        interpret=_INTERPRET,
    )(
        x, g.astype(cdt), A.astype(cdt), A.transpose(0, 2, 1).astype(cdt),
        W.astype(cdt), W.transpose(0, 2, 1).astype(cdt),
    )
    return gx[:, :l], ga, gw, gbe


# ------------------------------------------------------------- custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _rt_core(x, A, W, beff, gamma: int, stride: int):
    """``window_sum(gcn(x, A, W) + beff)`` fused; beff is the effective
    additive bias ``Σ_p colsum(A)_p ⊗ b_p`` (computed in XLA so its
    gradient routes to both A and b through autodiff)."""
    return _fwd_call(x, A, W, beff, gamma, stride)


def _rt_fwd(x, A, W, beff, gamma, stride):
    return _fwd_call(x, A, W, beff, gamma, stride), (x, A, W)


def _rt_bwd(gamma, stride, res, g):
    x, A, W = res
    gx, ga, gw, gbe = _bwd_call(x, g, A, W, gamma, stride)
    return gx, ga.astype(A.dtype), gw.astype(W.dtype), gbe


_rt_core.defvjp(_rt_fwd, _rt_bwd)


def rt_fused_gcn_acc(x, A, W, b, gamma: int, stride: int):
    """Fused ``causal_accumulate(partitioned_gcn(x, A, W, b))`` — drop-in
    for the RtLayer main-branch chain (same semantics as
    stgx.ops.graph_conv.partitioned_gcn + stgx.ops.temporal.causal_accumulate).
    """
    taps = max(1, gamma // stride)
    halo = max(stride, (taps - 1) * stride)
    cin, cout = x.shape[-1], W.shape[-1]
    if halo > min(_tile_t(cin, cout, fwd=True), _tile_t(cin, cout, fwd=False)):
        # the halo-carry scheme needs every tap to reach at most one tile
        # back; larger Γ·stride reaches would trace-fail with an opaque
        # slice error inside the kernel — use the XLA chain instead
        from stgx.ops.graph_conv import partitioned_gcn
        from stgx.ops.temporal import causal_accumulate

        return causal_accumulate(partitioned_gcn(x, A, W, b), gamma, stride)
    if b is not None:
        beff = jnp.einsum(
            "pvw,pd->wd", A, b, preferred_element_type=jnp.float32
        )
    else:
        beff = jnp.zeros((A.shape[-1], W.shape[-1]), jnp.float32)
    return _rt_core(x, A, W, beff, gamma, stride)
