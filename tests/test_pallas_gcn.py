"""Fused Pallas graph-conv kernel ≡ the reference-order einsum formulation.

The kernel (stgx/ops/pallas_gcn.py) must match stgx/ops/graph_conv.py
bit-for-bit in math (both accumulate fp32), forward and backward, including
the pre-aggregation bias semantics (/root/reference/models/utils/tgcn.py:71-76).
Runs in Pallas interpret mode on the CPU suite; the same kernel compiles via
Mosaic on TPU.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stgx.ops import graph_conv
from stgx.ops import pallas_gcn


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_gcn, "_INTERPRET", True)


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


@pytest.mark.parametrize(
    "n,l,v,p,cin,cout",
    [
        (2, 37, 25, 3, 16, 32),   # ragged rows: exercises the row-tile pad
        (1, 300, 25, 3, 64, 64),  # canonical PKU-MMD layer shape (tile+pad)
        (3, 11, 7, 2, 6, 8),      # FOG-IT-like small rig
    ],
)
def test_forward_matches_einsum(n, l, v, p, cin, cout):
    rng = np.random.default_rng(0)
    x = _rand(rng, n, l, v, cin)
    A = _rand(rng, p, v, v)
    W = _rand(rng, p, cin, cout)
    b = _rand(rng, p, cout)

    ref = graph_conv.partitioned_gcn(x, A, W, b)
    got = pallas_gcn.partitioned_gcn_pallas(x, A, W, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_forward_no_bias():
    rng = np.random.default_rng(1)
    x = _rand(rng, 2, 50, 25, 32)
    A = _rand(rng, 3, 25, 25)
    W = _rand(rng, 3, 32, 64)
    ref = graph_conv.partitioned_gcn(x, A, W)
    got = pallas_gcn.partitioned_gcn_pallas(x, A, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_vjp_matches_einsum():
    rng = np.random.default_rng(2)
    x = _rand(rng, 2, 23, 25, 16)
    A = _rand(rng, 3, 25, 25)
    W = _rand(rng, 3, 16, 24)
    b = _rand(rng, 3, 24)
    # a scalar loss sensitive to every output element
    probe = _rand(rng, 2, 23, 25, 24)

    def loss_ref(x, A, W, b):
        return jnp.sum(graph_conv.partitioned_gcn(x, A, W, b) * probe)

    def loss_pl(x, A, W, b):
        return jnp.sum(pallas_gcn.partitioned_gcn_pallas(x, A, W, b) * probe)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, A, W, b)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(x, A, W, b)
    for gr, gp, name in zip(g_ref, g_pl, "xAWb"):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=1e-4, atol=1e-4,
            err_msg=f"grad wrt {name}")


def test_jit_and_vmap_compose():
    rng = np.random.default_rng(3)
    x = _rand(rng, 2, 19, 25, 8)
    A = _rand(rng, 3, 25, 25)
    W = _rand(rng, 3, 8, 8)
    f = jax.jit(lambda x: pallas_gcn.partitioned_gcn_pallas(x, A, W))
    ref = graph_conv.partitioned_gcn(x, A, W)
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_impl_switch_dispatches_to_pallas(monkeypatch):
    """partitioned_gcn routes through the fused kernel when selected."""
    import jax.numpy as jnp

    monkeypatch.setattr(pallas_gcn, "_INTERPRET", True)
    rng = np.random.default_rng(4)
    x = _rand(rng, 2, 17, 7, 8)
    A = _rand(rng, 2, 7, 7)
    W = _rand(rng, 2, 8, 8)
    ref = graph_conv.partitioned_gcn(x, A, W)
    graph_conv.set_gcn_impl("pallas")
    try:
        assert graph_conv.get_gcn_impl() == "pallas"
        got = graph_conv.partitioned_gcn(x, A, W)
    finally:
        graph_conv.set_gcn_impl("einsum")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_vjp_fused_grads_kernel(monkeypatch):
    """The fully-fused (gA, gW) reduction kernel (STGX_GCN_BWD=pallas)
    matches the einsum gradients too."""
    monkeypatch.setattr(pallas_gcn, "_BWD_IMPL", "pallas")
    rng = np.random.default_rng(4)
    x = _rand(rng, 2, 29, 25, 16)
    A = _rand(rng, 3, 25, 25)
    W = _rand(rng, 3, 16, 24)
    probe = _rand(rng, 2, 29, 25, 24)

    def loss_ref(x, A, W):
        return jnp.sum(graph_conv.partitioned_gcn(x, A, W) * probe)

    def loss_pl(x, A, W):
        return jnp.sum(pallas_gcn.partitioned_gcn_pallas(x, A, W) * probe)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, A, W)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(x, A, W)
    # per-tile fp32 accumulation reorders the Σ over rows vs the einsum
    for gr, gp, name in zip(g_ref, g_pl, "xAW"):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=1e-3, atol=1e-3,
            err_msg=f"grad wrt {name}")
