"""Fused Pallas causal window-sum ≡ the XLA form, values and gradients.

Runs the TPU kernel in interpreter mode on CPU (the real-chip path is
exercised by bench.py / stgx.bench.ablate). Covers ragged L (block-padding
masking in the anti-causal backward), stride phases, and both dtypes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from stgx.ops.pallas_acc import causal_accumulate_pallas
from stgx.ops.temporal import causal_accumulate


CASES = [
    # (L, V, C, gamma, stride)
    (30, 7, 8, 9, 1),
    (300, 7, 16, 9, 1),
    (257, 5, 8, 9, 3),  # ragged L across time blocks
    (64, 7, 8, 8, 2),
    (16, 3, 4, 4, 4),
]


@pytest.mark.parametrize("l,v,c,gamma,stride", CASES)
def test_pallas_matches_xla(l, v, c, gamma, stride):
    x = jnp.asarray(
        np.random.default_rng(l + stride).normal(size=(2, l, v, c)),
        jnp.float32,
    )
    ref = causal_accumulate(x, gamma, stride)
    with pltpu.force_tpu_interpret_mode():
        got = causal_accumulate_pallas(x, gamma, stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("l,v,c,gamma,stride", CASES)
def test_pallas_grad_matches_xla(l, v, c, gamma, stride):
    x = jnp.asarray(
        np.random.default_rng(100 + l).normal(size=(2, l, v, c)), jnp.float32
    )
    ct = jnp.asarray(
        np.random.default_rng(200 + l).normal(size=(2, l, v, c)), jnp.float32
    )

    def f_ref(x_):
        return jnp.vdot(causal_accumulate(x_, gamma, stride), ct)

    def f_pl(x_):
        return jnp.vdot(causal_accumulate_pallas(x_, gamma, stride), ct)

    g_ref = jax.grad(f_ref)(x)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(f_pl)(x)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_ref), atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("l,v,c,gamma,stride", CASES)
def test_xla_impls_agree(l, v, c, gamma, stride):
    from stgx.ops.temporal import (
        _block_toeplitz_accumulate,
        _reduce_window_accumulate,
        _slices_accumulate,
    )

    x = jnp.asarray(
        np.random.default_rng(l * 7 + stride).normal(size=(2, l, v, c)),
        jnp.float32,
    )
    ref = _reduce_window_accumulate(x, gamma, stride)
    for impl in (_slices_accumulate, _block_toeplitz_accumulate):
        np.testing.assert_allclose(
            np.asarray(impl(x, gamma, stride)), np.asarray(ref), atol=1e-5
        )
        g_ref = jax.grad(
            lambda t: jnp.sum(jnp.sin(_reduce_window_accumulate(t, gamma, stride)))
        )(x)
        g = jax.grad(lambda t: jnp.sum(jnp.sin(impl(t, gamma, stride))))(x)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), atol=1e-4
        )


def test_bf16_roundtrip():
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 40, 5, 8)), jnp.bfloat16
    )
    ref = causal_accumulate(x, 9, 1)
    with pltpu.force_tpu_interpret_mode():
        got = causal_accumulate_pallas(x, 9, 1)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.1, rtol=0.05,
    )
