"""Temporal/spatial shift op tests: banded form vs direct interpolation,
Pallas kernel vs banded form (interpret mode on CPU), gradients, and the
fixed spatial rotation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stgx.ops import shift as shift_mod
from stgx.ops.shift import (
    spatial_shift,
    shift_band_weights,
    temporal_shift,
)

RNG = np.random.default_rng(0)


def _direct_interp(x, shifts, stride=1):
    """Straightforward numpy interpolation — the CUDA op's documented math."""
    n, l, v, c = x.shape
    out_l = -(-l // stride)
    y = np.zeros((n, out_l, v, c), dtype=x.dtype)
    for ci in range(c):
        s = float(np.clip(shifts[ci], -shift_mod.MAX_SHIFT, shift_mod.MAX_SHIFT))
        f = int(np.floor(s))
        a = s - f
        for to in range(out_l):
            t0 = to * stride + f
            t1 = t0 + 1
            v0 = x[:, t0, :, ci] if 0 <= t0 < l else 0.0
            v1 = x[:, t1, :, ci] if 0 <= t1 < l else 0.0
            y[:, to, :, ci] = (1 - a) * v0 + a * v1
    return y


@pytest.mark.parametrize("stride", [1, 2])
def test_banded_matches_direct_interp(stride):
    x = RNG.normal(size=(2, 30, 5, 12)).astype(np.float32)
    shifts = RNG.uniform(-4, 4, size=12).astype(np.float32)
    y = np.asarray(temporal_shift(jnp.asarray(x), jnp.asarray(shifts), stride))
    y_ref = _direct_interp(x, shifts, stride)
    np.testing.assert_allclose(y, y_ref, atol=1e-5)


def test_band_weights_sum_to_one():
    shifts = jnp.asarray(RNG.uniform(-7.5, 7.5, size=32).astype(np.float32))
    w = shift_band_weights(shifts)
    np.testing.assert_allclose(np.asarray(w.sum(0)), 1.0, atol=1e-6)


def test_integer_shift_is_exact_translation():
    x = RNG.normal(size=(1, 20, 3, 4)).astype(np.float32)
    shifts = jnp.asarray([0.0, 1.0, -2.0, 3.0])
    y = np.asarray(temporal_shift(jnp.asarray(x), shifts))
    np.testing.assert_allclose(y[:, :, :, 0], x[:, :, :, 0], atol=1e-6)
    np.testing.assert_allclose(y[:, :-1, :, 1], x[:, 1:, :, 1], atol=1e-6)
    np.testing.assert_allclose(y[:, 2:, :, 2], x[:, :-2, :, 2], atol=1e-6)


def test_shift_gradients():
    x = jnp.asarray(RNG.normal(size=(1, 16, 3, 6)).astype(np.float32))
    shifts = jnp.asarray(RNG.uniform(-2, 2, size=6).astype(np.float32))

    def f(x, s):
        return jnp.sum(temporal_shift(x, s) ** 2)

    gx, gs = jax.grad(f, argnums=(0, 1))(x, shifts)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gs)).all()
    # analytic check: d interp / ds = x[t+f+1] - x[t+f]; finite difference
    eps = 1e-3
    for ci in [0, 3]:
        sp = shifts.at[ci].add(eps)
        sm = shifts.at[ci].add(-eps)
        fd = (f(x, sp) - f(x, sm)) / (2 * eps)
        np.testing.assert_allclose(float(gs[ci]), float(fd), rtol=2e-2, atol=1e-3)


def test_pallas_kernel_matches_banded_interpret():
    from stgx.ops.shift import temporal_shift_pallas

    x = jnp.asarray(RNG.normal(size=(2, 40, 5, 16)).astype(np.float32))
    shifts = jnp.asarray(RNG.uniform(-5, 5, size=16).astype(np.float32))
    y_band = temporal_shift(x, shifts)
    # interpret mode so the kernel runs on the CPU test mesh
    import jax.experimental.pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        y_pallas = temporal_shift_pallas(x, shifts)
    np.testing.assert_allclose(
        np.asarray(y_pallas), np.asarray(y_band), atol=1e-5
    )


def test_pallas_vjp_matches_banded():
    from stgx.ops.shift import temporal_shift_pallas
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.asarray(RNG.normal(size=(1, 20, 3, 8)).astype(np.float32))
    shifts = jnp.asarray(RNG.uniform(-3, 3, size=8).astype(np.float32))
    g = jnp.asarray(RNG.normal(size=(1, 20, 3, 8)).astype(np.float32))

    _, vjp_band = jax.vjp(lambda x, s: temporal_shift(x, s), x, shifts)
    with pltpu.force_tpu_interpret_mode():
        _, vjp_pl = jax.vjp(
            lambda x, s: temporal_shift_pallas(x, s), x, shifts
        )
        gx_p, gs_p = vjp_pl(g)
    gx_b, gs_b = vjp_band(g)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs_p), np.asarray(gs_b), atol=1e-4)


def test_spatial_shift_roundtrip_and_semantics():
    x = RNG.normal(size=(2, 6, 25, 8)).astype(np.float32)
    y = np.asarray(spatial_shift(jnp.asarray(x)))
    # channel j of joint i reads joint (i + j) % V (reference index table)
    for i in [0, 7, 24]:
        for j in [0, 3, 7]:
            np.testing.assert_allclose(
                y[:, :, i, j], x[:, :, (i + j) % 25, j], atol=0
            )
    # reverse rotation inverts
    z = np.asarray(spatial_shift(spatial_shift(jnp.asarray(x)), reverse=True))
    np.testing.assert_allclose(z, x, atol=0)
