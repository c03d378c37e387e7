"""Explicit shard_map halo exchange ≡ unsharded ops (8-device seq mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from stgx.ops.temporal import causal_accumulate, temporal_conv
from stgx.parallel.halo import sp_causal_accumulate, sp_temporal_conv
from stgx.parallel.mesh import make_mesh

RNG = np.random.default_rng(0)


def _sharded(mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P(None, "seq", None, None)))


def test_sp_temporal_conv_matches(devices):
    mesh = make_mesh(data=1, seq=8)
    x = jnp.asarray(RNG.normal(size=(2, 64, 5, 8)).astype(np.float32))
    W = jnp.asarray(RNG.normal(size=(9, 8, 8)).astype(np.float32))
    b = jnp.asarray(RNG.normal(size=(8,)).astype(np.float32))
    y_ref = temporal_conv(x, W, b)
    y_sp = sp_temporal_conv(mesh, _sharded(mesh, x), W, b)
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref), atol=1e-5)


def test_sp_temporal_conv_strided(devices):
    mesh = make_mesh(data=1, seq=8)
    x = jnp.asarray(RNG.normal(size=(2, 64, 5, 8)).astype(np.float32))
    W = jnp.asarray(RNG.normal(size=(9, 8, 8)).astype(np.float32))
    b = jnp.asarray(RNG.normal(size=(8,)).astype(np.float32))
    for stride, padding in [(2, "same"), (4, "same"), (2, "causal")]:
        y_ref = temporal_conv(x, W, b, stride=stride, padding=padding)
        y_sp = sp_temporal_conv(mesh, _sharded(mesh, x), W, b, stride=stride,
                                padding=padding)
        np.testing.assert_allclose(
            np.asarray(y_sp), np.asarray(y_ref), atol=1e-5
        )


def test_sp_temporal_conv_stride_misaligned_raises(devices):
    import pytest

    mesh = make_mesh(data=1, seq=8)
    x = jnp.asarray(RNG.normal(size=(1, 32, 3, 4)).astype(np.float32))
    W = jnp.asarray(RNG.normal(size=(9, 4, 4)).astype(np.float32))
    with pytest.raises(ValueError, match="multiple of stride"):
        sp_temporal_conv(mesh, _sharded(mesh, x), W, stride=8)


def test_sp_temporal_conv_causal_dilated(devices):
    mesh = make_mesh(data=1, seq=8)
    x = jnp.asarray(RNG.normal(size=(1, 64, 3, 4)).astype(np.float32))
    W = jnp.asarray(RNG.normal(size=(5, 4, 4)).astype(np.float32))
    y_ref = temporal_conv(x, W, dilation=2, padding="causal")
    y_sp = sp_temporal_conv(mesh, _sharded(mesh, x), W, dilation=2,
                            padding="causal")
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref), atol=1e-5)


def test_sp_causal_accumulate_matches(devices):
    mesh = make_mesh(data=1, seq=8)
    x = jnp.asarray(RNG.normal(size=(2, 64, 5, 4)).astype(np.float32))
    for gamma, stride in [(9, 1), (5, 1), (9, 2), (8, 4)]:
        y_ref = causal_accumulate(x, gamma, stride)
        y_sp = sp_causal_accumulate(mesh, _sharded(mesh, x), gamma, stride)
        np.testing.assert_allclose(
            np.asarray(y_sp), np.asarray(y_ref), atol=1e-4
        )
