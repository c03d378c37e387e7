"""Batched streaming serving-capacity bench (stgx/bench/serving.py) smoke:
the B-stream cell measures on the CPU mesh, and the batch axis advances B
streams whose *FIFO carries* never mix. Stream independence is exact for
LayerNorm models (per-stream normalization); for BatchNorm models the
stat-recomputing BN (the family's BN-adaptation trick, reference
models/utils/norm.py semantics) deliberately adapts on everything in the
batch, so co-served streams share adaptation statistics — a documented
deployment property (stgx/bench/serving.py), not an error."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stgx.bench.serving import measure_stream_capacity_onchip
from stgx.graph import load_skeleton
from stgx.models import MODELS


def _tiny(name, normalization="BatchNorm"):
    kw = dict(
        num_classes=5, in_feat=3, graph=load_skeleton("pku-mmd"),
        normalization=normalization, kernel=3, in_ch=(8, 8), out_ch=(8, 8),
        residual=(1, 1), dropout=(0.0, 0.0), importance=True,
    )
    if name == "co-st-gcn":
        kw["dilation"] = (1, 2)
    else:
        kw["stride"] = (1, 2)
    model = MODELS[name](**kw)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(np.zeros((1, 16, 25, 3), np.float32)),
    )
    return model, params


@pytest.mark.parametrize("name", ["rt-st-gcn", "co-st-gcn"])
def test_capacity_measures(name):
    model, params = _tiny(name)
    ms, slopes = measure_stream_capacity_onchip(
        model, name, params, batch=4, l_long=16
    )
    assert np.isfinite(ms) and ms >= 0 and len(slopes) == 3


def _run_stream(model, params, batch_frames):
    from stgx.models import rtstgcn

    state = rtstgcn.init_stream_state(
        model, params, batch=batch_frames.shape[1]
    )

    def body(carry, x_t):
        logits, new = rtstgcn.stream_step(model, params, carry, x_t)
        return new, logits

    _, ys = jax.lax.scan(body, state, batch_frames)
    return np.asarray(ys)


def test_batched_layernorm_streams_are_independent():
    model, params = _tiny("rt-st-gcn", normalization="LayerNorm")
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(12, 3, 25, 3)).astype(np.float32))
    batched = _run_stream(model, params, xs)  # (L, 3, classes)
    solo = _run_stream(model, params, xs[:, :1])  # stream 0 alone
    np.testing.assert_allclose(batched[:, 0], solo[:, 0], rtol=2e-4,
                               atol=2e-5)


def test_batched_batchnorm_streams_share_adaptation():
    # the BN-adaptation trick is batch-wide BY DESIGN: co-served streams
    # must influence each other (if this starts passing with allclose, the
    # serving docs' independence caveat is stale — update both)
    model, params = _tiny("rt-st-gcn", normalization="BatchNorm")
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(12, 3, 25, 3)).astype(np.float32))
    batched = _run_stream(model, params, xs)
    solo = _run_stream(model, params, xs[:, :1])
    assert np.abs(batched[:, 0] - solo[:, 0]).max() > 1e-3
