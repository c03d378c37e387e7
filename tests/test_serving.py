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


# -- round 5: bisection, slope-math pinning, quantized-state serving -----------


def test_bisect_capacity_logic():
    from stgx.bench.serving import bisect_capacity

    # true boundary at 3300: probe(b) = b/110 ms against a 30 ms budget
    calls = []

    def probe(b):
        calls.append(b)
        return b / 110.0

    lo, hi = bisect_capacity(probe, 2048, 4096, 30.0, resolution=128)
    assert lo <= 3300 < hi and hi - lo <= 128, (lo, hi)
    assert all(b % 128 == 0 for b in calls)
    # already-tight bracket probes nothing
    calls.clear()
    assert bisect_capacity(probe, 3200, 3328, 30.0, 128) == (3200, 3328)
    assert calls == []


def test_slope_math_pinned_on_fake_timer():
    """The capacity headline's arithmetic, regression-locked: with a fake
    clock ticking 1.000 s per short scan and 1.028 s per long scan at
    l_long=16, l_short=2, the per-step slope must be exactly 2.0 ms."""
    model, params = _tiny("rt-st-gcn")
    # timed() calls timer twice per repeat, 3 repeats, short then long
    seq = iter([
        0.0, 1.0, 10.0, 11.0, 20.0, 21.0,          # short: 1.000 s each
        30.0, 31.028, 50.0, 51.028, 70.0, 71.028,  # long: 1.028 s each
    ])
    ms, slopes = measure_stream_capacity_onchip(
        model, "rt-st-gcn", params, batch=2, l_long=16,
        timer=lambda: next(seq),
    )
    assert abs(ms - 2.0) < 1e-9, ms
    assert all(abs(s - 2.0) < 1e-9 for s in slopes), slopes


def test_degenerate_scan_length_rejected():
    import pytest

    model, params = _tiny("rt-st-gcn")
    with pytest.raises(ValueError, match="l_long"):
        measure_stream_capacity_onchip(
            model, "rt-st-gcn", params, batch=2, l_long=1
        )


@pytest.mark.parametrize("name", ["rt-st-gcn", "co-st-gcn"])
def test_capacity_measures_int8_state(name):
    from stgx.bench.quant import QUANT_MODELS, calibrate_scales

    model, params = _tiny(name)
    quantize, _, _ = QUANT_MODELS[name]
    qparams = quantize(model, params)
    calib = np.random.default_rng(1).normal(size=(16, 25, 3)).astype(
        np.float32
    )
    scales = calibrate_scales(model, qparams, jnp.asarray(calib), name)
    ms, slopes = measure_stream_capacity_onchip(
        model, name, params, batch=4, l_long=16,
        quant="int8-static", state_dtype=jnp.int8, scales=scales,
    )
    assert np.isfinite(ms) and ms >= 0 and len(slopes) == 3


def test_stream_drift_bounded_int8_state():
    """The numerics half of the int8-state lever: vs the fp32 cell the
    quantized-state stream's drift must stay bounded across the stream
    (each FIFO slot is rounded once at write — no compounding)."""
    from stgx.bench.quant import QUANT_MODELS, calibrate_scales
    from stgx.bench.serving import check_stream_drift

    model, params = _tiny("rt-st-gcn", normalization="LayerNorm")
    quantize, _, _ = QUANT_MODELS["rt-st-gcn"]
    qparams = quantize(model, params)
    calib = np.random.default_rng(2).normal(size=(64, 25, 3)).astype(
        np.float32
    )
    scales = calibrate_scales(model, qparams, jnp.asarray(calib), "rt-st-gcn")
    drift = check_stream_drift(
        model, "rt-st-gcn", params, l=64, batch=2,
        quant="int8-static", state_dtype=jnp.int8, scales=scales,
    )
    assert drift["top1_agreement"] > 0.8, drift
    assert drift["max_rel_drift"] < 0.25, drift
    assert (
        drift["max_abs_drift_second_half"]
        < 5 * drift["max_abs_drift_first_half"] + 1e-3
    ), drift
