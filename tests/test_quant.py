"""Int8 PTQ tests: weight quantization error bounds, int8 streaming cell
closeness to fp32, size reduction."""

import jax
import jax.numpy as jnp
import numpy as np

from stgx.bench.quant import (
    init_quant_stream_state,
    int8_matmul,
    quantize_rtstgcn,
    quantize_weight,
    quantized_size_bytes,
    quantized_stream_step,
)
from stgx.bench.streaming import param_bytes
from stgx.graph import load_skeleton
from stgx.models.rtstgcn import RtStgcn, stream_sequence

SKEL = load_skeleton("imu_fogit_ABCD")
RNG = np.random.default_rng(0)


def test_weight_quantization_roundtrip():
    w = jnp.asarray(RNG.normal(size=(32, 16)).astype(np.float32))
    wq, s = quantize_weight(w)
    assert wq.dtype == jnp.int8
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(s) - np.asarray(w))
    # max error ≤ half a quantization step per output channel
    steps = np.asarray(s)
    assert (err <= 0.5 * steps[None, :] + 1e-7).all()


def test_int8_matmul_close_to_fp32():
    x = jnp.asarray(RNG.normal(size=(4, 64)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(64, 32)).astype(np.float32))
    wq, s = quantize_weight(w)
    y_q = np.asarray(int8_matmul(x, wq, s))
    y = np.asarray(x @ w)
    rel = np.abs(y_q - y).max() / np.abs(y).max()
    assert rel < 0.05, rel


def _model_and_params():
    model = RtStgcn(
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8, 16), out_ch=(8, 16, 16), stride=(1, 1, 1),
        residual=(1, 1, 1), dropout=(0.0,) * 3, normalization="LayerNorm",
    )
    x = RNG.normal(size=(1, 24, 7, 6)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    return model, params, x


def test_quantized_stream_close_to_fp32():
    model, params, x = _model_and_params()
    y_fp, _ = stream_sequence(model, params, jnp.asarray(x))

    qparams = quantize_rtstgcn(model, params)
    state = init_quant_stream_state(model)
    outs = []
    for t in range(x.shape[1]):
        logits, state = quantized_stream_step(
            model, qparams, state, jnp.asarray(x[:, t])
        )
        outs.append(np.asarray(logits))
    y_q = np.stack(outs, axis=1)  # (1, L, classes)
    y_fp = np.asarray(y_fp)
    # int8 tracks fp32 predictions
    agree = (y_q.argmax(-1) == y_fp.argmax(-1)).mean()
    assert agree > 0.9, agree
    rel = np.abs(y_q - y_fp).mean() / (np.abs(y_fp).mean() + 1e-9)
    assert rel < 0.2, rel


def test_calibrate_then_static_tracks_fp32():
    """The reference's calibrate→convert flow (processor.py:909-913): static
    scales from an observer pass must track fp32 as well as dynamic does."""
    from stgx.bench.quant import calibrate_scales, quant_mode

    model, params, x = _model_and_params()
    y_fp, _ = stream_sequence(model, params, jnp.asarray(x))
    qparams = quantize_rtstgcn(model, params)

    scales = calibrate_scales(
        model, qparams, jnp.asarray(x[0]), "rt-st-gcn"
    )
    assert isinstance(scales, dict) and len(scales) > 0
    assert all(v > 0 for v in scales.values())
    assert "fcn_in" in scales and "fcn_out" in scales

    with quant_mode("static", scales):
        state = init_quant_stream_state(model)
        outs = []
        for t in range(x.shape[1]):
            logits, state = quantized_stream_step(
                model, qparams, state, jnp.asarray(x[:, t])
            )
            outs.append(np.asarray(logits))
    y_q = np.stack(outs, axis=1)
    y_fp = np.asarray(y_fp)
    agree = (y_q.argmax(-1) == y_fp.argmax(-1)).mean()
    assert agree > 0.9, agree
    rel = np.abs(y_q - y_fp).mean() / (np.abs(y_fp).mean() + 1e-9)
    assert rel < 0.2, rel


def test_static_mode_retrace_safe():
    """Static scales are keyed by site id, so separate jits, scan bodies
    and repeat traces all stay site-aligned (the failure mode of a
    consumed-once iterator or a call-order cursor)."""
    from stgx.bench.quant import calibrate_scales, quant_mode

    model, params, x = _model_and_params()
    qparams = quantize_rtstgcn(model, params)
    scales = calibrate_scales(model, qparams, jnp.asarray(x[0]), "rt-st-gcn")

    with quant_mode("static", scales):
        state = init_quant_stream_state(model)
        x_t = jnp.asarray(x[:, 0])
        # two independent jit instances → two traces
        j1 = jax.jit(lambda s, f: quantized_stream_step(model, qparams, s, f))
        j2 = jax.jit(lambda s, f: quantized_stream_step(model, qparams, s, f))
        l1, _ = j1(state, x_t)
        l2, _ = j2(state, x_t)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2))

        # a scan (third trace) over the full stream
        def body(st, x_t):
            logits, st2 = quantized_stream_step(model, qparams, st, x_t[None])
            return st2, logits

        _, ys = jax.lax.scan(body, init_quant_stream_state(model),
                             jnp.asarray(x[0]))
        np.testing.assert_allclose(
            np.asarray(ys[0, 0]), np.asarray(l1[0]), rtol=1e-5, atol=1e-5
        )


def test_static_scale_site_mismatch_fails_loudly():
    """Scales are keyed by site id (round-3 verdict #6): a calibration taken
    on a different model/arch must raise at trace time, never silently
    misassign scales."""
    import pytest

    from stgx.bench.quant import calibrate_scales, quant_mode

    model, params, x = _model_and_params()
    qparams = quantize_rtstgcn(model, params)
    scales = calibrate_scales(model, qparams, jnp.asarray(x[0]), "rt-st-gcn")

    # a site the cell needs is missing from the calibration → KeyError
    missing = {k: v for k, v in scales.items() if k != "layers.1.gcn"}
    with pytest.raises(KeyError, match="layers.1.gcn"):
        with quant_mode("static", missing):
            quantized_stream_step(
                model, qparams, init_quant_stream_state(model),
                jnp.asarray(x[:, 0]),
            )

    # a calibrated site the cell never consumes → ValueError on exit
    extra = dict(scales, **{"layers.99.gcn": 1.0})
    with pytest.raises(ValueError, match="never consumed"):
        with quant_mode("static", extra):
            quantized_stream_step(
                model, qparams, init_quant_stream_state(model),
                jnp.asarray(x[:, 0]),
            )

    # legacy call-order scale vectors are rejected outright
    with pytest.raises(ValueError, match="site-keyed"):
        with quant_mode("static", np.ones(5, np.float32)):
            pass


def test_duplicate_site_in_one_trace_rejected():
    import pytest

    from stgx.bench.quant import _static_reset, quant_mode

    rng = np.random.default_rng(7)  # local: the module RNG's draw order
    # feeds later tests' data
    x = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    wq, s = quantize_weight(w)
    with pytest.raises(ValueError, match="consumed twice"):
        with quant_mode("static", {"s0": 1.0}):
            _static_reset()
            int8_matmul(x, wq, s, site="s0")
            int8_matmul(x, wq, s, site="s0")


def test_w8_mode_tighter_than_int8():
    """Weight-only int8 never quantizes activations, so it must sit closer
    to fp32 than the full int8 cell."""
    from stgx.bench.quant import quant_mode

    model, params, x = _model_and_params()
    y_fp, _ = stream_sequence(model, params, jnp.asarray(x))
    qparams = quantize_rtstgcn(model, params)

    def run(mode):
        with quant_mode(mode):
            state = init_quant_stream_state(model)
            outs = []
            for t in range(x.shape[1]):
                logits, state = quantized_stream_step(
                    model, qparams, state, jnp.asarray(x[:, t])
                )
                outs.append(np.asarray(logits))
        return np.stack(outs, axis=1)

    y_fp = np.asarray(y_fp)
    err_w8 = np.abs(run("w8") - y_fp).mean()
    err_i8 = np.abs(run("dynamic") - y_fp).mean()
    assert err_w8 <= err_i8 + 1e-9, (err_w8, err_i8)
    rel = err_w8 / (np.abs(y_fp).mean() + 1e-9)
    assert rel < 0.1, rel


def test_costgcn_static_mode():
    from stgx.bench.quant import QUANT_MODELS, calibrate_scales, quant_mode
    from stgx.models.costgcn import CoStgcn
    from stgx.models.costgcn import stream_sequence as co_stream

    model = CoStgcn(
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8, 16), out_ch=(8, 16, 16), dilation=(1, 2, 1),
        residual=(1, 1, 1), dropout=(0.0,) * 3, normalization="LayerNorm",
    )
    x = RNG.normal(size=(1, 24, 7, 6)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y_fp = np.asarray(co_stream(model, params, jnp.asarray(x))[0])

    quantize, qstep, qinit = QUANT_MODELS["co-st-gcn"]
    qparams = quantize(model, params)
    scales = calibrate_scales(model, qparams, jnp.asarray(x[0]), "co-st-gcn")
    with quant_mode("static", scales):
        state = qinit(model)
        outs = []
        for t in range(x.shape[1]):
            logits, state = qstep(model, qparams, state, jnp.asarray(x[:, t]))
            outs.append(np.asarray(logits))
    y_q = np.stack(outs, axis=1)
    agree = (y_q.argmax(-1) == y_fp.argmax(-1)).mean()
    assert agree > 0.9, agree


def test_int8_size_reduction():
    model, params, _ = _model_and_params()
    qparams = quantize_rtstgcn(model, params)
    fp_bytes = param_bytes(params)
    q_bytes = quantized_size_bytes(qparams)
    # matmul weights dominate; int8 cuts total well below fp32
    assert q_bytes < 0.75 * fp_bytes, (q_bytes, fp_bytes)


def test_quantized_costgcn_stream_close_to_fp32():
    """The reference's published int8 table includes CoST-GCN
    (README.md:269-270) — the continual cell quantizes generically."""
    from stgx.bench.quant import QUANT_MODELS, quantize_costgcn
    from stgx.models.costgcn import CoStgcn
    from stgx.models.costgcn import stream_sequence as co_stream

    model = CoStgcn(
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8, 16), out_ch=(8, 16, 16), dilation=(1, 2, 1),
        residual=(1, 1, 1), dropout=(0.0,) * 3, normalization="LayerNorm",
    )
    x = RNG.normal(size=(1, 24, 7, 6)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y_fp, _ = co_stream(model, params, jnp.asarray(x))

    quantize, qstep, qinit = QUANT_MODELS["co-st-gcn"]
    assert quantize is quantize_costgcn
    qparams = quantize(model, params)
    state = qinit(model)
    outs = []
    for t in range(x.shape[1]):
        logits, state = qstep(model, qparams, state, jnp.asarray(x[:, t]))
        outs.append(np.asarray(logits))
    y_q = np.stack(outs, axis=1)
    y_fp = np.asarray(y_fp)
    agree = (y_q.argmax(-1) == y_fp.argmax(-1)).mean()
    assert agree > 0.9, agree
    rel = np.abs(y_q - y_fp).mean() / (np.abs(y_fp).mean() + 1e-9)
    assert rel < 0.2, rel


def _stgcn_model_and_params():
    from stgx.models.stgcn import Stgcn

    model = Stgcn(
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8, 16), out_ch=(8, 16, 16), stride=(1, 2, 1),
        residual=(1, 1, 1), dropout=(0.0,) * 3, normalization="LayerNorm",
    )
    x = RNG.normal(size=(2, 16, 7, 6)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    return model, params, x


def test_int8_temporal_conv_matches_temporal_conv():
    """The im2col + single-matmul rewrite must equal the conv form exactly
    in w8 mode (weights upcast — only the contraction is restructured)."""
    from stgx.bench.quant import _int8_temporal_conv, quant_mode
    from stgx.ops.temporal import temporal_conv

    rng = np.random.default_rng(5)
    for stride, l in [(1, 16), (2, 16), (2, 15)]:
        x = jnp.asarray(rng.normal(size=(2, l, 7, 8)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 8, 8)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        ref = temporal_conv(x, w, b, stride=stride)
        tq, ts = quantize_weight(w.reshape(-1, 8))
        with quant_mode("w8"):
            got = _int8_temporal_conv(x, tq, ts, b, 3, stride)
        # w8 keeps int8-rounded weights; compare against the conv run on the
        # same dequantized kernel for an exact-structure check
        ref_q = temporal_conv(
            x, (tq.astype(jnp.float32) * ts).reshape(3, 8, 8), b,
            stride=stride,
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref_q), rtol=1e-5, atol=1e-5
        )


def test_quantized_stgcn_window_close_to_fp32():
    """TPU-native counterpart of the reference's FX-quantizable ST-GCN clone
    (models/stgcn/stgcn_quantizable.py): same trained params, matmuls
    rewritten to int8 — predictions must track the fp32 window forward."""
    from stgx.bench.quant import quantize_stgcn, quantized_stgcn_window

    model, params, x = _stgcn_model_and_params()
    y_fp = np.asarray(model.apply(params, jnp.asarray(x)))
    qparams = quantize_stgcn(model, params)
    y_q = np.asarray(quantized_stgcn_window(model, qparams, jnp.asarray(x)))
    assert y_q.shape == y_fp.shape
    assert (y_q.argmax(-1) == y_fp.argmax(-1)).mean() == 1.0
    rel = np.abs(y_q - y_fp).mean() / (np.abs(y_fp).mean() + 1e-9)
    assert rel < 0.2, rel


def test_quantized_stgcn_stream_and_static():
    from stgx.bench.quant import (
        QUANT_MODELS,
        calibrate_scales,
        quant_mode,
        quantized_size_bytes,
    )

    model, params, x = _stgcn_model_and_params()
    quantize, qstep, qinit = QUANT_MODELS["st-gcn"]
    qparams = quantize(model, params)
    assert quantized_size_bytes(qparams) < 0.75 * param_bytes(params)

    state = qinit(model, batch=2, window=8)
    scales = calibrate_scales(model, qparams, jnp.asarray(x[0, :4]), "st-gcn")
    assert all(v > 0 for v in scales.values())
    with quant_mode("static", scales):
        logits, state = qstep(model, qparams, state, jnp.asarray(x[:, 0]))
    assert logits.shape == (2, 5) and np.isfinite(np.asarray(logits)).all()


def test_quantized_costgcn_size_reduction():
    from stgx.bench.quant import quantize_costgcn, quantized_size_bytes
    from stgx.models.costgcn import CoStgcn

    model = CoStgcn(
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8, 16), out_ch=(8, 16, 16), dilation=(1, 1, 1),
        residual=(1, 1, 1), dropout=(0.0,) * 3, normalization="LayerNorm",
    )
    x = RNG.normal(size=(1, 16, 7, 6)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    qparams = quantize_costgcn(model, params)
    assert quantized_size_bytes(qparams) < 0.75 * param_bytes(params)


# -- FIFO-state dtype (round 5: state bytes bind the serving step) -------------


def test_int8_state_requires_static_scales():
    """A live per-frame scale would misprice older taps — int8 FIFO state
    must refuse to trace outside static mode."""
    import pytest

    model, params, x = _model_and_params()
    qparams = quantize_rtstgcn(model, params)
    state = init_quant_stream_state(model, dtype=jnp.int8)
    with pytest.raises(ValueError, match="static calibrated scales"):
        quantized_stream_step(model, qparams, state, jnp.asarray(x[:, 0]))


def test_calibration_observes_state_sites():
    """One calibration serves every state dtype: the dict carries `.state`
    write sites, and a fp32-state static trace is NOT required to consume
    them (they are exempt from the exhaustion check)."""
    from stgx.bench.quant import calibrate_scales, quant_mode

    model, params, x = _model_and_params()
    qparams = quantize_rtstgcn(model, params)
    scales = calibrate_scales(model, qparams, jnp.asarray(x[0]), "rt-st-gcn")
    state_sites = [s for s in scales if s.endswith(".state")]
    assert len(state_sites) == len(model.in_ch), state_sites
    # fp32-state static trace leaves .state sites unconsumed — no error
    with quant_mode("static", scales):
        quantized_stream_step(
            model, qparams, init_quant_stream_state(model),
            jnp.asarray(x[:, 0]),
        )


def _run_rt_quant_stream(model, qparams, x, state):
    outs = []
    for t in range(x.shape[1]):
        logits, state = quantized_stream_step(
            model, qparams, state, jnp.asarray(x[:, t])
        )
        outs.append(np.asarray(logits))
    return np.stack(outs, axis=1)


def test_rt_state_dtype_variants_track_fp32_state():
    """int8/bf16 FIFO state must track the fp32-state static cell: each
    slot is rounded once at write, so the error is bounded per tap and
    does not compound across the stream."""
    from stgx.bench.quant import calibrate_scales, quant_mode

    model, params, x = _model_and_params()
    qparams = quantize_rtstgcn(model, params)
    scales = calibrate_scales(model, qparams, jnp.asarray(x[0]), "rt-st-gcn")

    with quant_mode("static", scales):
        y32 = _run_rt_quant_stream(
            model, qparams, x, init_quant_stream_state(model)
        )
        y16 = _run_rt_quant_stream(
            model, qparams, x,
            init_quant_stream_state(model, dtype=jnp.bfloat16),
        )
        y8 = _run_rt_quant_stream(
            model, qparams, x, init_quant_stream_state(model, dtype=jnp.int8)
        )
    for y in (y16, y8):
        agree = (y.argmax(-1) == y32.argmax(-1)).mean()
        assert agree > 0.9, agree
        rel = np.abs(y - y32).mean() / (np.abs(y32).mean() + 1e-9)
        assert rel < 0.15, rel
    # bounded, not compounding: late-stream error comparable to early
    half = x.shape[1] // 2
    early = np.abs(y8 - y32)[:, :half].max()
    late = np.abs(y8 - y32)[:, half:].max()
    assert late < 5 * early + 1e-3, (early, late)


def test_costgcn_int8_state_tracks_fp32_state():
    """CoST-GCN's main FIFO shares its site with the tcn matmul (the taps
    ARE the matmul input), and the residual FIFO has its own `.state`
    site; with int8 state the matmul consumes pre-quantized taps."""
    from stgx.bench.quant import QUANT_MODELS, calibrate_scales, quant_mode
    from stgx.models.costgcn import CoStgcn

    model = CoStgcn(
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8, 16), out_ch=(8, 16, 16), dilation=(1, 2, 1),
        residual=(1, 1, 1), dropout=(0.0,) * 3, normalization="LayerNorm",
    )
    x = RNG.normal(size=(1, 24, 7, 6)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    quantize, qstep, qinit = QUANT_MODELS["co-st-gcn"]
    qparams = quantize(model, params)
    scales = calibrate_scales(model, qparams, jnp.asarray(x[0]), "co-st-gcn")
    assert any(s.endswith(".res.state") for s in scales), sorted(scales)

    def run(dtype):
        with quant_mode("static", scales):
            state = qinit(model, dtype=dtype)
            outs = []
            for t in range(x.shape[1]):
                logits, state = qstep(
                    model, qparams, state, jnp.asarray(x[:, t])
                )
                outs.append(np.asarray(logits))
        return np.stack(outs, axis=1)

    y32 = run(jnp.float32)
    y8 = run(jnp.int8)
    agree = (y8.argmax(-1) == y32.argmax(-1)).mean()
    assert agree > 0.9, agree
    rel = np.abs(y8 - y32).mean() / (np.abs(y32).mean() + 1e-9)
    assert rel < 0.15, rel


def test_int8_state_halves_state_bytes():
    """The serving lever itself: int8 state is 4x smaller than fp32."""
    def state_bytes(state):
        return sum(a.size * a.dtype.itemsize for a in jax.tree.leaves(state))

    model, _, _ = _model_and_params()
    b32 = state_bytes(init_quant_stream_state(model, batch=8))
    b8 = state_bytes(init_quant_stream_state(model, batch=8, dtype=jnp.int8))
    assert b8 * 4 == b32, (b8, b32)
