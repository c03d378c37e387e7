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
