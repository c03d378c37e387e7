"""StableHLO export of the streaming cell: serialize → deserialize → drive
a sequence frame-by-frame ≡ the in-JAX streaming outputs (stgx/export.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from stgx.graph import load_skeleton
from stgx.models.rtstgcn import RtStgcn, stream_sequence


def _model():
    model = RtStgcn(
        num_classes=5,
        in_feat=6,
        graph=load_skeleton("imu_fogit_ABCD"),
        kernel=3,
        in_ch=(8, 8),
        out_ch=(8, 8),
        stride=(1, 1),
        residual=(1, 1),
        dropout=(0.0, 0.0),
        importance=True,
        normalization="LayerNorm",
    )
    x = np.random.default_rng(1).normal(size=(2, 20, 7, 6)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    return model, params, x


def test_export_roundtrip(tmp_path):
    from stgx.export import load_streaming_cell, save_streaming_cell

    model, params, x = _model()
    y_ref, _ = stream_sequence(model, params, jnp.asarray(x))

    path = os.path.join(tmp_path, "cell.stablehlo")
    save_streaming_cell(path, model, "rt-st-gcn", params, batch=2)
    cell = load_streaming_cell(path)

    from stgx.models.rtstgcn import init_stream_state

    state = init_stream_state(model, params, batch=2)
    outs = []
    for t in range(x.shape[1]):
        logits, state = cell.call(state, jnp.asarray(x[:, t]))
        outs.append(np.asarray(logits))
    got = np.stack(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(y_ref), atol=1e-5, rtol=1e-5)


def test_export_window_model_honors_receptive_field(tmp_path):
    """Window classifiers export with the configured window size — the
    exported cell must equal streaming the model over a W-frame buffer."""
    from stgx.export import export_streaming_cell
    from stgx.models import MODELS

    w = 8
    model = MODELS["st-gcn"](
        num_classes=5, in_feat=6, graph=load_skeleton("imu_fogit_ABCD"),
        normalization="BatchNorm", kernel=3, in_ch=(8,), out_ch=(8,),
        stride=(1,), residual=(1,), dropout=(0.0,), importance=True,
    )
    x = np.random.default_rng(3).normal(size=(1, w, 7, 6)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(x))
    exp, state0 = export_streaming_cell(
        model, "st-gcn", params, batch=1, window=w
    )
    assert state0["buf"].shape == (1, w, 7, 6)
    # feed the window frame by frame; after w frames the buffer holds
    # exactly x, so the cell's logits equal the direct window forward
    blob = exp.serialize()
    from jax import export as jexport

    cell = jexport.deserialize(blob)
    state = state0
    for t in range(w):
        logits, state = cell.call(state, jnp.asarray(x[:, t]))
    ref = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_export_cli(tmp_path):
    """CLI `export` writes the artifact next to the other outputs."""
    import json
    import subprocess
    import sys

    from stgx.data.synth import generate

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_dir = os.path.join(tmp_path, "data")
    generate(data_dir, num_train=2, num_val=2, min_len=60, max_len=80, seed=1)
    cfg = {
        "processor": {
            "model": "rt-st-gcn",
            "data": data_dir,
            "out": os.path.join(tmp_path, "out"),
            "actions": os.path.join(data_dir, "actions.txt"),
            "graph": "imu_fogit_ABCD",
            "demo": [],
            "iou_threshold": [0.5],
        },
        "arch": {
            "in_feat": 6,
            "normalization": "LayerNorm",
            "rt-st-gcn": {
                "layers": 2, "kernel": 3, "in_ch": [8, 8], "out_ch": [8, 8],
                "stride": [1, 1], "residual": [1, 1], "dropout": [0, 0],
                "importance": True,
            },
        },
        "optimizer": {
            "seed": 1, "epochs": 1, "checkpoint_indices": [],
            "learning_rate": 1e-3, "learning_rate_decay": 1.0,
            "batch_size": 2,
        },
        "job": {"verbose": 0, "platform": "cpu"},
    }
    cfg_path = os.path.join(tmp_path, "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    r = subprocess.run(
        [sys.executable, "-m", "stgx.cli", "export", "--config", cfg_path],
        capture_output=True, text=True, cwd=repo, timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = os.path.join(cfg["processor"]["out"], "stream_cell.stablehlo")
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_export_int8_roundtrip(tmp_path):
    """The int8 deployment artifact (the reference jit-scripts its converted
    int8 model, processor.py:928-931): export the static-scale int8 cell
    with int8 FIFO state, deserialize, drive — equals the in-JAX quantized
    stream, and the artifact is meaningfully smaller than the fp32 one."""
    from stgx.bench.quant import (
        QUANT_MODELS,
        calibrate_scales,
        quant_mode,
    )
    from stgx.export import (
        export_streaming_cell,
        load_streaming_cell,
        save_streaming_cell,
    )

    model, params, x = _model()
    quantize, qstep, qinit = QUANT_MODELS["rt-st-gcn"]
    qparams = quantize(model, params)
    calib = x[0]

    fp_path = os.path.join(tmp_path, "cell.stablehlo")
    q_path = os.path.join(tmp_path, "cell_int8.stablehlo")
    save_streaming_cell(fp_path, model, "rt-st-gcn", params, batch=2)
    save_streaming_cell(
        q_path, model, "rt-st-gcn", params, batch=2,
        quantize="int8-static", calib_frames=calib, state_dtype=jnp.int8,
    )
    # NB: at this test's toy width the blob is dominated by program text,
    # not weights, so no size comparison here — the 3.5× artifact shrink
    # is measured at real widths (docs/PERF.md); the CLI logs the bytes
    assert os.path.getsize(q_path) > 0 and os.path.getsize(fp_path) > 0

    # in-JAX reference: the same static int8 cell with int8 state
    scales = calibrate_scales(model, qparams, jnp.asarray(calib), "rt-st-gcn")
    with quant_mode("static", scales):
        state = qinit(model, batch=2, dtype=jnp.int8)
        want = []
        for t in range(x.shape[1]):
            logits, state = qstep(model, qparams, state, jnp.asarray(x[:, t]))
            want.append(np.asarray(logits))

    cell = load_streaming_cell(q_path)
    state = qinit(model, batch=2, dtype=jnp.int8)
    got = []
    for t in range(x.shape[1]):
        logits, state = cell.call(state, jnp.asarray(x[:, t]))
        got.append(np.asarray(logits))
    np.testing.assert_allclose(
        np.stack(got), np.stack(want), atol=1e-5, rtol=1e-5
    )
