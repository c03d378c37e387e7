"""Ahead-of-time export of the streaming inference cell (StableHLO).

The reference's "deployment" story ends at a simulated benchmark loop inside
the torch process (/root/reference/processor.py:842-901). stgx adds a real
deployment artifact: the per-frame streaming cell — ``(state, frame) →
(logits, state)`` with the trained weights baked in as constants — exported
through ``jax.export`` to a serialized StableHLO blob that any JAX-free
serving runtime (TF serving via saved-model import, IREE, a thin C++ PJRT
driver) can load and execute, on TPU or CPU, with no Python model code.

The int8 deployment artifact — the reference jit-scripts its converted int8
model as its deployable (processor.py:928-931) — exports the same way:
``quantize="int8-static"`` bakes the int8 weights, calibrated activation
scales, and (optionally) an int8/bf16 FIFO-state layout into the blob
(``state_dtype``; int8 state quarters the serving state bytes vs fp32 —
docs/PERF.md serving section).

CLI: ``python -m stgx.cli export --config F [--set processor.export=PATH]
[--set processor.quantize=int8-static]`` (defaults to
``<out>/stream_cell.stablehlo`` / ``stream_cell_int8.stablehlo``).
Round-trip pinned in tests/test_export.py: deserialize → stream a sequence →
equals the in-JAX streaming outputs exactly. Zero overhead measured on chip:
the deserialized artifact scanned on one v5e runs the RT-ST-GCN₉ cell at
0.0105 ms/frame — the same per-frame latency as the native path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "export_streaming_cell",
    "save_streaming_cell",
    "load_streaming_cell",
]


def export_streaming_cell(model, name: str, params, batch: int = 1,
                          dtype=jnp.float32, window: int = 50,
                          quantize=None, calib_frames=None,
                          state_dtype=None):
    """Exports the jitted per-frame cell with ``params`` closed over.

    Returns a ``jax.export.Exported``; its calling convention is
    ``call(state, x_t) -> (logits, state)`` with ``x_t`` shaped
    ``(batch, V, C)`` and ``state`` the model's streaming carry pytree
    (static-slot shift FIFOs for the continual models; a window buffer for
    window classifiers — sized by ``window`` = the config's
    ``arch.receptive_field``).

    ``quantize="int8-static"`` exports the int8 cell instead: weights
    int8 per-channel, activation scales calibrated on ``calib_frames``
    (``(L, V, C)``; random frames if None — fine for latency/size, use
    real captures for accuracy), FIFO state in ``state_dtype``
    (fp32/bf16/int8 — see stgx/bench/quant.py).
    """
    from jax import export as jexport

    if quantize is not None:
        if quantize != "int8-static":
            raise ValueError(f"unknown quantize mode {quantize!r}")
        from stgx.bench.quant import QUANT_MODELS, calibrate_scales, quant_mode

        if name not in QUANT_MODELS:
            raise ValueError(f"{name!r} has no quantized streaming cell")
        quantize_fn, qstep_fn, qinit = QUANT_MODELS[name]
        qparams = quantize_fn(model, params)
        if calib_frames is None:
            v = model.graph["num_node"]
            calib_frames = np.random.default_rng(0).normal(
                size=(256, v, model.in_feat)
            ).astype(np.float32)
        scales = calibrate_scales(model, qparams, calib_frames, name)
        try:  # window models size their re-run buffer
            state0 = qinit(model, batch=batch, window=window,
                           dtype=state_dtype or jnp.float32)
        except TypeError:
            state0 = qinit(model, batch=batch,
                           dtype=state_dtype or jnp.float32)

        def cell(state, x_t):
            return qstep_fn(model, qparams, state, x_t)

        v = model.graph["num_node"]
        x_spec = jax.ShapeDtypeStruct((batch, v, model.in_feat), jnp.float32)
        state_spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state0
        )
        with quant_mode("static", scales):
            exp = jexport.export(jax.jit(cell))(state_spec, x_spec)
        return exp, state0

    from stgx.bench.streaming import _streaming_fns, _window_stream_fns

    init_state, stream_step = _streaming_fns(name)
    if init_state is None:
        init_state, stream_step = _window_stream_fns(model, window)
    state0 = init_state(model, params, batch=batch, dtype=dtype)

    def cell(state, x_t):
        logits, new_state = stream_step(model, params, state, x_t)
        return logits, new_state

    v = model.graph["num_node"]
    c = model.in_feat
    x_spec = jax.ShapeDtypeStruct((batch, v, c), dtype)
    state_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state0
    )
    exp = jexport.export(jax.jit(cell))(state_spec, x_spec)
    return exp, state0


def save_streaming_cell(path: str, model, name: str, params, batch: int = 1,
                        dtype=jnp.float32, window: int = 50,
                        quantize=None, calib_frames=None,
                        state_dtype=None) -> str:
    exp, _ = export_streaming_cell(
        model, name, params, batch, dtype, window,
        quantize=quantize, calib_frames=calib_frames, state_dtype=state_dtype,
    )
    with open(path, "wb") as f:
        f.write(exp.serialize())
    return path


def load_streaming_cell(path: str):
    """Returns the deserialized cell; drive it with
    ``logits, state = cell.call(state, x_t)``."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))
