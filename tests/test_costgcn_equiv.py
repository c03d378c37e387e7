"""CoST-GCN: streaming FIFO ≡ batch causal-conv equivalence, incl. the
Γ//2-delayed residual and per-layer dilation."""

import jax
import jax.numpy as jnp
import numpy as np

from stgx.graph import load_skeleton
from stgx.models.costgcn import CoStgcn, init_stream_state, stream_sequence

SKEL = load_skeleton("imu_fogit_ABCD")
CFG = dict(
    num_classes=5,
    in_feat=6,
    graph=SKEL,
    kernel=5,
    in_ch=(8, 8, 16),
    out_ch=(8, 16, 16),
    dilation=(1, 2, 2),
    residual=(1, 1, 1),
    dropout=(0.0, 0.0, 0.0),
    importance=True,
    normalization="LayerNorm",
)


def _make():
    model = CoStgcn(**CFG)
    x = np.random.default_rng(5).normal(size=(2, 40, 7, 6)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(11), jnp.asarray(x))
    ei = params["params"]["edge_importance"]
    params["params"]["edge_importance"] = ei + 0.05 * jnp.sin(
        jnp.arange(ei.size, dtype=jnp.float32).reshape(ei.shape)
    )
    return model, params, x


def test_streaming_equals_batch():
    model, params, x = _make()
    y_batch = model.apply(params, jnp.asarray(x))
    y_stream, _ = stream_sequence(model, params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(y_stream), np.asarray(y_batch), atol=1e-4, rtol=1e-4
    )


def test_chunked_state_carry():
    model, params, x = _make()
    y_full, _ = stream_sequence(model, params, jnp.asarray(x))
    state = init_stream_state(model, params, batch=2)
    y1, state = stream_sequence(model, params, jnp.asarray(x[:, :17]), state)
    y2, _ = stream_sequence(model, params, jnp.asarray(x[:, 17:]), state)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1),
        np.asarray(y_full),
        atol=1e-4,
        rtol=1e-4,
    )


def test_residual_delay_semantics():
    # with an identity network except the delay, frame t must see res[t-Γ//2]:
    # probe by feeding an impulse and checking output causality — outputs
    # before the impulse frame are constant w.r.t. the impulse
    model, params, x = _make()
    x2 = x.copy()
    # a non-uniform perturbation (a uniform one is removed by the per-frame
    # input LayerNorm — the model really is invariant to it)
    x2[:, 25, 3, 1] += 10.0
    y1 = np.asarray(model.apply(params, jnp.asarray(x)))
    y2 = np.asarray(model.apply(params, jnp.asarray(x2)))
    # strictly causal: frames before the perturbation unchanged...
    np.testing.assert_allclose(y1[:, :25], y2[:, :25], atol=1e-5)
    # ...and the perturbation is visible at/after it
    assert np.abs(y1[:, 25:] - y2[:, 25:]).max() > 1e-3
