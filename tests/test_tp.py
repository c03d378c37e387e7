"""Tensor parallelism (`model` mesh axis, SURVEY.md §2.bis TP row): a train
step with channel-sharded parameters compiles, runs, and matches the
replicated single-device result, alone and combined with data+sequence
parallelism on one 3-axis mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from stgx.graph import load_skeleton
from stgx.models import MODELS
from stgx.parallel.mesh import make_mesh, replicate
from stgx.parallel.tp import param_specs_tp, shard_params_tp
from stgx.utils import LOSS

SKEL = load_skeleton("imu_fogit_ABCD")
ARCH = dict(
    num_classes=5, in_feat=6, graph=SKEL, kernel=3, in_ch=(8, 16),
    out_ch=(16, 16), stride=(1, 1), residual=(1, 1), dropout=(0.0, 0.0),
    normalization="LayerNorm",
)


def _loss_and_grads(model, loss, params, x, y, mask):
    def f(p):
        out = model.apply(p, x, train=True, mask=mask)
        ce, mse = loss(out, y, mask)
        return ce + mse

    return jax.value_and_grad(f)(params)


def test_tp_specs_shard_channels_only(devices):
    mesh = make_mesh(data=2, seq=2, model=2)
    model = MODELS["rt-st-gcn"](**ARCH)
    x = jnp.zeros((2, 16, 7, 6), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    specs = param_specs_tp(params, mesh)
    flat = jax.tree_util.tree_leaves_with_path(specs)
    sharded = {
        jax.tree_util.keystr(path)
        for path, s in flat
        if s != P()
    }
    # every conv/dense kernel+bias with divisible C_out is channel-sharded
    assert any("res_kernel" in k for k in sharded)
    assert any("GraphConv" in k for k in sharded)
    # edge importance (V×V, odd) stays replicated
    assert not any("edge_importance" in k for k in sharded)
    # the 5-class head is indivisible by 2 → replicated
    assert not any("fcn_out" in k for k in sharded)


def test_tp_matches_replicated(devices):
    mesh = make_mesh(data=1, seq=1, model=8)
    model = MODELS["rt-st-gcn"](**ARCH)
    loss = LOSS["rt-st-gcn"](np.ones(5, np.float32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 7, 6)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, size=(2, 32)))
    mask = jnp.ones((2, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    l_ref, g_ref = jax.jit(
        lambda p, x, y, m: _loss_and_grads(model, loss, p, x, y, m)
    )(params, x, y, mask)

    ps = shard_params_tp(params, mesh)
    l_tp, g_tp = jax.jit(
        lambda p, x, y, m: _loss_and_grads(model, loss, p, x, y, m)
    )(ps, x, y, mask)

    np.testing.assert_allclose(float(l_tp), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_tp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_sp_tp_combined(devices):
    # 3D mesh: batch over data, frames over seq, channels over model
    mesh = make_mesh(data=2, seq=2, model=2)
    model = MODELS["rt-st-gcn"](**ARCH)
    loss = LOSS["rt-st-gcn"](np.ones(5, np.float32))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 32, 7, 6)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, size=(4, 32)))
    mask = jnp.ones((4, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    l_ref, g_ref = jax.jit(
        lambda p, x, y, m: _loss_and_grads(model, loss, p, x, y, m)
    )(params, x, y, mask)

    xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq")))
    ys = jax.device_put(y, NamedSharding(mesh, P("data", "seq")))
    ms = jax.device_put(mask, NamedSharding(mesh, P("data", "seq")))
    ps = shard_params_tp(params, mesh)
    l_3d, g_3d = jax.jit(
        lambda p, x, y, m: _loss_and_grads(model, loss, p, x, y, m)
    )(ps, xs, ys, ms)

    np.testing.assert_allclose(float(l_3d), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_3d), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_replicate_still_works_on_3d_mesh(devices):
    mesh = make_mesh(data=2, seq=2, model=2)
    model = MODELS["rt-st-gcn"](**ARCH)
    x = jnp.zeros((2, 16, 7, 6), jnp.float32)
    params = replicate(mesh, model.init(jax.random.PRNGKey(0), x))
    out = jax.jit(lambda p, x: model.apply(p, x))(params, x)
    assert out.shape == (2, 16, 5)


def test_tp_streaming_matches_replicated(devices):
    """Serving path: the per-frame streaming scan runs with TP
    channel-sharded parameters (GSPMD inserts the per-frame collectives
    over the `model` axis) and matches unsharded streaming — latency-motivated
    tensor parallelism for the deployed cell needs no dedicated code."""
    from stgx.models.rtstgcn import stream_sequence

    mesh = make_mesh(data=1, seq=1, model=2)
    model = MODELS["rt-st-gcn"](**ARCH)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 24, 7, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y_ref, _ = stream_sequence(model, params, x)

    ps = shard_params_tp(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P()))
    y_tp, _ = jax.jit(
        lambda p, t: stream_sequence(model, p, t)
    )(ps, xs)
    np.testing.assert_allclose(
        np.asarray(y_tp), np.asarray(y_ref), atol=2e-5, rtol=2e-5
    )
