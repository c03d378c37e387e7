"""Multi-device tests on the 8-device virtual CPU mesh: data-parallel and
sequence-parallel training steps compile, run, and match the single-device
result (the fake-backend capability the reference never had, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from stgx.graph import load_skeleton
from stgx.models import MODELS
from stgx.parallel.mesh import make_mesh
from stgx.parallel.loop import OptimizerConfig, Trainer
from stgx.utils import LOSS

SKEL = load_skeleton("imu_fogit_ABCD")
ARCH = dict(
    num_classes=5, in_feat=6, graph=SKEL, kernel=3, in_ch=(8, 16),
    out_ch=(16, 16), stride=(1, 1), residual=(1, 1), dropout=(0.0, 0.0),
    normalization="BatchNorm",  # exercises cross-device batch stats
)


def _loss_and_grads(model, loss, params, x, y, mask):
    def f(p):
        out = model.apply(p, x, train=True, mask=mask)
        ce, mse = loss(out, y, mask)
        return ce + mse

    return jax.value_and_grad(f)(params)


def test_data_parallel_matches_single_device(devices):
    mesh = make_mesh(data=8, seq=1)
    model = MODELS["rt-st-gcn"](**ARCH)
    loss = LOSS["rt-st-gcn"](np.ones(5, np.float32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 32, 7, 6)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, size=(8, 32)))
    mask = jnp.ones((8, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    l_ref, g_ref = jax.jit(
        lambda p, x, y, m: _loss_and_grads(model, loss, p, x, y, m)
    )(params, x, y, mask)

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ys = jax.device_put(y, NamedSharding(mesh, P("data")))
    ms = jax.device_put(mask, NamedSharding(mesh, P("data")))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    l_dp, g_dp = jax.jit(
        lambda p, x, y, m: _loss_and_grads(model, loss, p, x, y, m)
    )(ps, xs, ys, ms)

    np.testing.assert_allclose(float(l_dp), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_dp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sequence_parallel_matches_single_device(devices):
    # the reference's novelty — one long trial split across executors — as a
    # seq mesh axis; XLA inserts the temporal-conv halo exchanges
    mesh = make_mesh(data=1, seq=8)
    model = MODELS["co-st-gcn"](
        num_classes=5, in_feat=6, graph=SKEL, kernel=5, in_ch=(8, 16),
        out_ch=(16, 16), dilation=(1, 2), residual=(1, 1),
        dropout=(0.0, 0.0), normalization="LayerNorm",
    )
    loss = LOSS["co-st-gcn"](np.ones(5, np.float32))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 128, 7, 6)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, size=(1, 128)))
    mask = jnp.ones((1, 128), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    l_ref, g_ref = jax.jit(
        lambda p, x, y, m: _loss_and_grads(model, loss, p, x, y, m)
    )(params, x, y, mask)

    xs = jax.device_put(x, NamedSharding(mesh, P(None, "seq")))
    ys = jax.device_put(y, NamedSharding(mesh, P(None, "seq")))
    ms = jax.device_put(mask, NamedSharding(mesh, P(None, "seq")))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    l_sp, g_sp = jax.jit(
        lambda p, x, y, m: _loss_and_grads(model, loss, p, x, y, m)
    )(ps, xs, ys, ms)

    np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_trainer_on_mesh(devices):
    mesh = make_mesh(data=2, seq=4)
    model = MODELS["rt-st-gcn"](**ARCH)
    trainer = Trainer(
        model=model, kind="frame", loss=LOSS["rt-st-gcn"](np.ones(5, np.float32)),
        opt=OptimizerConfig(batch_size=2), mesh=mesh, bucket=32,
    )

    class DS:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            L = 40 + 17 * i
            return (
                rng.normal(size=(L, 7, 6)).astype(np.float32),
                rng.integers(0, 5, size=L).astype(np.int64),
            )

    ds = DS()
    x0, _ = ds[0]
    params, opt_state = trainer.init(x0[None])
    params, opt_state, st = trainer.train_epoch(params, opt_state, ds, 0)
    ev = trainer.evaluate(params, ds)
    assert np.isfinite(st["ce"]) and np.isfinite(ev["ce"])


def test_sequence_parallel_strided_matches_single_device(devices):
    # SURVEY.md §7 hard part: stride-2 layers change the effective halo and
    # per-shard lengths mid-network; GSPMD must still match single-device
    mesh = make_mesh(data=1, seq=8)
    model = MODELS["rt-st-gcn"](
        num_classes=5, in_feat=6, graph=SKEL, kernel=5, in_ch=(8, 8, 16),
        out_ch=(8, 16, 16), stride=(1, 2, 1), residual=(1, 1, 1),
        dropout=(0.0, 0.0, 0.0), normalization="LayerNorm",
    )
    loss = LOSS["rt-st-gcn"](np.ones(5, np.float32))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 128, 7, 6)).astype(np.float32))
    # rt-st-gcn keeps full per-frame resolution despite strides (stride
    # spaces the causal accumulation; it never decimates the frame axis)
    y = jnp.asarray(rng.integers(0, 5, size=(1, 128)))
    mask = jnp.ones((1, 128), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    l_ref, g_ref = jax.jit(
        lambda p, x, y, m: _loss_and_grads(model, loss, p, x, y, m)
    )(params, x, y, mask)

    xs = jax.device_put(x, NamedSharding(mesh, P(None, "seq")))
    ys = jax.device_put(y, NamedSharding(mesh, P(None, "seq")))
    ms = jax.device_put(mask, NamedSharding(mesh, P(None, "seq")))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    l_sp, g_sp = jax.jit(
        lambda p, x, y, m: _loss_and_grads(model, loss, p, x, y, m)
    )(ps, xs, ys, ms)

    np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
