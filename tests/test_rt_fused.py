"""Fused RT-layer kernel ≡ the XLA gcn + causal-accumulate chain.

stgx/ops/rt_fused.py fuses ``causal_accumulate(partitioned_gcn(x,A,W,b))``
into one Pallas pass (fwd + VJP). It must match the default XLA path —
values and all four gradients — including the empty-FIFO start semantics
(/root/reference/models/rtstgcn/test_rtstgcn.py:52-63 pins the intent), the
stride-spaced taps, the halo carry across time tiles, and the reference's
pre-accumulator bias position (models/utils/tgcn.py:71-76). Runs in Pallas
interpret mode on the CPU suite; Mosaic-compiled on TPU.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stgx.ops import graph_conv, rt_fused, temporal


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(rt_fused, "_INTERPRET", True)


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def _ref_chain(x, A, W, b, gamma, stride):
    y = graph_conv.partitioned_gcn(x, A, W, b)
    return temporal.causal_accumulate(y, gamma, stride)


@pytest.mark.parametrize(
    "n,l,v,p,cin,cout,gamma,stride",
    [
        (2, 256, 25, 3, 64, 64, 9, 1),     # canonical early layer, L = k·T
        (1, 200, 25, 3, 64, 128, 9, 1),    # channel widening + ragged L
        (2, 100, 25, 3, 128, 128, 9, 2),   # stride-2 tap spacing, ragged L
        (1, 70, 25, 3, 256, 256, 9, 1),    # deep layer (small tile path)
        (1, 40, 11, 2, 16, 24, 5, 1),      # tiny rig, L smaller than a tile
    ],
)
def test_forward_matches_xla_chain(n, l, v, p, cin, cout, gamma, stride):
    rng = np.random.default_rng(0)
    x = _rand(rng, n, l, v, cin)
    A = _rand(rng, p, v, v)
    W = _rand(rng, p, cin, cout) * 0.1
    b = _rand(rng, p, cout)
    ref = _ref_chain(x, A, W, b, gamma, stride)
    got = rt_fused.rt_fused_gcn_acc(x, A, W, b, gamma, stride)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_empty_fifo_start_and_tile_halo():
    """Frame t must sum exactly min(K, t//s+1) taps: the first tile starts
    from a zero halo and later tiles chain through the carried scratch."""
    n, l, v, p, c = 1, 300, 25, 3, 64  # 300 = 2·128 + 44: pad + halo paths
    gamma, stride = 9, 1
    rng = np.random.default_rng(1)
    A = _rand(rng, p, v, v)
    W = _rand(rng, p, c, c)
    # x constant in time → gcn output y is too → ysum[t] = min(K, t+1)·y0
    x = jnp.broadcast_to(_rand(rng, n, 1, v, c), (n, l, v, c))
    y0 = graph_conv.partitioned_gcn(x[:, :1], A, W, None)
    got = rt_fused.rt_fused_gcn_acc(x, A, W, None, gamma, stride)
    counts = np.minimum(np.arange(l) + 1, gamma)
    ref = np.asarray(y0) * counts[None, :, None, None]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,l", [(1, 256), (2, 150), (1, 190)])
def test_vjp_matches_xla_chain(stride, l):
    n, v, p, cin, cout, gamma = 2, 25, 3, 64, 128, 9
    rng = np.random.default_rng(2)
    x = _rand(rng, n, l, v, cin)
    A = _rand(rng, p, v, v)
    W = _rand(rng, p, cin, cout) * 0.1
    b = _rand(rng, p, cout)
    probe = _rand(rng, n, l, v, cout)

    def loss_ref(x, A, W, b):
        return jnp.sum(_ref_chain(x, A, W, b, gamma, stride) * probe)

    def loss_fused(x, A, W, b):
        return jnp.sum(
            rt_fused.rt_fused_gcn_acc(x, A, W, b, gamma, stride) * probe
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, A, W, b)
    g_pl = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, A, W, b)
    for gr, gp, name in zip(g_ref, g_pl, "xAWb"):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=2e-3, atol=2e-3,
            err_msg=f"grad wrt {name}")


def test_bf16_matches_xla_chain():
    """bf16 compute: the kernel window-sums in fp32 pre-cast where XLA sums
    rounded bf16 — allow a few bf16 ulps."""
    n, l, v, p, c, gamma = 2, 256, 25, 3, 64, 9
    rng = np.random.default_rng(3)
    x = _rand(rng, n, l, v, c).astype(jnp.bfloat16)
    A = _rand(rng, p, v, v)  # f32 like edge-importance-weighted A in training
    W = _rand(rng, p, c, c).astype(jnp.bfloat16) * 0.1
    b = _rand(rng, p, c).astype(jnp.bfloat16)
    ref = _ref_chain(x, A, W, b, gamma, 1)
    got = rt_fused.rt_fused_gcn_acc(x, A, W, b, gamma, 1)
    assert got.dtype == jnp.bfloat16
    # fp32 ground truth: same chain on upcast inputs
    truth = np.asarray(
        _ref_chain(
            x.astype(jnp.float32), A, W.astype(jnp.float32),
            b.astype(jnp.float32), gamma, 1,
        )
    )
    scale = np.maximum(np.abs(truth), 1.0)
    err_got = np.max(np.abs(np.asarray(got, np.float32) - truth) / scale)
    err_ref = np.max(np.abs(np.asarray(ref, np.float32) - truth) / scale)
    # close to the XLA path (they differ only in window-sum rounding: the
    # kernel sums fp32 pre-cast, XLA sums rounded bf16) ...
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.08, atol=0.6,
    )
    # ... and at least as accurate against the fp32 truth
    assert err_got <= err_ref * 1.05 + 1e-3, (err_got, err_ref)


def test_halo_exceeds_tile_falls_back():
    """A Γ·stride reach beyond the kernel's halo-carry tile must fall back
    to the XLA chain transparently (exact same numbers, no opaque trace
    error inside the kernel) — advisor r3 finding."""
    n, l, v, p, cin, cout = 1, 100, 7, 2, 16, 16
    gamma, stride = 80, 1  # halo 79 > the 64-frame backward tile
    rng = np.random.default_rng(5)
    x = _rand(rng, n, l, v, cin)
    A = _rand(rng, p, v, v)
    W = _rand(rng, p, cin, cout) * 0.1
    b = _rand(rng, p, cout)
    probe = _rand(rng, n, l, v, cout)

    def loss(fn):
        return lambda x, A, W, b: jnp.sum(fn(x, A, W, b) * probe)

    ref = _ref_chain(x, A, W, b, gamma, stride)
    got = rt_fused.rt_fused_gcn_acc(x, A, W, b, gamma, stride)
    # the fallback IS the reference chain, so bit-identical
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    g_ref = jax.grad(loss(lambda *a: _ref_chain(*a, gamma, stride)),
                     argnums=(0, 1, 2, 3))(x, A, W, b)
    g_fb = jax.grad(loss(lambda *a: rt_fused.rt_fused_gcn_acc(*a, gamma, stride)),
                    argnums=(0, 1, 2, 3))(x, A, W, b)
    for gr, gp in zip(g_ref, g_fb):
        np.testing.assert_array_equal(np.asarray(gp), np.asarray(gr))


def test_trainer_multi_device_mesh_guard(devices):
    """arch.rt_fused + a multi-device mesh: the Trainer must force-disable
    the unpartitionable Pallas op (with a warning) and the sharded run must
    still train ≡ the unfused path (the guard rt_fused.py's header
    promises; round-3 verdict #2)."""
    from stgx.graph import load_skeleton
    from stgx.models import MODELS
    from stgx.parallel.loop import OptimizerConfig, Trainer
    from stgx.parallel.mesh import make_mesh
    from stgx.utils import LOSS

    arch = dict(
        num_classes=5, in_feat=6, graph=load_skeleton("imu_fogit_ABCD"),
        kernel=3, in_ch=(8, 16), out_ch=(16, 16), stride=(1, 1),
        residual=(1, 1), dropout=(0.0, 0.0), normalization="BatchNorm",
    )

    class DS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            L = 40 + 8 * i
            return (
                rng.normal(size=(L, 7, 6)).astype(np.float32),
                rng.integers(0, 5, size=L).astype(np.int64),
            )

    def one_epoch(mesh):
        model = MODELS["rt-st-gcn"](**arch)
        trainer = Trainer(
            model=model, kind="frame",
            loss=LOSS["rt-st-gcn"](np.ones(5, np.float32)),
            opt=OptimizerConfig(batch_size=2), mesh=mesh, bucket=32,
        )
        ds = DS()
        params, opt_state = trainer.init(ds[0][0][None])
        _, _, st = trainer.train_epoch(params, opt_state, ds, 0)
        return st

    rt_fused.set_rt_fused(True)
    try:
        with pytest.warns(UserWarning, match="rt_fused"):
            st_mesh = one_epoch(make_mesh(data=2, seq=1))
        # the guard flipped the global off for the sharded run
        assert not rt_fused.rt_fused_enabled()
    finally:
        rt_fused.set_rt_fused(False)
    st_ref = one_epoch(None)  # unfused single-device
    np.testing.assert_allclose(st_mesh["ce"], st_ref["ce"], rtol=1e-5)


def test_full_model_equivalence(monkeypatch):
    """RtStgcn forward + grads with the fused layer ≡ the default path
    (LayerNorm so the norm sees identical inputs modulo fp rounding)."""
    from stgx.graph import load_skeleton
    from stgx.models.rtstgcn import RtStgcn

    kw = dict(
        num_classes=5, in_feat=3, graph=load_skeleton("imu_fogit_ABCD"),
        normalization="LayerNorm", kernel=9,
        in_ch=(8, 8, 16), out_ch=(8, 16, 16), stride=(1, 2, 1),
        residual=(1, 1, 1), dropout=(0.0,) * 3,
    )
    model = RtStgcn(**kw)
    rng = np.random.default_rng(4)
    x = _rand(rng, 2, 80, kw["graph"]["num_node"], 3)
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p, fused):
        monkeypatch.setattr(rt_fused, "_ENABLED", fused)
        out = model.apply(p, x, train=True)
        return jnp.sum(out**2) / out.size

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(p, False))(params)
    l_pl, g_pl = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l_pl), float(l_ref), rtol=1e-4)
    flat_r = jax.tree.leaves(g_ref)
    flat_p = jax.tree.leaves(g_pl)
    for gr, gp in zip(flat_r, flat_p):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3)
