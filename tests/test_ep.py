"""Expert parallelism (`model` mesh axis over the Shift-GCN++ student's
DY-SE 4-expert mixtures): spec selection hits exactly the expert-stacked
leaves, and the sharded forward/gradients match the replicated run, alone
and combined with tensor parallelism on the same axis."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from stgx.graph import load_skeleton
from stgx.models.shiftgcn_plus import ShiftGcnPlusStudent
from stgx.parallel.ep import param_specs_ep, shard_params_ep, shard_params_tp_ep
from stgx.parallel.mesh import make_mesh

SKEL = load_skeleton("imu_fogit_ABCD")


def _student():
    return ShiftGcnPlusStudent(
        num_classes=5, in_feat=3, graph=SKEL, c_mul=2,
        normalization="LayerNorm",
    )


def _loss_and_grads(model, params, x):
    def f(p):
        return jnp.sum(model.apply(p, x, 0) ** 2)

    return jax.value_and_grad(f)(params)


def test_ep_specs_hit_expert_leaves_only(devices):
    mesh = make_mesh(data=1, seq=2, model=4)
    model = _student()
    x = jnp.zeros((1, 16, 7, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, 0)
    specs = param_specs_ep(params, mesh)
    flat = jax.tree_util.tree_leaves_with_path(specs)
    sharded = {jax.tree_util.keystr(p) for p, s in flat if s != P()}
    assert sharded, "no expert leaves found"
    for k in sharded:
        assert "StudentSpatialShift" in k or "StudentTemporalShift" in k
    # every sharded leaf shards the leading (expert) dim only
    for p, s in flat:
        if s != P():
            assert s[0] == "model" and all(a is None for a in s[1:])
    # the SE gate itself stays replicated
    assert not any("DySEGate" in k for k in sharded)


def test_ep_matches_replicated(devices):
    mesh = make_mesh(data=1, seq=2, model=4)
    model = _student()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 7, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, 0)

    l_ref, g_ref = jax.jit(
        lambda p, x: _loss_and_grads(model, p, x)
    )(params, x)

    ps = shard_params_ep(params, mesh)
    l_ep, g_ep = jax.jit(
        lambda p, x: _loss_and_grads(model, p, x)
    )(ps, x)

    np.testing.assert_allclose(float(l_ep), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ep), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3
        )


def test_ep_tp_combined(devices):
    # experts and output channels share the model axis, per-leaf exclusive
    mesh = make_mesh(data=2, seq=2, model=2)
    model = _student()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 7, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, 0)

    l_ref, g_ref = jax.jit(
        lambda p, x: _loss_and_grads(model, p, x)
    )(params, x)

    ps = shard_params_tp_ep(params, mesh)
    specs = param_specs_ep(params, mesh, tp=True)
    flat = jax.tree_util.tree_leaves_with_path(specs)
    # both kinds of sharding are in play
    assert any(s != P() and s[0] == "model" for _, s in flat)
    assert any(s != P() and s[-1] == "model" for _, s in flat)

    l_c, g_c = jax.jit(
        lambda p, x: _loss_and_grads(model, p, x)
    )(ps, x)

    np.testing.assert_allclose(float(l_c), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_c), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3
        )
