"""Checkpoint round-trip under a real multi-axis mesh (VERDICT r2 item 7).

The reference saves/restores ``{epoch, model, optimizer}`` on one host
(/root/reference/processor.py:325-343,582-587). Here the same lifecycle must
hold when the leaves are TP-sharded over the ``model`` mesh axis: save the
sharded tree, restore it onto templates carrying NamedShardings, and resume
training — the resumed run must be bit-identical to an uninterrupted one, and
the restored leaves must land with the template's shardings (not whatever the
checkpoint file recorded).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from stgx.graph import load_skeleton
from stgx.models import MODELS
from stgx.parallel.mesh import make_mesh
from stgx.parallel.tp import param_specs_tp, shard_params_tp
from stgx.utils import LOSS
from stgx.utils.checkpoint import (
    latest_epoch,
    restore_checkpoint,
    save_checkpoint,
)

SKEL = load_skeleton("imu_fogit_ABCD")
ARCH = dict(
    num_classes=5, in_feat=6, graph=SKEL, kernel=3, in_ch=(8, 16),
    out_ch=(16, 16), stride=(1, 1), residual=(1, 1), dropout=(0.0, 0.0),
    normalization="LayerNorm",
)


def _make_step(model, loss, opt):
    def step(params, opt_state, x, y, mask):
        def f(p):
            out = model.apply(p, x, train=True, mask=mask)
            ce, mse = loss(out, y, mask)
            return ce + mse

        l, grads = jax.value_and_grad(f)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    return jax.jit(step)


def _batch(seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(4, 32, 7, 6)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, size=(4, 32)))
    return x, y, jnp.ones((4, 32), jnp.float32)


def test_tp_sharded_checkpoint_roundtrip(devices, tmp_path):
    mesh = make_mesh(data=2, seq=1, model=4)
    model = MODELS["rt-st-gcn"](**ARCH)
    loss = LOSS["rt-st-gcn"](np.ones(5, np.float32))
    opt = optax.adamw(1e-3)
    step = _make_step(model, loss, opt)

    x0, _, _ = _batch(0)
    params0 = shard_params_tp(model.init(jax.random.PRNGKey(0), x0), mesh)
    specs = param_specs_tp(params0, mesh)
    # sanity: TP actually sharded something (C_out=16 % 4 == 0 leaves)
    assert any(
        s == P(*([None] * (l.ndim - 1)), "model")
        for l, s in zip(jax.tree.leaves(params0), jax.tree.leaves(specs))
    )
    opt_state0 = jax.jit(opt.init)(params0)

    def shard_in(b):
        x, y, m = b
        put = lambda a: jax.device_put(a, NamedSharding(mesh, P("data")))
        return put(x), put(y), put(m)

    # uninterrupted: 3 steps
    p_ref, o_ref = params0, opt_state0
    for i in range(3):
        p_ref, o_ref, _ = step(p_ref, o_ref, *shard_in(_batch(i)))

    # interrupted: 2 steps, save, restore onto fresh sharded templates, 1 step
    p, o = params0, opt_state0
    for i in range(2):
        p, o, _ = step(p, o, *shard_in(_batch(i)))
    save_checkpoint(str(tmp_path), 1, p, o)
    path = latest_epoch(str(tmp_path))
    assert path is not None and path.endswith("epoch-1")

    # templates: a *fresh* init with the same shardings (values irrelevant)
    p_like = shard_params_tp(model.init(jax.random.PRNGKey(7), x0), mesh)
    o_like = jax.jit(opt.init)(p_like)
    epoch, p_r, o_r = restore_checkpoint(path, p_like, o_like)
    assert epoch == 1

    # restored leaves carry the template's shardings, incl. the TP axis
    for leaf, spec in zip(jax.tree.leaves(p_r), jax.tree.leaves(specs)):
        assert isinstance(leaf.sharding, NamedSharding)
        assert leaf.sharding.spec == spec, (leaf.sharding.spec, spec)

    p_r, o_r, _ = step(p_r, o_r, *shard_in(_batch(2)))
    for a, b in zip(jax.tree.leaves(p_r), jax.tree.leaves(p_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(o_r), jax.tree.leaves(o_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
