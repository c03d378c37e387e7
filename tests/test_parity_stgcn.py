"""ST-GCN activation parity: stgx (flax) vs the torch twin of the reference
semantics (per-layer allclose target from BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from stgx.graph import Graph, load_skeleton
from stgx.models.stgcn import Stgcn

from torch_ref import RefStgcn, copy_stgcn, to_torch

CFG = dict(
    num_classes=8,
    in_feat=6,
    kernel=3,
    in_ch=(8, 8, 16),
    out_ch=(8, 16, 16),
    stride=(1, 2, 1),
    residual=(0, 1, 1),
    dropout=(0.0, 0.0, 0.0),
    importance=True,
)


@pytest.mark.parametrize("normalization", ["LayerNorm", "BatchNorm"])
def test_stgcn_matches_reference_semantics(normalization):
    skel = load_skeleton("imu_fogit_ABCD")
    model = Stgcn(
        graph=skel, strategy="spatial", normalization=normalization, **CFG
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 20, skel["num_node"], CFG["in_feat"])).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(model.apply(params, jnp.asarray(x)))

    A = Graph(strategy="spatial", **skel).A
    tw = RefStgcn(
        A=A.astype(np.float32),
        num_classes=CFG["num_classes"],
        in_feat=CFG["in_feat"],
        kernel=CFG["kernel"],
        in_ch=CFG["in_ch"],
        out_ch=CFG["out_ch"],
        stride=CFG["stride"],
        residual=CFG["residual"],
        normalization=normalization,
        importance=True,
    ).eval()
    # perturb edge importance away from ones so the mask actually matters
    params = jax.tree.map(
        lambda p: p, params
    )
    ei = params["params"]["edge_importance"]
    params["params"]["edge_importance"] = ei + 0.1 * jnp.sin(
        jnp.arange(ei.size, dtype=jnp.float32).reshape(ei.shape)
    )
    y = np.asarray(model.apply(params, jnp.asarray(x)))

    copy_stgcn(params, tw, normalization)
    with torch.no_grad():
        yt = tw(to_torch(x)).numpy()

    np.testing.assert_allclose(y, yt, atol=2e-4, rtol=1e-4)


def test_stgcn_jit_and_grad():
    skel = load_skeleton("imu_fogit_ABCD")
    model = Stgcn(graph=skel, normalization="LayerNorm", **CFG)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 12, 7, 6)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def loss_fn(p, x):
        return jnp.sum(model.apply(p, x) ** 2)

    g = jax.grad(loss_fn)(params, x)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)
    # edge importance must receive gradient
    assert np.abs(np.asarray(g["params"]["edge_importance"])).sum() > 0
