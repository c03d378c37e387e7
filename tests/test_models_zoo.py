"""Shape/jit/grad smoke tests for the remaining model families, plus
AAGCN-specific semantics (bones, adaptive adjacency)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stgx.graph import Graph, load_skeleton
from stgx.models import MODELS
from stgx.models.aagcn import AaGcn, bone_parents, bone_vectors
from stgx.models.mstcn import MsTcn
from stgx.models.msgcn import MsGcn

SKEL = load_skeleton("imu_fogit_ABCD")
RNG = np.random.default_rng(0)


def test_registry_covers_reference_families():
    for key in ["st-gcn", "co-st-gcn", "rt-st-gcn", "ms-tcn", "ms-gcn", "aa-gcn"]:
        assert key in MODELS


def test_bone_vectors_match_reference_loop():
    # reference loop semantics (aagcn.py:62-68): per node i, every far
    # neighbor j gets x[j] - x[i]; later i overwrites earlier
    g = Graph(strategy="spatial", **SKEL)
    far = g.A_spatial_raw[2].astype(bool)
    x = RNG.normal(size=(2, 4, 7, 3)).astype(np.float32)
    expected = np.zeros_like(x)
    for i in range(7):
        expected[:, :, far[i]] = x[:, :, far[i]] - x[:, :, i, None]
    got = np.asarray(bone_vectors(jnp.asarray(x), jnp.asarray(bone_parents(SKEL))))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_aagcn_forward_and_grad():
    m = AaGcn(
        num_classes=5, in_feat=3, graph=SKEL, kernel=3,
        in_ch=(8, 8), out_ch=(8, 16), stride=(1, 2), residual=(1, 1),
        dropout=(0.0, 0.0),
    )
    x = jnp.asarray(RNG.normal(size=(3, 12, 7, 3)).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (3, 5)
    # both streams have a free B adjacency that gets gradient
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(p)
    b_grad = g["params"]["joint_stream"]["AgcnLayer_0"]["B"]
    assert np.abs(np.asarray(b_grad)).sum() > 0


@pytest.mark.parametrize("output_type", ["logits", "logsoftmax", "softmax"])
def test_aagcn_output_adapters(output_type):
    m = AaGcn(
        num_classes=5, in_feat=3, graph=SKEL, kernel=3, output_type=output_type,
        in_ch=(8,), out_ch=(8,), stride=(1,), residual=(1,), dropout=(0.0,),
    )
    x = jnp.asarray(RNG.normal(size=(2, 8, 7, 3)).astype(np.float32))
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    if output_type == "softmax":
        # sum of two probability vectors
        np.testing.assert_allclose(np.asarray(y).sum(-1), 2.0, atol=1e-5)


def test_mstcn_stages_shapes():
    m = MsTcn(num_classes=6, in_feat=4, stages=3, filters=(8, 8, 8),
              layers=(4, 4, 4), kernel=(3, 3, 3), dropout=(0.0, 0.0, 0.0))
    x = jnp.asarray(RNG.normal(size=(2, 30, 7, 4)).astype(np.float32))
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (3, 2, 30, 6)
    assert bool(jnp.isfinite(y).all())


def test_mstcn_refinement_sees_probabilities():
    # refine='softmax' must not change stage-0 output, only later stages' input
    m = MsTcn(num_classes=6, in_feat=4, stages=2, filters=(8, 8),
              layers=(2, 2), kernel=(3, 3), dropout=(0.0, 0.0), refine="softmax")
    x = jnp.asarray(RNG.normal(size=(1, 16, 7, 4)).astype(np.float32))
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (2, 1, 16, 6)


def test_msgcn_window_batch_as_time():
    m = MsGcn(
        num_classes=6, in_feat=4, graph=SKEL, kernel=3,
        in_ch=(8,), out_ch=(8,), stride=(1,), residual=(1,), dropout=(0.0,),
        stages=2, filters=(8, 8), layers=(2, 2), refine_kernel=(3, 3),
        refine_dropout=(0.0, 0.0),
    )
    windows = jnp.asarray(RNG.normal(size=(20, 9, 7, 4)).astype(np.float32))
    y = m.apply(m.init(jax.random.PRNGKey(0), windows), windows)
    assert y.shape == (3, 1, 20, 6)  # generator + 2 refinement stages


def test_all_models_jit_clean():
    x = jnp.asarray(RNG.normal(size=(2, 12, 7, 3)).astype(np.float32))
    small = dict(kernel=3, in_ch=(8,), out_ch=(8,), residual=(1,), dropout=(0.0,))
    models = {
        "st-gcn": MODELS["st-gcn"](num_classes=4, in_feat=3, graph=SKEL,
                                   stride=(1,), **small),
        "rt-st-gcn": MODELS["rt-st-gcn"](num_classes=4, in_feat=3, graph=SKEL,
                                         stride=(1,), **small),
        "co-st-gcn": MODELS["co-st-gcn"](num_classes=4, in_feat=3, graph=SKEL,
                                         dilation=(1,), **small),
        "aa-gcn": MODELS["aa-gcn"](num_classes=4, in_feat=3, graph=SKEL,
                                   stride=(1,), **small),
    }
    for name, m in models.items():
        p = m.init(jax.random.PRNGKey(0), x)
        y = jax.jit(lambda p, x: m.apply(p, x))(p, x)
        assert bool(jnp.isfinite(y).all()), name
