"""Shift-GCN / Shift-GCN++ model tests: shapes, grads, expert gating,
distillation loss semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from stgx.graph import load_skeleton
from stgx.models.shiftgcn import ShiftGcn
from stgx.models.shiftgcn_plus import (
    ShiftGcnPlus,
    ShiftGcnPlusStudent,
    ShiftGcnPlusTeacher,
    distillation_loss,
    margin_from_norm_params,
)

SKEL = load_skeleton("imu_fogit_ABCD")
RNG = np.random.default_rng(0)


def _small_shiftgcn():
    return ShiftGcn(
        num_classes=5, in_feat=3, graph=SKEL,
        in_ch=(3, 8, 8), out_ch=(8, 8, 16), stride=(1, 1, 2),
        residual=(0, 1, 1), normalization="LayerNorm",
    )


def test_shiftgcn_forward_and_grad():
    m = _small_shiftgcn()
    x = jnp.asarray(RNG.normal(size=(2, 16, 7, 3)).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (2, 5)
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(p)
    # the learnable temporal shifts receive gradient
    su = g["params"]["units_1"]["TemporalShiftBlock_0"]["shift_in"]
    assert np.abs(np.asarray(su)).sum() > 0
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_shiftgcn_plus_teacher_student_shapes():
    t = ShiftGcnPlusTeacher(
        num_classes=5, in_feat=3, graph=SKEL, normalization="LayerNorm"
    )
    s = ShiftGcnPlusStudent(
        num_classes=5, in_feat=3, graph=SKEL, c_mul=2, normalization="LayerNorm"
    )
    x = jnp.asarray(RNG.normal(size=(1, 16, 7, 3)).astype(np.float32))
    pt = t.init(jax.random.PRNGKey(0), x)
    ps = s.init(jax.random.PRNGKey(1), x, 0)
    yt = t.apply(pt, x)
    ys = s.apply(ps, x, 0)
    assert yt.shape == (1, 5) and ys.shape == (1, 5)
    feats, out = t.apply(pt, x, extract_features=True)
    assert len(feats) == 3
    assert [f.shape[-1] for f in feats] == [64, 128, 256]


def test_student_expert_gate_temperature():
    # epoch schedule: tau anneals 30 -> 1; at high tau gates are near-uniform
    s = ShiftGcnPlusStudent(
        num_classes=5, in_feat=3, graph=SKEL, c_mul=2, normalization="LayerNorm"
    )
    x = jnp.asarray(RNG.normal(size=(1, 16, 7, 3)).astype(np.float32))
    ps = s.init(jax.random.PRNGKey(1), x, 0)
    y0 = np.asarray(s.apply(ps, x, 0))
    y99 = np.asarray(s.apply(ps, x, 99))
    # different epochs change the gating (unless gates are exactly uniform)
    assert y0.shape == y99.shape == (1, 5)


def test_distillation_loss_cases():
    margin = jnp.zeros((1, 1, 1, 4))
    s = jnp.asarray([[[[1.0, -1.0, 2.0, 0.5]]]])
    t = jnp.asarray([[[[2.0, -2.0, -0.5, 0.5]]]])
    # target>0: (s-t)^2 → (1-2)^2=1 for ch0, (0.5-0.5)^2=0 for ch3
    # target<=margin(0), source>margin: (s-m)^2 → ch2: 2^2=4
    # source<=margin and target<=margin: 0 → ch1
    val = float(distillation_loss(s, t, margin))
    np.testing.assert_allclose(val, 1.0 + 4.0, atol=1e-6)


def test_margin_from_norm_params_finite():
    scale = RNG.uniform(0.5, 2.0, size=16).astype(np.float32)
    bias = RNG.normal(size=16).astype(np.float32)
    m = np.asarray(margin_from_norm_params(scale, bias))
    assert np.isfinite(m).all()
    assert (m <= bias + 1e-6).all()  # margin never exceeds the mean


def test_distillation_wrapper_runs():
    m = ShiftGcnPlus(
        num_classes=5, in_feat=3, graph=SKEL, c_mul=2, normalization="LayerNorm"
    )
    x = jnp.asarray(RNG.normal(size=(1, 16, 7, 3)).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x, 0)
    (logits, dloss), = [m.apply(p, x, 10)]
    assert logits.shape == (1, 5)
    assert np.isfinite(float(dloss))
    # distillation gradient reaches the student but not the teacher
    g = jax.grad(
        lambda p: m.apply(p, x, 10)[1]
    )(p)
    s_g = sum(
        float(np.abs(np.asarray(l)).sum())
        for l in jax.tree.leaves(g["params"]["student"])
    )
    t_g = sum(
        float(np.abs(np.asarray(l)).sum())
        for l in jax.tree.leaves(g["params"]["teacher"])
    )
    assert s_g > 0
    assert t_g == 0
