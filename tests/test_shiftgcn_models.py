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


def _ref_margin(scale, bias):
    """Independent scalar-loop implementation of the reference's
    ``get_margin_from_BN`` (shiftgcn_plus.py:561-573) — the executable spec
    the vectorized :func:`margin_from_norm_params` is pinned against."""
    import math

    from scipy.stats import norm

    out = []
    for s, m in zip(
        np.abs(np.asarray(scale, np.float64)).reshape(-1),
        np.asarray(bias, np.float64).reshape(-1),
    ):
        if norm.cdf(-m / s) > 0.001:
            out.append(
                -s * math.exp(-((m / s) ** 2) / 2) / math.sqrt(2 * math.pi)
                / norm.cdf(-m / s) + m
            )
        else:
            out.append(-3.0 * s)
    return np.asarray(out, np.float32).reshape(np.shape(bias))


def test_margin_matches_reference_formula():
    rng = np.random.default_rng(3)
    scale = rng.uniform(0.1, 2.0, size=64).astype(np.float32)
    bias = (rng.normal(size=64) * 3).astype(np.float32)
    got = np.asarray(margin_from_norm_params(scale, bias))
    np.testing.assert_allclose(got, _ref_margin(scale, bias), rtol=1e-4, atol=1e-5)


def test_graft_teacher_margins_and_frozen_teacher():
    """Distill under a *trained* teacher: graft a standalone teacher's params
    into the wrapper, check the sown margins equal the reference formula on
    the grafted tap-norm affines, and that teacher grads are exactly zero
    (reference loads the teacher checkpoint and detaches its features,
    shiftgcn_plus.py:595-607)."""
    import flax

    from stgx.models.shiftgcn_plus import graft_teacher_params

    m = ShiftGcnPlus(
        num_classes=5, in_feat=3, graph=SKEL, c_mul=2, normalization="LayerNorm"
    )
    x = jnp.asarray(RNG.normal(size=(1, 16, 7, 3)).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x, 0)

    # a stand-in "trained" teacher: fresh seed, tap-norm affines randomized
    # so the margins are non-trivial
    t = ShiftGcnPlusTeacher(
        num_classes=5, in_feat=3, graph=SKEL, normalization="LayerNorm"
    )
    pt = flax.core.unfreeze(t.init(jax.random.PRNGKey(7), x))
    rng = np.random.default_rng(5)
    for u in t.feature_taps():
        nrm = pt["params"][f"units_{u}"]["TeacherTemporalShift_0"]["LayerNorm_1"]
        nrm["scale"] = jnp.asarray(
            rng.uniform(0.2, 2.0, nrm["scale"].shape), jnp.float32
        )
        nrm["bias"] = jnp.asarray(
            rng.normal(size=nrm["bias"].shape), jnp.float32
        )

    p2 = graft_teacher_params(p, pt)
    # the teacher subtree now IS the trained teacher
    for a, b in zip(
        jax.tree.leaves(p2["params"]["teacher"]), jax.tree.leaves(pt["params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    (logits, dloss), inter = m.apply(p2, x, 10, mutable=["intermediates"])
    assert logits.shape == (1, 5) and np.isfinite(float(dloss))
    margins = inter["intermediates"]["margins"][0]
    assert len(margins) == 3
    for i, u in enumerate(t.feature_taps()):
        nrm = pt["params"][f"units_{u}"]["TeacherTemporalShift_0"]["LayerNorm_1"]
        expect = _ref_margin(nrm["scale"], nrm["bias"])
        np.testing.assert_allclose(
            np.asarray(margins[i]).squeeze(), expect, rtol=1e-4, atol=1e-5
        )

    # total loss (classification-like + distillation) reaches the student
    # but leaves the grafted teacher untouched — exactly zero grads
    def total(p):
        out, aux = m.apply(p, x, 10)
        return jnp.sum(out**2) + aux

    g = jax.grad(total)(p2)
    s_g = sum(
        float(np.abs(np.asarray(l)).sum())
        for l in jax.tree.leaves(g["params"]["student"])
    )
    t_g = max(
        float(np.abs(np.asarray(l)).max())
        for l in jax.tree.leaves(g["params"]["teacher"])
    )
    assert s_g > 0
    assert t_g == 0.0


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


def test_teacher_train_then_distill_end_to_end(tmp_path):
    """The full reference procedure (shiftgcn_plus.py:576-607): train the
    teacher standalone, checkpoint it, then train the student under the
    loaded teacher via the CLI grafting path + epoch-annealed gates."""
    import os

    from stgx.cli import maybe_graft_teacher
    from stgx.data import SkeletonDirDataset, class_distribution, load_actions
    from stgx.data.synth import generate
    from stgx.models import MODELS
    from stgx.parallel.loop import MODEL_KIND, OptimizerConfig, Trainer
    from stgx.utils import LOSS
    from stgx.utils.checkpoint import save_checkpoint

    d = str(tmp_path / "synth")
    info = generate(
        d, in_feat=3, num_train=2, num_val=1, min_len=24, max_len=32,
        segments_per_trial=2, seed=4,
    )
    train = SkeletonDirDataset(
        os.path.join(d, "train", "features"), os.path.join(d, "train", "labels")
    )
    ncls = len(load_actions(info["actions"]))
    dist = class_distribution(train, ncls)
    common = dict(num_classes=ncls, in_feat=3, graph=SKEL,
                  normalization="LayerNorm")

    # 1) train the teacher standalone for one epoch and checkpoint it
    teacher = MODELS["shift-gcn++-teacher"](**common)
    t_tr = Trainer(
        model=teacher, kind=MODEL_KIND["shift-gcn++-teacher"],
        loss=LOSS["shift-gcn++-teacher"](dist),
        opt=OptimizerConfig(learning_rate=1e-3, batch_size=2, epochs=1),
        receptive_field=12,
    )
    tp, topt = t_tr.init(np.zeros((2, 12, 7, 3), np.float32))
    tp, topt, st = t_tr.train_epoch(tp, topt, train, 0)
    assert np.isfinite(st["ce"])
    ckpt = save_checkpoint(str(tmp_path / "out"), 0, tp, topt)

    # 2) distill the student under the trained teacher via the CLI knob
    wrapper = MODELS["shift-gcn++"](c_mul=2, **common)
    s_tr = Trainer(
        model=wrapper, kind=MODEL_KIND["shift-gcn++"],
        loss=LOSS["shift-gcn++"](dist),
        opt=OptimizerConfig(learning_rate=1e-3, batch_size=2, epochs=1),
        receptive_field=12, pass_epoch=True,
    )
    sp, sopt = s_tr.init(np.zeros((2, 12, 7, 3), np.float32))
    cfg = {
        "processor": {"model": "shift-gcn++"},
        "arch": {"shift-gcn++": {"teacher_checkpoint": ckpt}},
    }
    sp = maybe_graft_teacher(cfg, s_tr, sp, log=lambda *_: None)
    for a, b in zip(
        jax.tree.leaves(sp["params"]["teacher"]), jax.tree.leaves(tp["params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    sp, sopt, st = s_tr.train_epoch(sp, sopt, train, 0)
    assert np.isfinite(st["ce"])
    # the teacher stayed frozen through the distillation epoch
    for a, b in zip(
        jax.tree.leaves(sp["params"]["teacher"]), jax.tree.leaves(tp["params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
