"""Pipeline parallelism (stage-per-device GPipe over MS-TCN/MS-GCN
refinement stages, SURVEY.md §2.bis PP row): the pipelined forward and its
gradients match the sequential model exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from stgx.graph import load_skeleton
from stgx.models import MODELS
from stgx.models.stgcn import Stgcn
from stgx.parallel.mesh import make_mesh
from stgx.parallel.pipeline import (
    mstcn_apply_pipelined,
    msgcn_refine_pipelined,
    pipeline_apply,
    stack_stage_params,
)

MSTCN_ARCH = dict(
    num_classes=5, in_feat=6, stages=5,
    filters=(8,) * 5, layers=(2,) * 5, kernel=(3,) * 5, dropout=(0.0,) * 5,
)


def test_mstcn_pipeline_matches_sequential(devices):
    mesh = make_mesh(data=2, seq=1, model=4)
    model = MODELS["ms-tcn"](**MSTCN_ARCH)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 32, 7, 6)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)

    expected = jax.jit(lambda p, x: model.apply(p, x))(params, x)
    got = jax.jit(
        lambda p, x: mstcn_apply_pipelined(model, p, x, mesh)
    )(params, x)

    assert got.shape == expected.shape == (5, 4, 32, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_mstcn_pipeline_gradients_match(devices):
    mesh = make_mesh(data=2, seq=1, model=4)
    model = MODELS["ms-tcn"](**MSTCN_ARCH)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 16, 7, 6)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(5, 4, 16, 5)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(2), x)

    def seq_loss(p):
        return jnp.mean((model.apply(p, x, train=True) - y) ** 2)

    def pipe_loss(p):
        return jnp.mean((mstcn_apply_pipelined(model, p, x, mesh) - y) ** 2)

    l_ref, g_ref = jax.jit(jax.value_and_grad(seq_loss))(params)
    l_pp, g_pp = jax.jit(jax.value_and_grad(pipe_loss))(params)

    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-5)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_pp),
        jax.tree_util.tree_leaves_with_path(g_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_mstcn_pipeline_single_trial(devices):
    # N=1 (the reference's per-trial regime) degenerates to M=1 and still works
    mesh = make_mesh(data=2, seq=1, model=4)
    model = MODELS["ms-tcn"](**MSTCN_ARCH)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 24, 7, 6)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    expected = model.apply(params, x)
    got = jax.jit(lambda p, x: mstcn_apply_pipelined(model, p, x, mesh))(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_msgcn_refine_pipeline_matches_sequential(devices):
    mesh = make_mesh(data=2, seq=1, model=4)
    skel = load_skeleton("imu_fogit_ABCD")
    model = MODELS["ms-gcn"](
        num_classes=5, in_feat=6, graph=skel, normalization="LayerNorm",
        kernel=3, in_ch=(8, 16), out_ch=(16, 16), stride=(1, 1),
        residual=(1, 1), dropout=(0.0, 0.0),
        stages=4, filters=(8,) * 4, layers=(2,) * 4,
        refine_kernel=(3,) * 4, refine_dropout=(0.0,) * 4,
    )
    rng = np.random.default_rng(4)
    windows = jnp.asarray(rng.normal(size=(16, 8, 7, 6)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), windows)

    expected = model.apply(params, windows)  # (stages+1, 1, T, classes)

    gen = Stgcn(
        num_classes=5, in_feat=6, graph=skel, normalization="LayerNorm",
        kernel=3, in_ch=(8, 16), out_ch=(16, 16), stride=(1, 1),
        residual=(1, 1), dropout=(0.0, 0.0),
    )
    y = gen.apply({"params": params["params"]["Stgcn_0"]}, windows)[None]
    got = jax.jit(
        lambda p, y: msgcn_refine_pipelined(model, p, y, mesh)
    )(params, y)

    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_pipeline_stage_count_mismatch_raises(devices):
    mesh = make_mesh(data=2, seq=1, model=4)
    stacked = {"w": jnp.zeros((3, 2, 2))}  # 3 stages on a 4-device axis
    try:
        pipeline_apply(lambda p, y: y, stacked, jnp.zeros((4, 8)), mesh)
    except ValueError as e:
        assert "stage count" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_stack_stage_params():
    p = {
        "S_0": {"w": jnp.ones((2,))},
        "S_1": {"w": jnp.full((2,), 2.0)},
    }
    stacked = stack_stage_params(p, ["S_0", "S_1"])
    np.testing.assert_allclose(
        np.asarray(stacked["w"]), [[1.0, 1.0], [2.0, 2.0]]
    )


def test_trainer_pipelined_epoch_matches_sequential(devices):
    """A Trainer with pipeline=True trains MS-TCN to the same params and
    eval numbers as the plain sequential Trainer."""
    from stgx.parallel.loop import OptimizerConfig, Trainer
    from stgx.utils import LOSS

    arch = dict(
        num_classes=5, in_feat=6, stages=5,
        filters=(8,) * 5, layers=(2,) * 5, kernel=(3,) * 5,
        dropout=(0.0,) * 5,
    )
    rng = np.random.default_rng(3)
    trials = [
        (
            rng.normal(size=(64, 7, 6)).astype(np.float32),
            rng.integers(0, 5, size=(64,)).astype(np.int64),
        )
        for _ in range(4)
    ]
    loss = LOSS["ms-tcn"](np.ones(5, np.float32))
    opt = OptimizerConfig(learning_rate=1e-3, batch_size=2, epochs=1)

    def run(pipeline, mesh):
        model = MODELS["ms-tcn"](**arch)
        tr = Trainer(
            model=model, kind="frame_ms", loss=loss, opt=opt,
            mesh=mesh, bucket=64, pipeline=pipeline,
        )
        params, opt_state = tr.init(trials[0][0][None])
        params, _, stats = tr.train_epoch(params, opt_state, trials, 0)
        ev = tr.evaluate(params, trials)
        return params, stats, ev

    p_seq, s_seq, e_seq = run(False, None)
    mesh = make_mesh(data=1, seq=2, model=4)  # 4 refinement stages
    p_pp, s_pp, e_pp = run(True, mesh)

    np.testing.assert_allclose(s_pp["ce"], s_seq["ce"], rtol=1e-4)
    np.testing.assert_allclose(e_pp["top1"], e_seq["top1"], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_pp), jax.tree.leaves(p_seq)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        )


def test_trainer_pipeline_validation(devices):
    from stgx.parallel.loop import OptimizerConfig, Trainer
    from stgx.utils import LOSS

    model = MODELS["ms-tcn"](**MSTCN_ARCH)
    loss = LOSS["ms-tcn"](np.ones(5, np.float32))
    opt = OptimizerConfig()
    mesh = make_mesh(data=1, seq=2, model=4)
    # wrong kind
    try:
        Trainer(model=model, kind="frame", loss=loss, opt=opt,
                mesh=mesh, pipeline=True)
    except ValueError as e:
        assert "ms-tcn" in str(e)
    else:
        raise AssertionError("expected ValueError")
    # no mesh
    try:
        Trainer(model=model, kind="frame_ms", loss=loss, opt=opt,
                pipeline=True)
    except ValueError as e:
        assert "model" in str(e)
    else:
        raise AssertionError("expected ValueError")
