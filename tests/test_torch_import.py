"""Reference-checkpoint importer: torch state dicts from the ACTUAL
reference models (st-gcn, ms-tcn; rt-st-gcn structural) convert into stgx
params that reproduce the reference forward — the no-retrain migration path
documented in MIGRATION.md."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
HAVE_REF = os.path.isdir(REF)
if HAVE_REF:
    sys.path.insert(0, REF)

import jax
import jax.numpy as jnp
import torch

from stgx.graph import load_skeleton
from stgx.models import MODELS
from stgx.utils.torch_import import import_reference_state_dict

from torch_ref import to_torch

SKEL = load_skeleton("imu_fogit_ABCD")
RNG = np.random.default_rng(7)


def _graph_kwargs():
    return {"num_node": 7, "edge": [list(e) for e in SKEL["edge"]],
            "center": 0}


def _assert_same_tree(got, want_template):
    gl = jax.tree_util.tree_leaves_with_path(got)
    wl = jax.tree_util.tree_leaves_with_path(want_template)
    gk = {jax.tree_util.keystr(p): np.shape(l) for p, l in gl}
    wk = {jax.tree_util.keystr(p): np.shape(l) for p, l in wl}
    assert gk == wk


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
@pytest.mark.parametrize("normalization", ["LayerNorm", "BatchNorm"])
def test_import_stgcn_matches_reference_forward(normalization):
    from models.stgcn.stgcn import Model as RefModel

    arch = {
        "importance": True, "in_feat": 6, "layers": 3, "kernel": 3,
        "in_ch": [8, 8, 16], "out_ch": [8, 16, 16], "stride": [1, 2, 1],
        "residual": [0, 1, 1], "dropout": [0.0, 0.0, 0.0],
    }
    ref = RefModel(
        strategy="spatial", in_feat=6, num_classes=5,
        normalization=normalization, graph=_graph_kwargs(),
        **{"st-gcn": arch},
    ).eval()
    # perturb from the default init so the test is not trivially symmetric
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    model = MODELS["st-gcn"](
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=tuple(arch["in_ch"]), out_ch=tuple(arch["out_ch"]),
        stride=tuple(arch["stride"]), residual=tuple(arch["residual"]),
        dropout=(0.0,) * 3, normalization=normalization, importance=True,
    )
    params = import_reference_state_dict(ref.state_dict(), model, "st-gcn")
    _assert_same_tree(
        params, model.init(jax.random.PRNGKey(0), jnp.zeros((2, 12, 7, 6)))
    )

    x = RNG.normal(size=(2, 12, 7, 6)).astype(np.float32)
    y = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        y_ref = ref(to_torch(x)).numpy().squeeze(-1)
    np.testing.assert_allclose(y, y_ref, atol=3e-4, rtol=1e-4)


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
def test_import_checkpoint_wrapper_and_dp_prefix():
    """Accepts the full {epoch, model_state_dict, ...} checkpoint dict with
    DataParallel 'module.' prefixes (reference processor.py:39-56)."""
    from models.stgcn.stgcn import Model as RefModel

    arch = {
        "importance": True, "in_feat": 6, "layers": 2, "kernel": 3,
        "in_ch": [8, 8], "out_ch": [8, 8], "stride": [1, 1],
        "residual": [1, 1], "dropout": [0.0, 0.0],
    }
    ref = RefModel(
        strategy="spatial", in_feat=6, num_classes=5,
        normalization="LayerNorm", graph=_graph_kwargs(),
        **{"st-gcn": arch},
    ).eval()
    ckpt = {
        "epoch": 17,
        "model_state_dict": {
            f"module.{k}": v for k, v in ref.state_dict().items()
        },
        "loss": 0.0,
    }
    model = MODELS["st-gcn"](
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8), out_ch=(8, 8), stride=(1, 1), residual=(1, 1),
        dropout=(0.0, 0.0), normalization="LayerNorm", importance=True,
    )
    params = import_reference_state_dict(ckpt, model, "st-gcn")
    x = RNG.normal(size=(1, 10, 7, 6)).astype(np.float32)
    y = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        y_ref = ref(to_torch(x)).numpy().squeeze(-1)
    np.testing.assert_allclose(y, y_ref, atol=3e-4, rtol=1e-4)


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
@pytest.mark.parametrize("normalization", ["LayerNorm", "BatchNorm"])
def test_import_rtstgcn_structure_and_values(normalization):
    """The reference RT-ST-GCN's batch forward is broken as committed
    (SURVEY.md §5.9), so golden-forward is impossible; instead: the imported
    tree matches init exactly, key tensors round-trip the documented layout
    transforms, and the stgx forward + streaming both run on the weights."""
    from models.rtstgcn.rtstgcn import Model as RefModel

    arch = {
        "importance": True, "latency": False, "in_feat": 6, "buffer": 1,
        "stages": 1, "layers": 2, "kernel": 3, "in_ch": [8, 8],
        "out_ch": [8, 16], "stride": [1, 1], "residual": [1, 1],
        "dropout": [0.0, 0.0],
    }
    ref = RefModel(
        rank="cpu", strategy="spatial", in_feat=6, num_classes=5,
        normalization=normalization, graph=_graph_kwargs(), segment=10,
        **{"rt-st-gcn": arch},
    )
    model = MODELS["rt-st-gcn"](
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8), out_ch=(8, 16), stride=(1, 1), residual=(1, 1),
        dropout=(0.0, 0.0), normalization=normalization, importance=True,
    )
    sd = ref.state_dict()
    params = import_reference_state_dict(sd, model, "rt-st-gcn")
    _assert_same_tree(
        params, model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 7, 6)))
    )

    # layout round-trips
    p = params["params"]
    w0 = sd["st_gcn.0.conv.weight"].numpy()[:, :, 0, 0]  # (P*8, 6→8?)
    got = np.asarray(p["layers_0"]["GraphConv_0"]["kernel"])
    P, cin, cout = got.shape
    np.testing.assert_allclose(
        got, w0.reshape(P, cout, cin).transpose(0, 2, 1)
    )
    np.testing.assert_allclose(
        np.asarray(p["edge_importance"][1]),
        sd["st_gcn.1.edge_importance"].numpy(),
    )
    # res conv (layer 1 changes channels; reference uses bias-free conv)
    np.testing.assert_allclose(
        np.asarray(p["layers_1"]["res_kernel"]),
        sd["st_gcn.1.residual.0.weight"].numpy()[:, :, 0, 0].T,
    )
    assert "res_bias" not in p["layers_1"]

    x = jnp.asarray(RNG.normal(size=(1, 16, 7, 6)).astype(np.float32))
    y = model.apply(params, x)
    assert y.shape == (1, 16, 5)
    assert np.isfinite(np.asarray(y)).all()

    from stgx.models.rtstgcn import stream_sequence

    ys, _ = stream_sequence(model, params, x)
    assert np.isfinite(np.asarray(ys)).all()


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
def test_import_mstcn_matches_reference_forward(monkeypatch):
    from models.mstcn.mstcn import Model as RefMsTcn

    # §5.9 bitrot workaround: reference mstcn.py:50-53 does
    # `torch.zeros(..., device=x.get_device())`, broken on CPU (-1); return
    # the real torch.device so the committed forward executes unchanged
    monkeypatch.setattr(torch.Tensor, "get_device", lambda self: self.device)

    ref = RefMsTcn(
        num_classes=5, refine="softmax", output_type="logits",
        **{"ms-tcn": {"stages": 2, "in_feat": 6, "filters": [8, 8],
                      "layers": [3, 3], "kernel": [3, 3],
                      "dropout": [0.0, 0.0]}},
    ).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    model = MODELS["ms-tcn"](
        num_classes=5, in_feat=6, stages=2, filters=(8, 8), layers=(3, 3),
        kernel=(3, 3), dropout=(0.0, 0.0), refine="softmax",
        output_type="logits",
    )
    params = import_reference_state_dict(ref.state_dict(), model, "ms-tcn")
    _assert_same_tree(
        params, model.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 7, 6)))
    )

    x = RNG.normal(size=(1, 24, 7, 6)).astype(np.float32)
    y = np.asarray(model.apply(params, jnp.asarray(x)))  # (S, 1, L, C)
    with torch.no_grad():
        y_ref = ref(to_torch(x)).numpy()
    np.testing.assert_allclose(
        y[:, 0].transpose(0, 2, 1), y_ref[:, 0], atol=3e-4, rtol=1e-4
    )


def test_import_unknown_model_raises():
    try:
        import_reference_state_dict({}, None, "shift-gcn")
    except ValueError as e:
        assert "shift-gcn" in str(e)
    else:
        raise AssertionError("expected ValueError")


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
def test_import_aagcn_matches_reference_forward():
    from models.aagcn.aagcn import Model as RefAagcn

    arch = {
        "in_feat": 6, "layers": 2, "kernel": 3, "in_ch": [8, 8],
        "out_ch": [8, 16], "stride": [1, 1], "residual": [1, 1],
        "dropout": [0.0, 0.0],
    }
    ref = RefAagcn(
        strategy="spatial", in_feat=6, num_classes=5,
        normalization="LayerNorm", output_type="logits",
        graph=_graph_kwargs(), **{"aa-gcn": arch},
    ).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    model = MODELS["aa-gcn"](
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8), out_ch=(8, 16), stride=(1, 1), residual=(1, 1),
        dropout=(0.0, 0.0), normalization="LayerNorm",
        output_type="logits",
    )
    params = import_reference_state_dict(ref.state_dict(), model, "aa-gcn")
    _assert_same_tree(
        params, model.init(jax.random.PRNGKey(0), jnp.zeros((2, 12, 7, 6)))
    )

    x = RNG.normal(size=(2, 12, 7, 6)).astype(np.float32)
    y = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        y_ref = ref(to_torch(x)).numpy().squeeze(-1)
    np.testing.assert_allclose(y, y_ref, atol=5e-4, rtol=1e-3)


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
def test_import_msgcn_two_part_checkpoint():
    """The MS-GCN checkpoint stores generator_stage / refinement_stages as
    separate dicts (reference processor.py:333-342); both nest correctly
    into the stgx tree and the forward runs."""
    from models.msgcn.msgcn import Model as RefMsGcn

    ref = RefMsGcn(
        strategy="spatial", in_feat=6, num_classes=5,
        normalization="LayerNorm", refine="softmax", output_type="logits",
        graph=_graph_kwargs(), stages=2,
        **{
            "st-gcn": {
                "importance": True, "in_feat": 6, "layers": 2, "kernel": 3,
                "in_ch": [8, 8], "out_ch": [8, 16], "stride": [1, 1],
                "residual": [1, 1], "dropout": [0.0, 0.0],
            },
            "ms-tcn": {
                "stages": 2, "filters": [8, 8], "layers": [2, 2],
                "kernel": [3, 3], "dropout": [0.0, 0.0],
            },
        },
    ).eval()
    two_part = {
        "generator_stage": ref.generator_stage.state_dict(),
        "refinement_stages": ref.refinement_stages.state_dict(),
    }
    model = MODELS["ms-gcn"](
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8), out_ch=(8, 16), stride=(1, 1), residual=(1, 1),
        dropout=(0.0, 0.0), normalization="LayerNorm", stages=2,
        filters=(8, 8), layers=(2, 2), refine_kernel=(3, 3),
        refine_dropout=(0.0, 0.0), refine="softmax", output_type="logits",
    )
    params = import_reference_state_dict(
        {"epoch": 3, "model_state_dict": two_part}, model, "ms-gcn"
    )
    _assert_same_tree(
        params, model.init(jax.random.PRNGKey(0), jnp.zeros((12, 10, 7, 6)))
    )
    # value spot checks through both parts
    np.testing.assert_allclose(
        np.asarray(params["params"]["Stgcn_0"]["fcn_in"]["kernel"]),
        ref.generator_stage.fcn_in.weight.detach().numpy()[:, :, 0, 0].T,
    )
    np.testing.assert_allclose(
        np.asarray(
            params["params"]["SingleStage_1"]["Dense_0"]["kernel"]
        ),
        ref.refinement_stages[1].conv_in.weight.detach().numpy()[:, :, 0, 0].T,
    )
    x = jnp.asarray(RNG.normal(size=(12, 10, 7, 6)).astype(np.float32))
    y = model.apply(params, x)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
def test_import_costgcn_structure_and_values():
    from models.costgcn.costgcn import Model as RefModel

    arch = {
        "importance": True, "in_feat": 6, "layers": 2, "kernel": 3,
        "in_ch": [8, 8], "out_ch": [8, 16], "stride": [1, 1],
        "dilation": [1, 2], "residual": [1, 1], "dropout": [0.0, 0.0],
    }
    ref = RefModel(
        strategy="spatial", in_feat=6, num_classes=5,
        normalization="LayerNorm", graph=_graph_kwargs(),
        **{"st-gcn": arch},  # the reference costgcn reads the st-gcn group
    )
    model = MODELS["co-st-gcn"](
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8), out_ch=(8, 16), residual=(1, 1),
        dropout=(0.0, 0.0), dilation=(1, 2), normalization="LayerNorm",
    )
    sd = ref.state_dict()
    params = import_reference_state_dict(sd, model, "co-st-gcn")
    _assert_same_tree(
        params, model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 7, 6)))
    )
    np.testing.assert_allclose(
        np.asarray(params["params"]["layers_1"]["tcn_kernel"]),
        sd["gcn_networks.1.tcn.2.weight"].numpy()[:, :, :, 0]
        .transpose(2, 1, 0),
    )
    x = jnp.asarray(RNG.normal(size=(1, 16, 7, 6)).astype(np.float32))
    y = model.apply(params, x)
    assert np.isfinite(np.asarray(y)).all()


# -- export direction ---------------------------------------------------------


def _models_for_roundtrip():
    common = dict(
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8), out_ch=(8, 16), residual=(1, 1),
        dropout=(0.0, 0.0), normalization="LayerNorm",
    )
    return {
        "st-gcn": MODELS["st-gcn"](stride=(1, 1), importance=True, **common),
        "rt-st-gcn": MODELS["rt-st-gcn"](stride=(1, 1), importance=True,
                                         **common),
        "co-st-gcn": MODELS["co-st-gcn"](dilation=(1, 2), **common),
        "aa-gcn": MODELS["aa-gcn"](stride=(1, 1), **common),
        "ms-tcn": MODELS["ms-tcn"](
            num_classes=5, in_feat=6, stages=2, filters=(8, 8),
            layers=(2, 2), kernel=(3, 3), dropout=(0.0, 0.0),
        ),
        "ms-gcn": MODELS["ms-gcn"](
            stride=(1, 1), stages=2, filters=(8, 8), layers=(2, 2),
            refine_kernel=(3, 3), refine_dropout=(0.0, 0.0), **common,
        ),
    }


@pytest.mark.parametrize("name", ["st-gcn", "rt-st-gcn", "co-st-gcn",
                                  "aa-gcn", "ms-tcn", "ms-gcn"])
def test_export_import_roundtrip(name):
    """export ∘ import is the identity on every family's parameter tree."""
    from stgx.utils.torch_import import export_reference_state_dict

    model = _models_for_roundtrip()[name]
    n = 12 if name in ("ms-gcn",) else 2
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((n, 10, 7, 6)))
    sd = export_reference_state_dict(params, model, name)
    if name == "ms-gcn":  # wrap like the reference checkpoint saver
        sd = {"model_state_dict": sd}
    back = import_reference_state_dict(sd, model, name)
    _assert_same_tree(back, params)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(back),
        jax.tree_util.tree_leaves_with_path(params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=0,
            err_msg=jax.tree_util.keystr(pa),
        )


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
def test_export_stgcn_loads_strict_and_matches():
    """Exported weights load into the ACTUAL reference model with
    strict=True (A buffer included) and reproduce the stgx forward."""
    from models.stgcn.stgcn import Model as RefModel
    from stgx.utils.torch_import import export_reference_state_dict

    arch = {
        "importance": True, "in_feat": 6, "layers": 2, "kernel": 3,
        "in_ch": [8, 8], "out_ch": [8, 16], "stride": [1, 2],
        "residual": [1, 1], "dropout": [0.0, 0.0],
    }
    model = MODELS["st-gcn"](
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8), out_ch=(8, 16), stride=(1, 2), residual=(1, 1),
        dropout=(0.0, 0.0), normalization="LayerNorm", importance=True,
    )
    params = model.init(jax.random.PRNGKey(5), jnp.zeros((2, 12, 7, 6)))
    sd = export_reference_state_dict(params, model, "st-gcn")

    ref = RefModel(
        strategy="spatial", in_feat=6, num_classes=5,
        normalization="LayerNorm", graph=_graph_kwargs(),
        **{"st-gcn": arch},
    ).eval()
    ref.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                        strict=True)

    x = RNG.normal(size=(2, 12, 7, 6)).astype(np.float32)
    y = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        y_ref = ref(to_torch(x)).numpy().squeeze(-1)
    np.testing.assert_allclose(y, y_ref, atol=3e-4, rtol=1e-4)


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
def test_export_aagcn_loads_strict_and_matches():
    from models.aagcn.aagcn import Model as RefAagcn
    from stgx.utils.torch_import import export_reference_state_dict

    arch = {
        "in_feat": 6, "layers": 2, "kernel": 3, "in_ch": [8, 8],
        "out_ch": [8, 16], "stride": [1, 1], "residual": [1, 1],
        "dropout": [0.0, 0.0],
    }
    model = MODELS["aa-gcn"](
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8), out_ch=(8, 16), stride=(1, 1), residual=(1, 1),
        dropout=(0.0, 0.0), normalization="LayerNorm",
        output_type="logits",
    )
    params = model.init(jax.random.PRNGKey(6), jnp.zeros((2, 12, 7, 6)))
    sd = export_reference_state_dict(params, model, "aa-gcn")
    ref = RefAagcn(
        strategy="spatial", in_feat=6, num_classes=5,
        normalization="LayerNorm", output_type="logits",
        graph=_graph_kwargs(), **{"aa-gcn": arch},
    ).eval()
    ref.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                        strict=True)
    x = RNG.normal(size=(2, 12, 7, 6)).astype(np.float32)
    y = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        y_ref = ref(to_torch(x)).numpy().squeeze(-1)
    np.testing.assert_allclose(y, y_ref, atol=5e-4, rtol=1e-3)


# -- optimizer (Adam moment) import -------------------------------------------


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
def test_import_adam_moments_and_resume():
    """Weights AND Adam moments from a torch-trained reference checkpoint
    transfer: moments land on the right stgx leaves with the weight layout
    transforms, the step count carries over, and a resumed stgx train step
    runs on the imported state."""
    from models.stgcn.stgcn import Model as RefModel
    from stgx.parallel.loop import OptimizerConfig, Trainer
    from stgx.utils import LOSS
    from stgx.utils.torch_import import import_reference_optimizer

    arch = {
        "importance": True, "in_feat": 6, "layers": 2, "kernel": 3,
        "in_ch": [8, 8], "out_ch": [8, 16], "stride": [1, 2],
        "residual": [1, 1], "dropout": [0.0, 0.0],
    }
    ref = RefModel(
        strategy="spatial", in_feat=6, num_classes=5,
        normalization="LayerNorm", graph=_graph_kwargs(),
        **{"st-gcn": arch},
    )
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
    for _ in range(3):
        x = torch.randn(4, 6, 12, 7)
        loss = ref(x).square().mean()
        opt.zero_grad(); loss.backward(); opt.step()
    ckpt = {
        "epoch": 5,
        "model_state_dict": ref.state_dict(),
        "optimizer_state_dict": opt.state_dict(),
        "loss": float(loss),
    }

    model = MODELS["st-gcn"](
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8), out_ch=(8, 16), stride=(1, 2), residual=(1, 1),
        dropout=(0.0, 0.0), normalization="LayerNorm", importance=True,
    )
    params = import_reference_state_dict(ckpt, model, "st-gcn")
    mu, nu, count = import_reference_optimizer(ckpt, model, "st-gcn")
    assert count == 3
    _assert_same_tree(mu, params)
    _assert_same_tree(nu, params)
    # a moment tensor transforms exactly like its weight: fcn_in conv
    state = ckpt["optimizer_state_dict"]["state"]
    keys = [k for k in ckpt["model_state_dict"] if k != "A"]
    i = keys.index("fcn_in.weight")
    np.testing.assert_allclose(
        np.asarray(mu["params"]["fcn_in"]["kernel"]),
        state[i]["exp_avg"].numpy()[:, :, 0, 0].T,
    )
    assert np.all(np.asarray(nu["params"]["fcn_in"]["kernel"]) >= 0)

    trainer = Trainer(
        model=model, kind="window",
        loss=LOSS["st-gcn"](np.ones(5, np.float32)),
        opt=OptimizerConfig(learning_rate=1e-3, batch_size=2, epochs=1),
        receptive_field=10, bucket=20,
    )
    p0, opt_state = trainer.init(np.zeros((4, 10, 7, 6), np.float32))
    opt_state = trainer.load_adam_moments(
        opt_state, trainer.place_params(mu), trainer.place_params(nu), count
    )
    rng2 = np.random.default_rng(11)
    trials = [
        (rng2.normal(size=(20, 7, 6)).astype(np.float32),
         rng2.integers(0, 5, size=(20,)).astype(np.int64))
        for _ in range(2)
    ]
    params = trainer.place_params(params)
    params, opt_state, stats = trainer.train_epoch(params, opt_state, trials, 0)
    assert np.isfinite(stats["ce"])


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
def test_import_adam_moments_msgcn_two_part():
    """ms-gcn Adam state reconstructs the flat parameter order from the
    two-part checkpoint (generator params first, then refinement)."""
    from models.msgcn.msgcn import Model as RefMsGcn
    from stgx.utils.torch_import import import_reference_optimizer

    ref = RefMsGcn(
        strategy="spatial", in_feat=6, num_classes=5,
        normalization="LayerNorm", refine="softmax", output_type="logits",
        graph=_graph_kwargs(), stages=2,
        **{
            "st-gcn": {
                "importance": True, "in_feat": 6, "layers": 2, "kernel": 3,
                "in_ch": [8, 8], "out_ch": [8, 16], "stride": [1, 1],
                "residual": [1, 1], "dropout": [0.0, 0.0],
            },
            "ms-tcn": {
                "stages": 2, "filters": [8, 8], "layers": [2, 2],
                "kernel": [3, 3], "dropout": [0.0, 0.0],
            },
        },
    )
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
    for p in ref.parameters():
        p.grad = torch.randn_like(p) * 1e-3
    opt.step()
    ckpt = {
        "epoch": 1,
        "model_state_dict": {
            "generator_stage": ref.generator_stage.state_dict(),
            "refinement_stages": ref.refinement_stages.state_dict(),
        },
        "optimizer_state_dict": opt.state_dict(),
    }
    model = MODELS["ms-gcn"](
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8), out_ch=(8, 16), stride=(1, 1), residual=(1, 1),
        dropout=(0.0, 0.0), normalization="LayerNorm", stages=2,
        filters=(8, 8), layers=(2, 2), refine_kernel=(3, 3),
        refine_dropout=(0.0, 0.0), refine="softmax", output_type="logits",
    )
    params = import_reference_state_dict(ckpt, model, "ms-gcn")
    mu, nu, count = import_reference_optimizer(ckpt, model, "ms-gcn")
    assert count == 1
    _assert_same_tree(mu, params)
    # spot-check: the generator fcn_in moment transformed like its weight
    state = ckpt["optimizer_state_dict"]["state"]
    gen_keys = [k for k in ckpt["model_state_dict"]["generator_stage"]
                if k != "A"]
    i = gen_keys.index("fcn_in.weight")
    np.testing.assert_allclose(
        np.asarray(mu["params"]["Stgcn_0"]["fcn_in"]["kernel"]),
        state[i]["exp_avg"].numpy()[:, :, 0, 0].T,
    )
    # and a refinement-stage moment (offset by the generator's param count)
    j = len(gen_keys) + list(
        ckpt["model_state_dict"]["refinement_stages"]
    ).index("0.conv_in.weight")
    np.testing.assert_allclose(
        np.asarray(mu["params"]["SingleStage_0"]["Dense_0"]["kernel"]),
        state[j]["exp_avg"].numpy()[:, :, 0, 0].T,
    )


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
def test_export_aagcn_trained_importance_folds_into_B():
    """A trained (non-identity) stgx edge-importance mask exports losslessly
    by folding into the reference's free B matrix: A·imp + B = A + B'."""
    from models.aagcn.aagcn import Model as RefAagcn
    from stgx.utils.torch_import import export_reference_state_dict

    arch = {
        "in_feat": 6, "layers": 2, "kernel": 3, "in_ch": [8, 8],
        "out_ch": [8, 16], "stride": [1, 1], "residual": [1, 1],
        "dropout": [0.0, 0.0],
    }
    model = MODELS["aa-gcn"](
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8), out_ch=(8, 16), stride=(1, 1), residual=(1, 1),
        dropout=(0.0, 0.0), normalization="LayerNorm",
        output_type="logits",
    )
    params = model.init(jax.random.PRNGKey(8), jnp.zeros((2, 12, 7, 6)))
    # perturb the importance masks away from the identity
    rng = np.random.default_rng(9)
    params = jax.tree_util.tree_map_with_path(
        lambda path, leaf: leaf + 0.2 * jnp.asarray(
            rng.normal(size=leaf.shape).astype(np.float32)
        ) if "edge_importance" in jax.tree_util.keystr(path) else leaf,
        params,
    )
    sd = export_reference_state_dict(params, model, "aa-gcn")
    ref = RefAagcn(
        strategy="spatial", in_feat=6, num_classes=5,
        normalization="LayerNorm", output_type="logits",
        graph=_graph_kwargs(), **{"aa-gcn": arch},
    ).eval()
    ref.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                        strict=True)
    x = RNG.normal(size=(2, 12, 7, 6)).astype(np.float32)
    y = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        y_ref = ref(to_torch(x)).numpy().squeeze(-1)
    np.testing.assert_allclose(y, y_ref, atol=5e-4, rtol=1e-3)


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
def test_torch_resume_false_imports_weights_only(tmp_path):
    """processor.torch_resume=false takes the weights but not the epoch or
    Adam moments (fine-tune-from-scratch semantics)."""
    from models.stgcn.stgcn import Model as RefModel
    from stgx.cli import maybe_import_torch_checkpoint
    from stgx.parallel.loop import OptimizerConfig, Trainer
    from stgx.utils import LOSS

    arch = {
        "importance": True, "in_feat": 6, "layers": 2, "kernel": 3,
        "in_ch": [8, 8], "out_ch": [8, 8], "stride": [1, 1],
        "residual": [1, 1], "dropout": [0.0, 0.0],
    }
    ref = RefModel(
        strategy="spatial", in_feat=6, num_classes=5,
        normalization="LayerNorm", graph=_graph_kwargs(),
        **{"st-gcn": arch},
    )
    opt = torch.optim.Adam(ref.parameters())
    for p in ref.parameters():
        p.grad = torch.randn_like(p)
    opt.step()
    path = str(tmp_path / "ref.pt")
    torch.save({"epoch": 99, "model_state_dict": ref.state_dict(),
                "optimizer_state_dict": opt.state_dict()}, path)

    model = MODELS["st-gcn"](
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8), out_ch=(8, 8), stride=(1, 1), residual=(1, 1),
        dropout=(0.0, 0.0), normalization="LayerNorm", importance=True,
    )
    trainer = Trainer(
        model=model, kind="window",
        loss=LOSS["st-gcn"](np.ones(5, np.float32)),
        opt=OptimizerConfig(), receptive_field=10, bucket=20,
    )
    p0, s0 = trainer.init(np.zeros((4, 10, 7, 6), np.float32))
    logs = []
    cfg = {"processor": {"torch_checkpoint": path, "torch_resume": False,
                         "model": "st-gcn"}}
    params, opt_state, epoch = maybe_import_torch_checkpoint(
        cfg, trainer, p0, s0, log=logs.append
    )
    assert epoch is None  # no resume
    # weights came from the checkpoint...
    np.testing.assert_allclose(
        np.asarray(params["params"]["fcn_in"]["kernel"]),
        ref.fcn_in.weight.detach().numpy()[:, :, 0, 0].T,
    )
    # ...but the Adam moments are fresh zeros
    import optax

    def find_adam(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s
        if isinstance(s, tuple):
            for v in s:
                r = find_adam(v)
                if r is not None:
                    return r
        return None

    adam = find_adam(opt_state)
    assert int(adam.count) == 0
    assert all(float(jnp.abs(l).max()) == 0.0
               for l in jax.tree.leaves(adam.mu))

    # default (resume) path returns the epoch and imports moments
    cfg["processor"]["torch_resume"] = True
    _, opt_state2, epoch2 = maybe_import_torch_checkpoint(
        cfg, trainer, p0, s0, log=logs.append
    )
    assert epoch2 == 99
    adam2 = find_adam(opt_state2)
    assert int(adam2.count) == 1
