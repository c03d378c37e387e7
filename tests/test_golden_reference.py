"""Golden parity: run the ACTUAL reference models (imported from
/root/reference) with stgx-trained weights copied in, assert outputs match.

Only the reference models that are runnable as committed are used (ST-GCN,
MS-TCN — the RT-ST-GCN OfflineLayer and CoST-GCN batch paths are broken as
committed, SURVEY.md §5.9; those are pinned by torch twins + FIFO
equivalence tests instead)."""

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

from torch_ref import copy_stgcn, to_torch

SKEL = load_skeleton("imu_fogit_ABCD")
RNG = np.random.default_rng(0)


def _ref_arch_kwargs(normalization):
    return {
        "strategy": "spatial",
        "in_feat": 6,
        "num_classes": 5,
        "normalization": normalization,
        "graph": {"num_node": 7, "edge": [list(e) for e in SKEL["edge"]],
                  "center": 0},
        "st-gcn": {
            "importance": True,
            "in_feat": 6,
            "layers": 3,
            "kernel": 3,
            "in_ch": [8, 8, 16],
            "out_ch": [8, 16, 16],
            "stride": [1, 2, 1],
            "residual": [0, 1, 1],
            "dropout": [0.0, 0.0, 0.0],
        },
    }


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
@pytest.mark.parametrize("normalization", ["LayerNorm", "BatchNorm"])
def test_stgcn_golden_vs_reference_model(normalization):
    from models.stgcn.stgcn import Model as RefModel

    cfg = dict(
        num_classes=5, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8, 16), out_ch=(8, 16, 16), stride=(1, 2, 1),
        residual=(0, 1, 1), dropout=(0.0, 0.0, 0.0), importance=True,
        normalization=normalization,
    )
    model = MODELS["st-gcn"](**cfg)
    x = RNG.normal(size=(4, 20, 7, 6)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ei = params["params"]["edge_importance"]
    params["params"]["edge_importance"] = ei + 0.1 * jnp.sin(
        jnp.arange(ei.size, dtype=jnp.float32).reshape(ei.shape)
    )
    y = np.asarray(model.apply(params, jnp.asarray(x)))

    ref = RefModel(**_ref_arch_kwargs(normalization)).eval()

    # copy stgx params into the reference model's modules
    p = params["params"]
    import torch_ref as tr

    tr.copy_norm(p["norm_in"], ref.norm_in, normalization,
                 per_joint=normalization == "BatchNorm")
    tr.copy_dense_as_conv1x1(p["fcn_in"], ref.fcn_in)
    for i, layer in enumerate(ref.gcn_networks):
        lp = p[f"layers_{i}"]
        tr.copy_graph_conv(lp["GraphConv_0"], layer.gcn)
        norms = sorted(k for k in lp if k.startswith(("LayerNorm", "BatchNorm")))
        idx = 0
        if layer.is_residual_conv:
            with torch.no_grad():
                layer.residual[0].weight.copy_(
                    torch.from_numpy(
                        np.asarray(lp["res_kernel"]).T[:, :, None, None].copy()
                    )
                )
                layer.residual[0].bias.copy_(
                    torch.from_numpy(np.asarray(lp["res_bias"]).copy())
                )
            tr.copy_norm(lp[norms[idx]], layer.residual[1], normalization)
            idx += 1
        tr.copy_norm(lp[norms[idx]], layer.tcn[0], normalization)
        tr.copy_norm(lp[norms[idx + 1]], layer.tcn[3], normalization)
        tr.copy_tcn_conv(lp["tcn_kernel"], lp["tcn_bias"], layer.tcn[2])
        with torch.no_grad():
            ref.edge_importance[i].copy_(
                torch.from_numpy(
                    np.asarray(p["edge_importance"][i]).copy()
                )
            )
    tr.copy_dense_as_conv1x1(p["fcn_out"], ref.fcn_out)

    with torch.no_grad():
        # the reference squeezes only the joint dim, leaving (N, classes, 1)
        y_ref = ref(to_torch(x)).numpy().squeeze(-1)
    np.testing.assert_allclose(y, y_ref, atol=3e-4, rtol=1e-4)


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
def test_mstcn_golden_vs_reference_model(monkeypatch):
    from models.mstcn.mstcn import Model as RefMsTcn

    # §5.9 bitrot workaround: the reference forward does
    # `device = x.get_device()` then `torch.zeros(..., device=device)`
    # (/root/reference/models/mstcn/mstcn.py:50-53), which breaks on CPU
    # where get_device() returns -1. Patch get_device to hand back the real
    # torch.device so the committed reference math executes unchanged.
    monkeypatch.setattr(torch.Tensor, "get_device", lambda self: self.device)

    model = MODELS["ms-tcn"](
        num_classes=5, in_feat=6, stages=2, filters=(8, 8), layers=(3, 3),
        kernel=(3, 3), dropout=(0.0, 0.0), refine="softmax",
        output_type="logits",
    )
    x = RNG.normal(size=(1, 24, 7, 6)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(x))
    y = np.asarray(model.apply(params, jnp.asarray(x)))  # (S, 1, L, C)

    ref = RefMsTcn(
        num_classes=5,
        refine="softmax",
        output_type="logits",
        **{"ms-tcn": {"stages": 2, "in_feat": 6, "filters": [8, 8],
                      "layers": [3, 3], "kernel": [3, 3],
                      "dropout": [0.0, 0.0]}},
    ).eval()

    p = params["params"]

    def copy_stage(sp, tstage):
        import torch_ref as tr

        tr.copy_dense_as_conv1x1(sp["Dense_0"], tstage.conv_in)
        for j, tl in enumerate(tstage.layers):
            lp = sp[f"DilatedResidualLayer_{j}"]
            tr.copy_tcn_conv(lp["conv_kernel"], lp["conv_bias"], tl.conv[0])
            tr.copy_dense_as_conv1x1(lp["Dense_0"], tl.conv[2])
        tr.copy_dense_as_conv1x1(sp["Dense_1"], tstage.conv_out)

    copy_stage(p["SingleStage_0"], ref.generator_stage)
    copy_stage(p["SingleStage_1"], ref.refinement_stages[0])

    with torch.no_grad():
        # reference consumes (1, C, L, V) and emits (S, 1, C, L)
        y_ref = ref(to_torch(x)).numpy()
    np.testing.assert_allclose(
        y[:, 0].transpose(0, 2, 1), y_ref[:, 0], atol=3e-4, rtol=1e-4
    )
