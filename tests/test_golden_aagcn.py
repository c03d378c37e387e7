"""Golden parity: the actual reference AA-GCN model vs stgx, weights copied."""

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

import torch_ref as tr
from torch_ref import to_torch

SKEL = load_skeleton("imu_fogit_ABCD")
RNG = np.random.default_rng(2)

CFG = dict(
    num_classes=5, in_feat=6, graph=SKEL, kernel=3,
    in_ch=(8, 8), out_ch=(8, 16), stride=(1, 2), residual=(1, 1),
    dropout=(0.0, 0.0), importance=True,
)


def _ref_kwargs(normalization, output_type):
    return {
        "strategy": "spatial",
        "in_feat": 6,
        "num_classes": 5,
        "normalization": normalization,
        "output_type": output_type,
        "graph": {"num_node": 7, "edge": [list(e) for e in SKEL["edge"]],
                  "center": 0},
        "aa-gcn": {
            "importance": True,
            "in_feat": 6,
            "layers": 2,
            "kernel": 3,
            "in_ch": [8, 8],
            "out_ch": [8, 16],
            "stride": [1, 2],
            "residual": [1, 1],
            "dropout": [0.0, 0.0],
        },
    }


def _copy_stream(sp, tstream, kind):
    """Copy one stgx _Stream param tree into a reference stream ModuleDict."""
    tr.copy_norm(
        sp[[k for k in sp if k.startswith(("LayerNorm", "BatchNorm"))][0]]
        if False else sp[sorted(k for k in sp if k.startswith(("LayerNorm", "BatchNorm")))[0]],
        tstream["norm_in"], kind, per_joint=kind == "BatchNorm",
    )
    tr.copy_dense_as_conv1x1(sp["Dense_0"], tstream["fcn_in"])
    ei = np.asarray(sp["edge_importance"])
    for i, tlayer in enumerate(tstream["gcn_networks"]):
        lp = sp[f"AgcnLayer_{i}"]
        # B + attention convs
        with torch.no_grad():
            tlayer.B.copy_(torch.from_numpy(np.asarray(lp["B"]).copy()))
            # stgx theta kernel (Cin, P*emb) → torch conv (P*emb, Cin, 1, 1)
            tlayer.theta.weight.copy_(
                torch.from_numpy(np.asarray(lp["theta_kernel"]).T[:, :, None, None].copy())
            )
            tlayer.theta.bias.copy_(torch.from_numpy(np.asarray(lp["theta_bias"]).copy()))
            tlayer.phi.weight.copy_(
                torch.from_numpy(np.asarray(lp["phi_kernel"]).T[:, :, None, None].copy())
            )
            tlayer.phi.bias.copy_(torch.from_numpy(np.asarray(lp["phi_bias"]).copy()))
        tr.copy_ref_stgcn_layer(lp["StgcnLayer_0"], tlayer.st_gcn, kind)
    tr.copy_dense_as_conv1x1(sp["Dense_1"], tstream["fcn_out"])
    return ei


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
@pytest.mark.parametrize("normalization", ["LayerNorm"])
@pytest.mark.parametrize("output_type", ["logits", "softmax"])
def test_aagcn_golden(normalization, output_type):
    from models.aagcn.aagcn import Model as RefAaGcn

    model = MODELS["aa-gcn"](
        normalization=normalization, output_type=output_type, **CFG
    )
    x = RNG.normal(size=(3, 16, 7, 6)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(3), jnp.asarray(x))
    y = np.asarray(model.apply(params, jnp.asarray(x)))

    ref = RefAaGcn(**_ref_kwargs(normalization, output_type)).eval()
    p = params["params"]
    ei_j = _copy_stream(p["joint_stream"], ref.streams[0], normalization)
    ei_b = _copy_stream(p["bone_stream"], ref.streams[1], normalization)
    # reference edge importance lives at model level... it doesn't exist for
    # aa-gcn (adaptive A+B+C replaces it); stgx streams carry per-layer masks
    # initialized to ones — assert they are still ones so parity is valid
    assert np.allclose(ei_j, 1.0) and np.allclose(ei_b, 1.0)

    with torch.no_grad():
        y_ref = ref(to_torch(x)).numpy().squeeze(-1)
    np.testing.assert_allclose(y, y_ref, atol=5e-4, rtol=1e-3)
