"""Import reference PyTorch checkpoints into stgx parameter trees.

The reference trains with torch and saves ``{epoch, model_state_dict,
optimizer_state_dict, loss}`` checkpoints (/root/reference/processor.py:
325-343). This module converts those ``model_state_dict``s into stgx params
so trained reference models migrate without retraining (see MIGRATION.md).
Supported families: ``st-gcn`` (reference models/stgcn/stgcn.py:30-101),
``rt-st-gcn`` (models/rtstgcn/rtstgcn.py:84-157 — weights import into the
stgx batch form, whose streaming cell shares the same parameters, so the
imported checkpoint streams directly), ``ms-tcn``
(models/mstcn/mstcn.py:10-45).

Everything is pure numpy over an already-loaded state dict — pass
``torch.load(path, map_location='cpu')['model_state_dict']`` (or the whole
checkpoint dict; both accepted). ``module.``-prefixed DataParallel dicts are
handled like the reference's own loader (processor.py:44-47).

Layout transforms (torch → stgx):

==================  =======================  =========================
reference tensor    torch shape              stgx leaf
==================  =======================  =========================
1×1 Conv2d          (D, C, 1, 1)             Dense kernel (C, D)
partitioned 1×1     (P·D, C, 1, 1)           GraphConv kernel (P, C, D)
temporal conv       (D, C, Γ, 1)             tcn_kernel (Γ, C, D)
custom LayerNorm    (C, 1, V)                scale/bias (V, C)
BatchNorm1d (V·C)   (V·C,)                   scale/bias (V, C)
BatchNorm2d         (C,)                     scale/bias (C,)
edge importance     per-layer (P, V, V)      stacked (layers, P, V, V)
==================  =======================  =========================
"""

from __future__ import annotations

import numpy as np

__all__ = ["import_reference_state_dict", "IMPORTERS"]


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _unwrap(state_dict) -> dict:
    if "model_state_dict" in state_dict:
        state_dict = state_dict["model_state_dict"]
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def _conv1x1(sd, key):
    """(D, C, 1, 1) + (D,) → {'kernel': (C, D), 'bias': (D,)}."""
    out = {"kernel": _np(sd[f"{key}.weight"])[:, :, 0, 0].T}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _graph_conv(sd, key, partitions):
    """(P·D, C, 1, 1) stacked partition-major (tgcn.py:58-79,
    rtstgcn.py:357-359) → kernel (P, C, D), bias (P, D)."""
    w = _np(sd[f"{key}.weight"])[:, :, 0, 0]  # (P·D, C)
    pd, c = w.shape
    d = pd // partitions
    out = {"kernel": w.reshape(partitions, d, c).transpose(0, 2, 1)}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"]).reshape(partitions, d)
    return out


def _tconv(sd, key):
    """(D, C, Γ, 1) → kernel (Γ, C, D), bias (D,)."""
    w = _np(sd[f"{key}.weight"])[:, :, :, 0]  # (D, C, Γ)
    return w.transpose(2, 1, 0), _np(sd[f"{key}.bias"])


def _norm(sd, key, kind, num_joints, per_joint_bn=False):
    """Reference norm → {'scale', 'bias'}.

    LayerNorm ``(C, 1, V)`` → (V, C); per-joint BatchNorm1d over V·C
    (V-major, batchnorm.py:13-23) → (V, C); plain BatchNorm2d (C,) → (C,).
    """
    if kind == "LayerNorm":
        w, b = _np(sd[f"{key}.weight"]), _np(sd[f"{key}.bias"])
        return {"scale": w[:, 0, :].T, "bias": b[:, 0, :].T}
    bnk = f"{key}.norm" if f"{key}.norm.weight" in sd else key
    w, b = _np(sd[f"{bnk}.weight"]), _np(sd[f"{bnk}.bias"])
    if per_joint_bn:
        return {"scale": w.reshape(num_joints, -1),
                "bias": b.reshape(num_joints, -1)}
    return {"scale": w, "bias": b}


def _norm_name(kind: str, idx: int) -> str:
    return f"{kind}_{idx}"


def _import_stgcn_family(sd: dict, model) -> dict:
    """Shared st-gcn / rt-st-gcn importer. ``model`` is the stgx module
    (provides normalization kind, layer plan, graph size)."""
    rt = model.__class__.__name__ == "RtStgcn"
    layer_key = "st_gcn" if rt else "gcn_networks"
    kind = model.normalization
    V = model.graph["num_node"]

    p = {
        "norm_in": _norm(sd, "norm_in", kind, V, per_joint_bn=True),
        "fcn_in": _conv1x1(sd, "fcn_in"),
        "fcn_out": _conv1x1(sd, "fcn_out"),
    }

    n_layers = len(model.in_ch)
    imp = []
    for i in range(n_layers):
        base = f"{layer_key}.{i}"
        conv_key = f"{base}.conv" if rt else f"{base}.gcn.conv"
        pd = _np(sd[f"{conv_key}.weight"]).shape[0]
        partitions = pd // model.out_ch[i]
        lp = {"GraphConv_0": _graph_conv(sd, conv_key, partitions)}

        res_conv = bool(model.residual[i]) and not (
            model.in_ch[i] == model.out_ch[i] and model.stride[i] == 1
        )
        idx = 0
        if res_conv:
            rw = _np(sd[f"{base}.residual.0.weight"])[:, :, 0, 0]
            lp["res_kernel"] = rw.T
            if f"{base}.residual.0.bias" in sd:  # st-gcn yes, rt-st-gcn no
                lp["res_bias"] = _np(sd[f"{base}.residual.0.bias"])
            lp[_norm_name(kind, idx)] = _norm(sd, f"{base}.residual.1",
                                              kind, V)
            idx += 1
        if rt:
            lp[_norm_name(kind, idx)] = _norm(sd, f"{base}.bn_relu.0",
                                              kind, V)
        else:
            lp[_norm_name(kind, idx)] = _norm(sd, f"{base}.tcn.0", kind, V)
            tw, tb = _tconv(sd, f"{base}.tcn.2")
            lp["tcn_kernel"], lp["tcn_bias"] = tw, tb
            lp[_norm_name(kind, idx + 1)] = _norm(sd, f"{base}.tcn.3",
                                                  kind, V)
        p[f"layers_{i}"] = lp

        imp_key = f"{base}.edge_importance" if rt else f"edge_importance.{i}"
        if imp_key in sd:
            imp.append(_np(sd[imp_key]))
    if imp:
        p["edge_importance"] = np.stack(imp)
    return {"params": p}


def _import_mstcn(sd: dict, model) -> dict:
    p = {}
    for s in range(model.stages):
        base = ("generator_stage" if s == 0
                else f"refinement_stages.{s - 1}")
        sp = {
            "Dense_0": _conv1x1(sd, f"{base}.conv_in"),
            "Dense_1": _conv1x1(sd, f"{base}.conv_out"),
        }
        for j in range(model.layers[s]):
            lb = f"{base}.layers.{j}.conv"
            cw, cb = _tconv(sd, f"{lb}.0")
            sp[f"DilatedResidualLayer_{j}"] = {
                "conv_kernel": cw,
                "conv_bias": cb,
                "Dense_0": _conv1x1(sd, f"{lb}.2"),
            }
        p[f"SingleStage_{s}"] = sp
    return {"params": p}


IMPORTERS = {
    "st-gcn": _import_stgcn_family,
    "rt-st-gcn": _import_stgcn_family,
    "ms-tcn": _import_mstcn,
}


def import_reference_state_dict(state_dict, model, name: str):
    """Convert a reference ``model_state_dict`` (or full checkpoint dict)
    into the stgx params pytree for ``model`` (an stgx module instance).

    Args:
        state_dict: torch state dict / checkpoint dict (tensors or arrays).
        model: the stgx model instance the params are for (must match the
            checkpoint's architecture config).
        name: reference registry key ('st-gcn' | 'rt-st-gcn' | 'ms-tcn').
    """
    if name not in IMPORTERS:
        raise ValueError(
            f"no importer for {name!r}; supported: {sorted(IMPORTERS)}"
        )
    return IMPORTERS[name](_unwrap(state_dict), model)
