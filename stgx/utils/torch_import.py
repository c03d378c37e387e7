"""Import reference PyTorch checkpoints into stgx parameter trees.

The reference trains with torch and saves ``{epoch, model_state_dict,
optimizer_state_dict, loss}`` checkpoints (/root/reference/processor.py:
325-343). This module converts those ``model_state_dict``s into stgx params
so trained reference models migrate without retraining (see MIGRATION.md).
Supported families: ``st-gcn`` (reference models/stgcn/stgcn.py:30-101),
``rt-st-gcn`` (models/rtstgcn/rtstgcn.py:84-157 — weights import into the
stgx batch form, whose streaming cell shares the same parameters, so the
imported checkpoint streams directly), ``co-st-gcn`` (same naming scheme,
models/costgcn/costgcn.py:47-84), ``ms-tcn`` (models/mstcn/mstcn.py:10-45),
``ms-gcn`` (two-part checkpoint, processor.py:333-342), and ``aa-gcn``
(models/aagcn/aagcn.py:28-95). That is every registered reference family;
shift-gcn/++ ship disabled upstream so no reference checkpoints exist.

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

__all__ = [
    "import_reference_state_dict",
    "export_reference_state_dict",
    "load_reference_checkpoint",
    "import_reference_optimizer",
    "IMPORTERS",
    "EXPORTERS",
]


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


def _import_layer(sd, base, kind, V, out_ch, res_conv, rt=False):
    """One StgcnLayer/OfflineLayer parameter subtree at prefix ``base``."""
    conv_key = f"{base}.conv" if rt else f"{base}.gcn.conv"
    pd = _np(sd[f"{conv_key}.weight"]).shape[0]
    lp = {"GraphConv_0": _graph_conv(sd, conv_key, pd // out_ch)}
    idx = 0
    if res_conv:
        rw = _np(sd[f"{base}.residual.0.weight"])[:, :, 0, 0]
        lp["res_kernel"] = rw.T
        if f"{base}.residual.0.bias" in sd:  # st-gcn yes, rt-st-gcn no
            lp["res_bias"] = _np(sd[f"{base}.residual.0.bias"])
        lp[_norm_name(kind, idx)] = _norm(sd, f"{base}.residual.1", kind, V)
        idx += 1
    if rt:
        lp[_norm_name(kind, idx)] = _norm(sd, f"{base}.bn_relu.0", kind, V)
    else:
        lp[_norm_name(kind, idx)] = _norm(sd, f"{base}.tcn.0", kind, V)
        tw, tb = _tconv(sd, f"{base}.tcn.2")
        lp["tcn_kernel"], lp["tcn_bias"] = tw, tb
        lp[_norm_name(kind, idx + 1)] = _norm(sd, f"{base}.tcn.3", kind, V)
    return lp


def _is_res_conv(model, i):
    stride = getattr(model, "stride", None)  # co-st-gcn has dilation instead
    return bool(model.residual[i]) and not (
        model.in_ch[i] == model.out_ch[i]
        and (stride is None or stride[i] == 1)
    )


def _import_stgcn_body(sd, model, prefix=""):
    """The shared st-gcn body (norm_in / fcn_in / layers / fcn_out /
    edge importance) at an optional key prefix inside ``sd``."""
    rt = model.__class__.__name__ == "RtStgcn"
    layer_key = "st_gcn" if rt else "gcn_networks"
    kind = model.normalization
    V = model.graph["num_node"]

    p = {  # co-st-gcn shares the full st-gcn naming (costgcn.py:47-84)
        "norm_in": _norm(sd, f"{prefix}norm_in", kind, V, per_joint_bn=True),
        "fcn_in": _conv1x1(sd, f"{prefix}fcn_in"),
        "fcn_out": _conv1x1(sd, f"{prefix}fcn_out"),
    }
    imp = []
    for i in range(len(model.in_ch)):
        base = f"{prefix}{layer_key}.{i}"
        p[f"layers_{i}"] = _import_layer(
            sd, base, kind, V, model.out_ch[i], _is_res_conv(model, i), rt
        )
        imp_key = (f"{base}.edge_importance" if rt
                   else f"{prefix}edge_importance.{i}")
        if imp_key in sd:
            imp.append(_np(sd[imp_key]))
    if imp:
        p["edge_importance"] = np.stack(imp)
    return p


def _import_stgcn_family(sd: dict, model) -> dict:
    """st-gcn / rt-st-gcn importer. ``model`` is the stgx module (provides
    normalization kind, layer plan, graph size)."""
    return {"params": _import_stgcn_body(sd, model)}


def _import_single_stage(sd, base, num_layers):
    sp = {
        "Dense_0": _conv1x1(sd, f"{base}.conv_in"),
        "Dense_1": _conv1x1(sd, f"{base}.conv_out"),
    }
    for j in range(num_layers):
        lb = f"{base}.layers.{j}.conv"
        cw, cb = _tconv(sd, f"{lb}.0")
        sp[f"DilatedResidualLayer_{j}"] = {
            "conv_kernel": cw,
            "conv_bias": cb,
            "Dense_0": _conv1x1(sd, f"{lb}.2"),
        }
    return sp


def _import_mstcn(sd: dict, model) -> dict:
    p = {}
    for s in range(model.stages):
        base = ("generator_stage" if s == 0
                else f"refinement_stages.{s - 1}")
        p[f"SingleStage_{s}"] = _import_single_stage(sd, base,
                                                     model.layers[s])
    return {"params": p}


def _import_msgcn(sd: dict, model) -> dict:
    """MS-GCN's two-part checkpoint: ``model_state_dict`` holds separate
    ``generator_stage`` (an st-gcn dict, possibly DP-wrapped) and
    ``refinement_stages`` dicts (reference processor.py:333-342)."""
    if "generator_stage" in sd:  # the checkpoint's two-part dict form
        gen_sd = _unwrap(dict(sd["generator_stage"]))
        ref_sd = {f"refinement_stages.{k}": v
                  for k, v in dict(sd["refinement_stages"]).items()}
    else:  # flat single-dict form (whole-model state_dict)
        gen_sd = {k[len("generator_stage."):]: v for k, v in sd.items()
                  if k.startswith("generator_stage.")}
        ref_sd = {k: v for k, v in sd.items()
                  if k.startswith("refinement_stages.")}

    p = {"Stgcn_0": _import_stgcn_body(gen_sd, model)}
    for s in range(model.stages):
        p[f"SingleStage_{s}"] = _import_single_stage(
            ref_sd, f"refinement_stages.{s}", model.layers[s]
        )
    return {"params": p}


def _import_aagcn(sd: dict, model) -> dict:
    """AA-GCN two-stream importer. The reference has no edge-importance
    masks (aagcn.py:28-50); stgx's default to ones, which is the identity
    mask, so imported checkpoints are forward-identical."""
    kind = model.normalization
    V = model.graph["num_node"]
    n_layers = len(model.in_ch)
    p = {}
    for s, stream in enumerate(("joint_stream", "bone_stream")):
        sp = {
            _norm_name(kind, 0): _norm(sd, f"streams.{s}.norm_in", kind, V,
                                       per_joint_bn=True),
            "Dense_0": _conv1x1(sd, f"streams.{s}.fcn_in"),
            "Dense_1": _conv1x1(sd, f"streams.{s}.fcn_out"),
            "edge_importance": np.ones(
                (n_layers,) + _np(sd[f"streams.{s}.gcn_networks.0.B"]).shape,
                np.float32,
            ),
        }
        for i in range(n_layers):
            base = f"streams.{s}.gcn_networks.{i}"
            sp[f"AgcnLayer_{i}"] = {
                "B": _np(sd[f"{base}.B"]),
                "theta_kernel": _conv1x1(sd, f"{base}.theta")["kernel"],
                "theta_bias": _np(sd[f"{base}.theta.bias"]),
                "phi_kernel": _conv1x1(sd, f"{base}.phi")["kernel"],
                "phi_bias": _np(sd[f"{base}.phi.bias"]),
                "StgcnLayer_0": _import_layer(
                    sd, f"{base}.st_gcn", kind, V, model.out_ch[i],
                    _is_res_conv(model, i), rt=False,
                ),
            }
        p[stream] = sp
    return {"params": p}


IMPORTERS = {
    "st-gcn": _import_stgcn_family,
    "rt-st-gcn": _import_stgcn_family,
    "co-st-gcn": _import_stgcn_family,
    "ms-tcn": _import_mstcn,
    "ms-gcn": _import_msgcn,
    "aa-gcn": _import_aagcn,
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


def load_reference_checkpoint(path: str, model, name: str):
    """Load a reference ``.pt`` file and convert it (see
    :func:`import_reference_state_dict`). Uses ``weights_only=True`` —
    reference checkpoints are plain tensor/scalar dicts, so the unpickler
    never needs to execute arbitrary code from the file."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return import_reference_state_dict(sd, model, name)


# -- reverse direction: stgx params → reference state dict --------------------


def _inv_conv1x1(dp):
    out = {"weight": _np(dp["kernel"]).T[:, :, None, None]}
    if "bias" in dp:
        out["bias"] = _np(dp["bias"])
    return out


def _inv_graph_conv(gp):
    k = _np(gp["kernel"])  # (P, C, D)
    p_, c, d = k.shape
    out = {"weight": k.transpose(0, 2, 1).reshape(p_ * d, c)[:, :, None, None]}
    if "bias" in gp:
        out["bias"] = _np(gp["bias"]).reshape(-1)
    return out


def _inv_tconv(kernel, bias):
    w = _np(kernel).transpose(2, 1, 0)[:, :, :, None]  # (D, C, Γ, 1)
    return {"weight": w, "bias": _np(bias)}


def _inv_norm(npz, kind, per_joint_bn=False):
    w, b = _np(npz["scale"]), _np(npz["bias"])
    if kind == "LayerNorm":
        return {"weight": w.T[:, None, :], "bias": b.T[:, None, :]}
    if per_joint_bn:
        return {"norm.weight": w.reshape(-1), "norm.bias": b.reshape(-1)}
    return {"weight": w, "bias": b}


def _emit(sd, base, tensors):
    for k, v in tensors.items():
        sd[f"{base}.{k}"] = v


def _export_layer(sd, base, lp, kind, res_conv, rt=False):
    _emit(sd, f"{base}.conv" if rt else f"{base}.gcn.conv",
          _inv_graph_conv(lp["GraphConv_0"]))
    idx = 0
    if res_conv:
        sd[f"{base}.residual.0.weight"] = (
            _np(lp["res_kernel"]).T[:, :, None, None]
        )
        if "res_bias" in lp:
            sd[f"{base}.residual.0.bias"] = _np(lp["res_bias"])
        _emit(sd, f"{base}.residual.1",
              _inv_norm(lp[_norm_name(kind, idx)], kind))
        idx += 1
    if rt:
        _emit(sd, f"{base}.bn_relu.0",
              _inv_norm(lp[_norm_name(kind, idx)], kind))
    else:
        _emit(sd, f"{base}.tcn.0", _inv_norm(lp[_norm_name(kind, idx)], kind))
        _emit(sd, f"{base}.tcn.2",
              _inv_tconv(lp["tcn_kernel"], lp["tcn_bias"]))
        _emit(sd, f"{base}.tcn.3",
              _inv_norm(lp[_norm_name(kind, idx + 1)], kind))


def _graph_A(model) -> np.ndarray:
    from stgx.graph import Graph

    return np.asarray(Graph(strategy=model.strategy, **model.graph).A,
                      dtype=np.float32)


def _export_stgcn_body(p, model, sd, prefix=""):
    rt = model.__class__.__name__ == "RtStgcn"
    layer_key = "st_gcn" if rt else "gcn_networks"
    kind = model.normalization
    _emit(sd, f"{prefix}norm_in",
          _inv_norm(p["norm_in"], kind, per_joint_bn=True))
    _emit(sd, f"{prefix}fcn_in", _inv_conv1x1(p["fcn_in"]))
    _emit(sd, f"{prefix}fcn_out", _inv_conv1x1(p["fcn_out"]))
    for i in range(len(model.in_ch)):
        base = f"{prefix}{layer_key}.{i}"
        _export_layer(sd, base, p[f"layers_{i}"], kind,
                      _is_res_conv(model, i), rt)
        if "edge_importance" in p:
            key = (f"{base}.edge_importance" if rt
                   else f"{prefix}edge_importance.{i}")
            sd[key] = _np(p["edge_importance"][i])
    sd[f"{prefix}A"] = _graph_A(model)
    return sd


def _export_stgcn_family(params, model):
    return _export_stgcn_body(params["params"], model, {})


def _export_single_stage(sd, base, sp, num_layers):
    _emit(sd, f"{base}.conv_in", _inv_conv1x1(sp["Dense_0"]))
    _emit(sd, f"{base}.conv_out", _inv_conv1x1(sp["Dense_1"]))
    for j in range(num_layers):
        lp = sp[f"DilatedResidualLayer_{j}"]
        _emit(sd, f"{base}.layers.{j}.conv.0",
              _inv_tconv(lp["conv_kernel"], lp["conv_bias"]))
        _emit(sd, f"{base}.layers.{j}.conv.2", _inv_conv1x1(lp["Dense_0"]))


def _export_mstcn(params, model):
    sd = {}
    p = params["params"]
    for s in range(model.stages):
        base = ("generator_stage" if s == 0
                else f"refinement_stages.{s - 1}")
        _export_single_stage(sd, base, p[f"SingleStage_{s}"], model.layers[s])
    return sd


def _export_msgcn(params, model):
    """Two-part dict matching the reference saver (processor.py:333-342)."""
    p = params["params"]
    gen = _export_stgcn_body(p["Stgcn_0"], model, {})
    ref = {}
    for s in range(model.stages):
        _export_single_stage(ref, str(s), p[f"SingleStage_{s}"],
                             model.layers[s])
    return {"generator_stage": gen, "refinement_stages": ref}


def _export_aagcn(params, model):
    """aa-gcn export. stgx's edge-importance mask has no reference
    counterpart, but the layer adjacency is ``A·imp + B + C`` vs the
    reference's ``A + B + C`` (stgx/models/aagcn.py:48,162), so the mask
    folds losslessly into the exported free matrix:
    ``B' = B + A·(imp − 1)``."""
    p = params["params"]
    kind = model.normalization
    A = _graph_A(model)
    sd = {}
    for s, stream in enumerate(("joint_stream", "bone_stream")):
        sp = p[stream]
        imp = (_np(sp["edge_importance"]) if "edge_importance" in sp
               else None)
        _emit(sd, f"streams.{s}.norm_in",
              _inv_norm(sp[_norm_name(kind, 0)], kind, per_joint_bn=True))
        _emit(sd, f"streams.{s}.fcn_in", _inv_conv1x1(sp["Dense_0"]))
        _emit(sd, f"streams.{s}.fcn_out", _inv_conv1x1(sp["Dense_1"]))
        for i in range(len(model.in_ch)):
            base = f"streams.{s}.gcn_networks.{i}"
            lp = sp[f"AgcnLayer_{i}"]
            B = _np(lp["B"])
            if imp is not None:
                B = B + A * (imp[i] - 1.0)
            sd[f"{base}.B"] = B
            _emit(sd, f"{base}.theta", _inv_conv1x1(
                {"kernel": lp["theta_kernel"], "bias": lp["theta_bias"]}))
            _emit(sd, f"{base}.phi", _inv_conv1x1(
                {"kernel": lp["phi_kernel"], "bias": lp["phi_bias"]}))
            _export_layer(sd, f"{base}.st_gcn", lp["StgcnLayer_0"], kind,
                          _is_res_conv(model, i), rt=False)
    sd["A"] = A
    return sd


EXPORTERS = {
    "st-gcn": _export_stgcn_family,
    "rt-st-gcn": _export_stgcn_family,
    "co-st-gcn": _export_stgcn_family,
    "ms-tcn": _export_mstcn,
    "ms-gcn": _export_msgcn,
    "aa-gcn": _export_aagcn,
}


def export_reference_state_dict(params, model, name: str) -> dict:
    """Convert stgx params back into the reference's state-dict naming
    (numpy arrays; wrap values in ``torch.tensor`` / save with
    ``torch.save`` to hand a TPU-trained model to the reference code).
    Includes the ``A`` adjacency buffer so ``load_state_dict(strict=True)``
    passes on the reference models that register it."""
    if name not in EXPORTERS:
        raise ValueError(
            f"no exporter for {name!r}; supported: {sorted(EXPORTERS)}"
        )
    return EXPORTERS[name](params, model)


# -- optimizer state ----------------------------------------------------------


def import_reference_optimizer(checkpoint: dict, model, name: str):
    """Convert the reference checkpoint's Adam state into stgx moment trees.

    The reference optimizes ``Adam(self.model.parameters())``
    (processor.py:579) and saves ``optimizer_state_dict`` whose integer keys
    index ``named_parameters()`` order — which equals the model state dict's
    key order with buffers removed (the only buffer in these families is the
    top-level ``A`` adjacency). Each moment tensor has its parameter's shape,
    so the weight layout transforms apply verbatim.

    Returns ``(mu, nu, count)``: two pytrees shaped like the stgx params and
    the (minimum) Adam step count. For ``ms-gcn`` the flat order is
    reconstructed from the two-part dict (generator params first, then
    refinement — the registration order of MsGcn.parameters(),
    msgcn.py:21-23). Caveat: stgx-only params (aa-gcn edge importance) get
    zero moments but share the imported global step count, so their first
    few resumed updates skip Adam's bias-correction warmup (bounded by
    ~(1-β1)/√(1-β2) · lr).
    """
    msd = (checkpoint["model_state_dict"]
           if "model_state_dict" in checkpoint else checkpoint)
    osd = checkpoint["optimizer_state_dict"]
    if name == "ms-gcn":
        gen = _unwrap(dict(msd["generator_stage"]))
        param_keys = [f"generator_stage/{k}" for k in gen if k != "A"] + [
            f"refinement_stages/{k}" for k in msd["refinement_stages"]
        ]

        def rebuild(fake_flat):
            two = {"generator_stage": {}, "refinement_stages": {}}
            for k, v in fake_flat.items():
                part, sub = k.split("/", 1)
                two[part][sub] = v
            return two
    else:
        msd = _unwrap(msd)
        param_keys = [k for k in msd if k != "A"]
        rebuild = None
    state = osd["state"]
    order = osd["param_groups"][0]["params"]
    if len(order) != len(param_keys):
        raise ValueError(
            f"optimizer has {len(order)} params but the model dict has "
            f"{len(param_keys)} non-buffer tensors — architectures differ"
        )

    def moment_tree(field):
        fake_sd = {
            k: state[idx][field] for k, idx in zip(param_keys, order)
        }
        if rebuild is not None:
            fake_sd = rebuild(fake_sd)
        tree = IMPORTERS[name](fake_sd, model)
        if name == "aa-gcn":
            # stgx-only param (no reference counterpart): moments start at 0
            for stream in ("joint_stream", "bone_stream"):
                imp = tree["params"][stream]["edge_importance"]
                tree["params"][stream]["edge_importance"] = np.zeros_like(imp)
        return tree

    mu = moment_tree("exp_avg")
    nu = moment_tree("exp_avg_sq")
    count = int(min(float(_np(state[i]["step"])) for i in order))
    return mu, nu, count
