"""Independent torch expression of the reference models' math, for parity tests.

These twins are written from the reference's *documented semantics* (SURVEY.md
§2.10-2.17) using torch primitives — they are the executable spec that stgx
models are asserted ``allclose`` against, with utilities to copy stgx (flax)
params into the torch twins. Torch layout: ``(N, C, L, V)``; stgx layout:
``(N, L, V, C)``.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def to_torch(x_nlvc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x_nlvc, (0, 3, 1, 2))))


def from_torch(x_nclv: torch.Tensor) -> np.ndarray:
    return x_nclv.detach().numpy().transpose(0, 2, 3, 1)


class RefLayerNorm(nn.Module):
    """LayerNorm over (C, V) dims with unbiased variance, affine (C,1,V)."""

    def __init__(self, channels, num_joints):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(channels, 1, num_joints))
        self.bias = nn.Parameter(torch.zeros(channels, 1, num_joints))
        self.eps = 1e-5

    def forward(self, x):  # (N, C, L, V)
        mean = x.mean(dim=(1, 3), keepdim=True)
        var = x.var(dim=(1, 3), keepdim=True)  # unbiased
        return self.weight * (x - mean) / torch.sqrt(var + self.eps) + self.bias


class RefInputBatchNorm(nn.Module):
    """BatchNorm over (V*C) channels with batch stats (no running stats)."""

    def __init__(self, channels, num_joints):
        super().__init__()
        self.norm = nn.BatchNorm1d(num_joints * channels, track_running_stats=False)

    def forward(self, x):  # (N, C, L, V)
        n, c, l, v = x.shape
        x = x.permute(0, 3, 1, 2).contiguous().view(n, v * c, l)
        x = self.norm(x)
        return x.view(n, v, c, l).permute(0, 2, 3, 1)


def make_ref_norm(kind, channels, num_joints, per_joint=False):
    if kind == "LayerNorm":
        return RefLayerNorm(channels, num_joints)
    if per_joint:
        return RefInputBatchNorm(channels, num_joints)
    return nn.BatchNorm2d(channels, track_running_stats=False)


class RefGraphConv(nn.Module):
    """1×1 conv to P*C_out channels, reshape, matmul with (P,V,V) A, sum."""

    def __init__(self, cin, cout, partitions):
        super().__init__()
        self.cout = cout
        self.partitions = partitions
        self.conv = nn.Conv2d(cin, cout * partitions, 1)

    def forward(self, x, A):  # x (N,C,L,V); A (P,V,V) or (N,P,V,V)
        n, _, l, v = x.shape
        x = self.conv(x)
        x = x.view(n, self.partitions, self.cout * l, v)
        x = torch.matmul(x, A)
        return x.sum(dim=1).view(n, self.cout, l, v)


class RefStgcnLayer(nn.Module):
    def __init__(self, cin, cout, gamma, partitions, num_joints, stride=1,
                 residual=True, normalization="LayerNorm", dilation=1,
                 causal=False):
        super().__init__()
        self.residual_kind = (
            "none" if not residual
            else ("identity" if cin == cout and stride == 1 else "conv")
        )
        self.gcn = RefGraphConv(cin, cout, partitions)
        pad = "valid" if causal else ((gamma - 1) // 2 * dilation, 0)
        self.tcn = nn.Sequential(
            make_ref_norm(normalization, cout, num_joints),
            nn.ReLU(),
            nn.Conv2d(cout, cout, (gamma, 1), stride=(stride, 1),
                      padding=pad, dilation=(dilation, 1)),
            make_ref_norm(normalization, cout, num_joints),
        )
        if self.residual_kind == "conv":
            self.res = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=(stride, 1)),
                make_ref_norm(normalization, cout, num_joints),
            )

    def forward(self, x, A):
        if self.residual_kind == "none":
            res = 0.0
        elif self.residual_kind == "identity":
            res = x
        else:
            res = self.res(x)
        x = self.gcn(x, A)
        x = self.tcn(x)
        return F.relu(x + res)


class RefStgcn(nn.Module):
    """Window-classifier ST-GCN twin: (N, C, L, V) → (N, classes)."""

    def __init__(self, A, num_classes, in_feat, kernel, in_ch, out_ch, stride,
                 residual, normalization, importance=True):
        super().__init__()
        self.register_buffer("A", torch.from_numpy(A).float())
        num_joints = A.shape[1]
        self.norm_in = make_ref_norm(normalization, in_feat, num_joints, per_joint=True)
        self.fcn_in = nn.Conv2d(in_feat, in_ch[0], 1)
        self.layers = nn.ModuleList([
            RefStgcnLayer(in_ch[i], out_ch[i], kernel, A.shape[0], num_joints,
                          stride=stride[i], residual=bool(residual[i]),
                          normalization=normalization)
            for i in range(len(in_ch))
        ])
        self.importance = importance
        if importance:
            self.edge_importance = nn.ParameterList(
                [nn.Parameter(torch.ones(A.shape)) for _ in in_ch]
            )
        self.fcn_out = nn.Conv2d(out_ch[-1], num_classes, 1)

    def forward(self, x):
        x = self.norm_in(x)
        x = self.fcn_in(x)
        for i, layer in enumerate(self.layers):
            A = self.A * self.edge_importance[i] if self.importance else self.A
            x = layer(x, A)
        x = F.avg_pool2d(x, x.shape[2:])
        return self.fcn_out(x).squeeze(-1).squeeze(-1)


# -- param copying: stgx (flax) → torch twin ---------------------------------


def copy_norm(params, tmod, kind, per_joint=False):
    w, b = np.asarray(params["scale"]), np.asarray(params["bias"])
    with torch.no_grad():
        if kind == "LayerNorm":
            tmod.weight.copy_(torch.from_numpy(w.T[:, None, :]))  # (V,C)→(C,1,V)
            tmod.bias.copy_(torch.from_numpy(b.T[:, None, :]))
        elif per_joint:
            tmod.norm.weight.copy_(torch.from_numpy(w.reshape(-1)))  # (V,C)→(V*C)
            tmod.norm.bias.copy_(torch.from_numpy(b.reshape(-1)))
        else:
            tmod.weight.copy_(torch.from_numpy(w))
            tmod.bias.copy_(torch.from_numpy(b))


def copy_graph_conv(params, tmod):
    W = np.asarray(params["kernel"])  # (P, Cin, Cout)
    b = np.asarray(params["bias"])  # (P, Cout)
    p, cin, cout = W.shape
    with torch.no_grad():
        # torch conv weight (P*Cout, Cin, 1, 1), block p occupies rows p*Cout+d
        tmod.conv.weight.copy_(
            torch.from_numpy(W.transpose(0, 2, 1).reshape(p * cout, cin, 1, 1))
        )
        tmod.conv.bias.copy_(torch.from_numpy(b.reshape(-1)))


def copy_dense_as_conv1x1(params, tconv):
    W = np.asarray(params["kernel"])  # (Cin, Cout)
    b = np.asarray(params["bias"])
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(W.T[:, :, None, None]))
        tconv.bias.copy_(torch.from_numpy(b))


def copy_tcn_conv(wp, bp, tconv):
    W = np.asarray(wp)  # (Γ, Cin, Cout)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(W.transpose(2, 1, 0)[:, :, :, None]))
        tconv.bias.copy_(torch.from_numpy(np.asarray(bp)))


def copy_stgcn_layer(lp, tlayer, kind):
    copy_graph_conv(lp["GraphConv_0"], tlayer.gcn)
    norms = [k for k in lp if k.startswith(("LayerNorm", "BatchNorm"))]
    # flax name order within StgcnLayer.__call__: residual norm first (if
    # conv-residual), then post-gcn norm, then post-tcn norm
    idx = 0
    if tlayer.residual_kind == "conv":
        with torch.no_grad():
            tlayer.res[0].weight.copy_(
                torch.from_numpy(np.asarray(lp["res_kernel"]).T[:, :, None, None])
            )
            tlayer.res[0].bias.copy_(torch.from_numpy(np.asarray(lp["res_bias"])))
        copy_norm(lp[norms[idx]], tlayer.res[1], kind)
        idx += 1
    copy_norm(lp[norms[idx]], tlayer.tcn[0], kind)
    copy_norm(lp[norms[idx + 1]], tlayer.tcn[3], kind)
    copy_tcn_conv(lp["tcn_kernel"], lp["tcn_bias"], tlayer.tcn[2])


def copy_ref_stgcn_layer(lp, layer, kind):
    """Copy an stgx StgcnLayer param tree into the REFERENCE StgcnLayer
    (models/stgcn/stgcn.py:104-193 interface: .gcn.conv, .tcn[0..4],
    .residual, .is_residual_conv)."""
    copy_graph_conv(lp["GraphConv_0"], layer.gcn)
    norms = sorted(k for k in lp if k.startswith(("LayerNorm", "BatchNorm")))
    idx = 0
    if getattr(layer, "is_residual_conv", False):
        with torch.no_grad():
            layer.residual[0].weight.copy_(
                torch.from_numpy(
                    np.asarray(lp["res_kernel"]).T[:, :, None, None].copy()
                )
            )
            layer.residual[0].bias.copy_(
                torch.from_numpy(np.asarray(lp["res_bias"]).copy())
            )
        copy_norm(lp[norms[idx]], layer.residual[1], kind)
        idx += 1
    copy_norm(lp[norms[idx]], layer.tcn[0], kind)
    copy_norm(lp[norms[idx + 1]], layer.tcn[3], kind)
    copy_tcn_conv(lp["tcn_kernel"], lp["tcn_bias"], layer.tcn[2])


def copy_stgcn(params, tmodel, kind):
    p = params["params"]
    copy_norm(
        p["norm_in"], tmodel.norm_in, kind,
        per_joint=kind == "BatchNorm",
    )
    copy_dense_as_conv1x1(p["fcn_in"], tmodel.fcn_in)
    for i, tlayer in enumerate(tmodel.layers):
        copy_stgcn_layer(p[f"layers_{i}"], tlayer, kind)
    if tmodel.importance:
        ei = np.asarray(p["edge_importance"])
        with torch.no_grad():
            for i in range(ei.shape[0]):
                tmodel.edge_importance[i].copy_(torch.from_numpy(ei[i]))
    copy_dense_as_conv1x1(p["fcn_out"], tmodel.fcn_out)
