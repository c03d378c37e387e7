"""RT-ST-GCN: FIFO streaming ≡ batch equivalence + torch-twin parity.

Generalizes the reference's integer-exact FIFO≡batch proof
(models/rtstgcn/test_rtstgcn.py:52-92) to the full multi-layer network, and
pins the batch form against a torch twin of the *intended* OfflineLayer
(the committed reference layer is broken — SURVEY.md §5.9)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from stgx.graph import Graph, load_skeleton
from stgx.models.rtstgcn import RtStgcn, init_stream_state, stream_sequence

from torch_ref import (
    RefGraphConv,
    copy_dense_as_conv1x1,
    copy_graph_conv,
    copy_norm,
    make_ref_norm,
    to_torch,
)

SKEL = load_skeleton("imu_fogit_ABCD")
CFG = dict(
    num_classes=5,
    in_feat=6,
    graph=SKEL,
    kernel=3,
    in_ch=(8, 8, 16),
    out_ch=(8, 16, 16),
    stride=(1, 1, 2),
    residual=(0, 1, 1),
    dropout=(0.0, 0.0, 0.0),
    importance=True,
)


def _make(normalization):
    model = RtStgcn(normalization=normalization, **CFG)
    x = np.random.default_rng(3).normal(size=(2, 30, 7, 6)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(7), jnp.asarray(x))
    # non-trivial edge importance
    ei = params["params"]["edge_importance"]
    params["params"]["edge_importance"] = ei + 0.05 * jnp.cos(
        jnp.arange(ei.size, dtype=jnp.float32).reshape(ei.shape)
    )
    return model, params, x


def test_streaming_equals_batch_layernorm():
    model, params, x = _make("LayerNorm")
    y_batch = model.apply(params, jnp.asarray(x))
    y_stream, _ = stream_sequence(model, params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(y_stream), np.asarray(y_batch), atol=1e-4, rtol=1e-4
    )


def test_streaming_state_carries_across_chunks():
    # feeding a capture in two chunks with carried state == one shot
    model, params, x = _make("LayerNorm")
    y_full, _ = stream_sequence(model, params, jnp.asarray(x))
    state = init_stream_state(model, params, batch=2)
    y1, state = stream_sequence(model, params, jnp.asarray(x[:, :13]), state)
    y2, _ = stream_sequence(model, params, jnp.asarray(x[:, 13:]), state)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1),
        np.asarray(y_full),
        atol=1e-4,
        rtol=1e-4,
    )


class TorchRtLayer(nn.Module):
    """Torch twin of the intended OfflineLayer (causal uniform accumulation)."""

    def __init__(self, cin, cout, gamma, partitions, num_joints, stride,
                 residual, normalization):
        super().__init__()
        self.gamma, self.stride = gamma, stride
        self.residual = residual
        self.identity = cin == cout and stride == 1
        self.gcn = RefGraphConv(cin, cout, partitions)
        self.norm = make_ref_norm(normalization, cout, num_joints)
        if residual and not self.identity:
            self.res = nn.Sequential(
                nn.Conv2d(cin, cout, 1, bias=False),
                make_ref_norm(normalization, cout, num_joints),
            )

    def forward(self, x, A):
        if not self.residual:
            res = 0.0
        elif self.identity:
            res = x
        else:
            res = self.res(x)
        x = self.gcn(x, A)
        # causal accumulation: y[t] = sum_{i<gamma//stride} x[t - i*stride]
        k = self.gamma // self.stride
        acc = x.clone()
        for i in range(1, k):
            acc[:, :, i * self.stride:] += x[:, :, : x.shape[2] - i * self.stride]
        x = F.relu(self.norm(acc))
        x = x + res
        if self.residual:
            x = F.relu(x)
        return x


class TorchRtStgcn(nn.Module):
    def __init__(self, A, normalization):
        super().__init__()
        num_joints = A.shape[1]
        self.register_buffer("A", torch.from_numpy(A).float())
        self.norm_in = make_ref_norm(normalization, CFG["in_feat"], num_joints,
                                     per_joint=True)
        self.fcn_in = nn.Conv2d(CFG["in_feat"], CFG["in_ch"][0], 1)
        self.layers = nn.ModuleList([
            TorchRtLayer(CFG["in_ch"][i], CFG["out_ch"][i], CFG["kernel"],
                         A.shape[0], num_joints, CFG["stride"][i],
                         bool(CFG["residual"][i]), normalization)
            for i in range(3)
        ])
        self.edge_importance = nn.ParameterList(
            [nn.Parameter(torch.ones(A.shape)) for _ in range(3)]
        )
        self.fcn_out = nn.Conv2d(CFG["out_ch"][-1], CFG["num_classes"], 1)

    def forward(self, x):
        x = self.norm_in(x)
        x = self.fcn_in(x)
        for layer, ei in zip(self.layers, self.edge_importance):
            x = layer(x, self.A * ei)
        x = x.mean(dim=3, keepdim=True)  # pool joints: (N, C, L, 1)
        return self.fcn_out(x).squeeze(-1)  # (N, classes, L)


def _copy_rt(params, tmodel, kind):
    p = params["params"]
    copy_norm(p["norm_in"], tmodel.norm_in, kind, per_joint=kind == "BatchNorm")
    copy_dense_as_conv1x1(p["fcn_in"], tmodel.fcn_in)
    for i, tl in enumerate(tmodel.layers):
        lp = p[f"layers_{i}"]
        copy_graph_conv(lp["GraphConv_0"], tl.gcn)
        norms = sorted(k for k in lp if k.startswith(("LayerNorm", "BatchNorm")))
        idx = 0
        if tl.residual and not tl.identity:
            with torch.no_grad():
                tl.res[0].weight.copy_(
                    torch.from_numpy(
                        np.asarray(lp["res_kernel"]).T[:, :, None, None]
                    )
                )
            copy_norm(lp[norms[idx]], tl.res[1], kind)
            idx += 1
        copy_norm(lp[norms[idx]], tl.norm, kind)
        ei = np.asarray(p["edge_importance"])
        with torch.no_grad():
            tmodel.edge_importance[i].copy_(torch.from_numpy(ei[i]))
    copy_dense_as_conv1x1(p["fcn_out"], tmodel.fcn_out)


def test_batch_form_matches_torch_twin():
    for kind in ("LayerNorm", "BatchNorm"):
        model, params, x = _make(kind)
        y = np.asarray(model.apply(params, jnp.asarray(x)))  # (N, L, classes)
        A = Graph(strategy="spatial", **SKEL).A.astype(np.float32)
        tw = TorchRtStgcn(A, kind).eval()
        _copy_rt(params, tw, kind)
        with torch.no_grad():
            yt = tw(to_torch(x)).numpy().transpose(0, 2, 1)  # → (N, L, classes)
        np.testing.assert_allclose(y, yt, atol=2e-4, rtol=1e-4)


def test_acc_step_fifo_sum_matches_taps():
    """The one-reduction streaming accumulator form ("fifo_sum",
    stgx/ops/temporal.py) must equal the static-tap-slices default up to
    fp add order, for stride 1 and the phase-masked stride-2 form."""
    import numpy as np

    from stgx.ops.temporal import (
        causal_accumulate_step,
        init_accumulator_state,
        set_acc_step_impl,
    )

    rng = np.random.default_rng(11)
    for kernel, stride in [(9, 1), (9, 2), (69, 1), (69, 2), (3, 3)]:
        xs = jnp.asarray(rng.normal(size=(40, 2, 7, 8)).astype(np.float32))

        def run():
            state = init_accumulator_state(2, 7, 8, kernel, stride)
            ys = []
            for t in range(xs.shape[0]):
                y, state = causal_accumulate_step(state, xs[t], kernel, stride)
                ys.append(np.asarray(y))
            return np.stack(ys)

        try:
            set_acc_step_impl("taps")
            want = run()
            set_acc_step_impl("fifo_sum")
            got = run()
        finally:
            set_acc_step_impl("taps")
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"kernel={kernel} stride={stride}")
