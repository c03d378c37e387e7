"""Train-loop golden vs the ACTUAL reference ST-GCN: identical weights, the
same tiny dataset, matched Adam — per-trial losses and post-epoch weights
must agree.

The torch side is a manual loop mirroring the reference's
``Processor._train`` (/root/reference/processor.py:500-566): per-trial
window forward (WindowSegment semantics, utils/segment_generator.py:108-155
— pad start by W-1, stride-1 unfold, one subsegment when ``segment`` ≥ L),
reference ``Loss`` (CE weighted-mean + 0.15·clamped smoothing MSE,
utils/loss.py:6-42), ragged grad-accumulation divisors
(processor.py:532-543), ``optimizer.step()`` every ``batch_size`` trials
(processor.py:557-566). The reference's own ``WindowSegment.mask_segment``
is bitrotted as committed (5-arg signature vs the 6-arg call at
processor.py:383), so the documented intent — arrange the window outputs
back into a (1, C, L) series — is applied directly.

This pins the one numerics surface round 1 left twin-tested only: stgx
``Trainer.train_epoch`` grad-accum divisors, loss reductions, and Adam
semantics end-to-end against the reference implementation.
"""

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
import torch.nn.functional as F

from stgx.graph import load_skeleton
from stgx.models import MODELS
from stgx.parallel.loop import OptimizerConfig, Trainer
from stgx.utils.loss import Loss

import torch_ref as tr
from torch_ref import to_torch

SKEL = load_skeleton("imu_fogit_ABCD")
W = 12  # receptive field / window length
NCLS = 5


def _ref_arch_kwargs(normalization):
    return {
        "strategy": "spatial",
        "in_feat": 6,
        "num_classes": NCLS,
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


def _copy_into_ref(params, ref, normalization):
    """stgx ST-GCN params → reference model modules (same mapping as
    tests/test_golden_reference.py)."""
    p = params["params"]
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
                torch.from_numpy(np.asarray(p["edge_importance"][i]).copy())
            )
    tr.copy_dense_as_conv1x1(p["fcn_out"], ref.fcn_out)


class _ListDataset:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _make_trials(rng, n, lens):
    items = []
    for i in range(n):
        L = lens[i]
        x = rng.normal(size=(L, 7, 6)).astype(np.float32)
        y = rng.integers(0, NCLS, size=(L,)).astype(np.int64)
        items.append((x, y))
    return items


def _ref_train_epoch(ref, ref_loss, trials, batch_size, lr):
    """Manual mirror of Processor._train (processor.py:500-566) for the
    'original' window model, one epoch. Returns (per-trial ce list, mse
    list)."""
    opt = torch.optim.Adam(ref.parameters(), lr=lr)
    n = len(trials)
    ragged = n % batch_size
    ce_list, mse_list = [], []
    c1 = c5 = tot = 0
    opt.zero_grad()
    for i, (x, y) in enumerate(trials):
        # (L, V, C) -> reference layout (1, C, L, V)
        cap = torch.from_numpy(np.transpose(x, (2, 0, 1))[None].copy())
        lab = torch.from_numpy(y[None].copy())
        # WindowSegment.pad_sequence: left-pad time by W-1 (empty buffer)
        cap = F.pad(cap, (0, 0, W - 1, 0))
        L = x.shape[0]
        # stride-1 unfold into L windows: (L, C, W, V)
        wins = (
            cap.unfold(2, W, 1).permute(0, 2, 1, 4, 3).contiguous()
            .view(L, 6, W, 7)
        )
        out = ref(wins)  # (L, classes, 1)
        # mask_segment intent: windows back into a (1, classes, L) series
        preds = out.permute(2, 1, 0)
        ce, mse = ref_loss(0, preds, lab)
        ce_list.append(float(ce.detach()))
        mse_list.append(float(mse.detach()))
        # train-time top-k from the same forward, like the reference's
        # Statistics strategy (utils/statistics.py:4-21 via processor.py:389)
        with torch.no_grad():
            top5 = preds.detach().topk(5, dim=1).indices  # (1, 5, L)
            c1 += int((top5[:, 0] == lab).sum())
            c5 += int((top5 == lab[:, None]).any(dim=1).sum())
            tot += lab.numel()
        divisor = float(
            batch_size if (ragged == 0 or i < n - ragged) else ragged
        )
        ((ce + mse) / divisor).backward()
        if (i + 1) % batch_size == 0 or (i + 1) == n:
            opt.step()
            opt.zero_grad()
    return ce_list, mse_list, (c1, c5, tot)


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
@pytest.mark.parametrize("normalization", ["LayerNorm", "BatchNorm"])
def test_train_epoch_golden_vs_reference(normalization):
    from models.stgcn.stgcn import Model as RefModel
    from utils.loss import Loss as RefLoss

    rng = np.random.default_rng(11)
    trials = _make_trials(rng, n=5, lens=[20, 26, 17, 24, 21])
    dataset = _ListDataset(trials)
    dist = np.zeros(NCLS, np.float32)
    for _, y in trials:
        dist += np.bincount(y, minlength=NCLS)
    lr, bs = 2e-3, 2

    cfg = dict(
        num_classes=NCLS, in_feat=6, graph=SKEL, kernel=3,
        in_ch=(8, 8, 16), out_ch=(8, 16, 16), stride=(1, 2, 1),
        residual=(0, 1, 1), dropout=(0.0, 0.0, 0.0), importance=True,
        normalization=normalization,
    )
    model = MODELS["st-gcn"](**cfg)
    trainer = Trainer(
        model=model, kind="window", loss=Loss(dist),
        opt=OptimizerConfig(learning_rate=lr, batch_size=bs, epochs=1),
        receptive_field=W, bucket=32,
    )
    params, opt_state = trainer.init(np.zeros((4, W, 7, 6), np.float32))

    # same weights into the reference model
    ref = RefModel(**_ref_arch_kwargs(normalization)).train()
    _copy_into_ref(params, ref, normalization)
    ref_loss = RefLoss(
        torch.device("cpu"), torch.from_numpy(dist.copy()), "logits"
    )

    # capture stgx per-trial losses from the train log
    lines = []
    params, opt_state, st = trainer.train_epoch(
        params, opt_state, dataset, 0, log=lines.append
    )
    stgx_trial_loss = [float(s.split("=")[-1]) for s in lines if "trial" in s]

    ce_list, mse_list, (rc1, rc5, rtot) = _ref_train_epoch(
        ref, ref_loss, trials, bs, lr
    )
    # train top-k from the training forwards matches (counts may differ by
    # an argmax tie-flip or two as the frameworks' weights drift within
    # tolerance over the epoch)
    total = sum(len(y) for _, y in trials)
    assert rtot == total
    assert abs(st["top1"] * total - rc1) <= 2
    assert abs(st["top5"] * total - rc5) <= 2

    # per-trial losses match the reference's printed per-trial values
    # (processor.py:546-550 prints loss/divisor; stgx logs ce+mse — compare
    # the undivided sums)
    np.testing.assert_allclose(
        stgx_trial_loss,
        np.asarray(ce_list) + np.asarray(mse_list),
        rtol=2e-3, atol=2e-4,
    )
    # epoch sums match (processor.py:528-530 accumulates undivided ce/mse)
    np.testing.assert_allclose(st["ce"], np.sum(ce_list), rtol=2e-3)
    np.testing.assert_allclose(st["mse"], np.sum(mse_list), rtol=2e-2,
                               atol=1e-4)

    # post-epoch weights agree: copy stgx's trained params into a fresh
    # reference model and compare every tensor with the torch-trained one
    ref2 = RefModel(**_ref_arch_kwargs(normalization)).train()
    _copy_into_ref(params, ref2, normalization)
    sd1, sd2 = ref.state_dict(), ref2.state_dict()
    assert set(sd1) == set(sd2)
    # Under BatchNorm, a conv bias feeding straight into a norm is a gauge
    # direction: BN's mean subtraction makes the loss exactly shift-invariant
    # in it, so its gradient is fp noise and Adam's normalized update walks
    # it by ±lr per step independently in each framework. Those params are
    # unidentifiable — skip them (the functional logits check below covers
    # them, since the gauge cancels).
    import re

    gauge = re.compile(r"(gcn\.conv|tcn\.2|residual\.0)\.bias$")
    for k in sd1:
        if normalization == "BatchNorm" and gauge.search(k):
            continue
        np.testing.assert_allclose(
            sd2[k].numpy(), sd1[k].numpy(), rtol=2e-2, atol=1e-3,
            err_msg=f"post-epoch mismatch at {k}",
        )

    # and functionally: identical logits on a fresh window batch
    xw = rng.normal(size=(6, W, 7, 6)).astype(np.float32)
    y_stgx = np.asarray(model.apply(params, jnp.asarray(xw)))
    with torch.no_grad():
        y_ref = ref(to_torch(xw)).numpy().squeeze(-1)
    np.testing.assert_allclose(y_stgx, y_ref, rtol=1e-3, atol=5e-4)
