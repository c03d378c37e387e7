"""The op-ablation profiler's variants all trace and run (tiny CPU smoke) —
protects stgx/bench/ablate.py's monkeypatch targets from bitrot as ops are
refactored."""

import numpy as np
import pytest

from stgx.bench.ablate import _patched, _variants
from stgx.bench.train_throughput import measure_train_throughput
from stgx.graph import load_skeleton
from stgx.models import MODELS
from stgx.utils.loss import Loss


@pytest.mark.parametrize("name", list(_variants().keys()))
def test_variant_runs(name):
    variants = _variants()
    if name == "acc_pallas":
        pytest.skip("TPU-only kernel (interpret-mode covered in test_pallas_acc)")
    if name in ("rt_fused", "rt_fused_fwd"):
        # Mosaic can't lower on CPU — run the fused kernel interpreted so the
        # enable-flag → RtLayer → GraphConv wiring is still exercised
        import stgx.ops.rt_fused as rt_fused

        variants = {name: variants[name] + [(rt_fused, "_INTERPRET", True)]}
    model = MODELS["rt-st-gcn"](
        num_classes=5, in_feat=6, graph=load_skeleton("imu_fogit_ABCD"),
        normalization="BatchNorm", kernel=3, in_ch=(8, 8), out_ch=(8, 8),
        stride=(1, 2), residual=(1, 1), dropout=(0.0, 0.0), importance=True,
        remat=(name in ("remat", "remat_dots")),
    )
    loss = Loss(np.ones(5, np.float32), "logits")
    with _patched(variants[name]):
        fps, sec = measure_train_throughput(
            model, loss, frames_per_trial=32, trials=2, scan_lengths=(1, 2),
            iters=1, fwd_only=(name in ("fwd_only", "rt_fused_fwd")),
            use_mask=(name != "no_mask"),
        )
    # tiny CPU runs can produce a negative slope (timing noise); the smoke
    # only asserts the variant traces and executes
    assert np.isfinite(fps) and fps != 0


def test_pad_v32_skeleton_builds_and_trains():
    # the pad_v32 variant's skeleton swap (ablate.main): V=25 -> 32 with
    # chain-connected extra joints must yield a finite spatial graph and a
    # trainable model (the round-4 tile-padding A/B, docs/PERF.md)
    from stgx.graph import Graph

    skel = load_skeleton("pku-mmd")
    skel["num_node"] = 32
    skel["edge"] = list(skel["edge"]) + [(i, i + 1) for i in range(24, 31)]
    g = Graph(num_node=32, edge=skel["edge"], center=skel["center"],
              strategy="spatial")
    assert g.A.shape == (3, 32, 32) and np.isfinite(g.A).all()
    model = MODELS["st-gcn"](
        num_classes=5, in_feat=3, graph=skel, normalization="BatchNorm",
        kernel=3, in_ch=(8, 8), out_ch=(8, 8), stride=(1, 2),
        residual=(1, 1), dropout=(0.0, 0.0), importance=True,
    )
    loss = Loss(np.ones(5, np.float32), "logits")
    fps, _ = measure_train_throughput(
        model, loss, frames_per_trial=10, trials=2, scan_lengths=(1, 2),
        iters=1, kind="window",
    )
    assert np.isfinite(fps) and fps != 0


def test_window_kind_runs():
    model = MODELS["st-gcn"](
        num_classes=5, in_feat=6, graph=load_skeleton("imu_fogit_ABCD"),
        normalization="BatchNorm", kernel=3, in_ch=(8, 8), out_ch=(8, 8),
        stride=(1, 2), residual=(1, 1), dropout=(0.0, 0.0), importance=True,
    )
    loss = Loss(np.ones(5, np.float32), "logits")
    fps, _ = measure_train_throughput(
        model, loss, frames_per_trial=10, trials=4, scan_lengths=(1, 2),
        iters=1, kind="window",
    )
    assert fps > 0 and np.isfinite(fps)
