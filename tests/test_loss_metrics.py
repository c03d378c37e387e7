"""Loss / statistics / segmental-metric parity vs the reference implementations
(run directly from /root/reference where mounted) and invariants."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from stgx.utils.loss import Loss, LossMultiStage, class_weights
from stgx.utils.metrics import ConfusionMatrix, EditScore, F1Score
from stgx.utils.statistics import Statistics, StatisticsMultiStage

REF = "/root/reference"
HAVE_REF = os.path.isdir(REF)
RNG = np.random.default_rng(0)


def _ref_modules():
    sys.path.insert(0, REF)
    try:
        from utils.loss import Loss as RefLoss
        from utils.metrics.f1 import F1Score as RefF1
        from utils.metrics.edit import EditScore as RefEdit
        from utils.metrics.confusion import ConfusionMatrix as RefConf
        from utils.statistics import Statistics as RefStats
    finally:
        sys.path.remove(REF)
    return RefLoss, RefF1, RefEdit, RefConf, RefStats


def _fake_streams(L=200, C=7, seed=0):
    rng = np.random.default_rng(seed)
    # piecewise-constant label stream with ~10 segments
    labels = np.repeat(rng.integers(0, C, size=10), L // 10).astype(np.int64)[:L]
    predicted = labels.copy()
    flip = rng.random(L) < 0.25
    predicted[flip] = rng.integers(0, C, size=flip.sum())
    return labels, predicted


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
@pytest.mark.parametrize("output_type", ["logits", "logsoftmax", "softmax"])
def test_loss_parity(output_type):
    RefLoss, *_ = _ref_modules()
    C, L = 6, 50
    dist = RNG.integers(1, 100, size=C).astype(np.float32)
    raw = RNG.normal(size=(1, L, C)).astype(np.float32)
    if output_type == "logsoftmax":
        outputs = np.asarray(jnp.log(jnp.asarray(jnp.exp(raw) / jnp.exp(raw).sum(-1, keepdims=True))))
    elif output_type == "softmax":
        outputs = np.asarray(jnp.exp(raw) / jnp.exp(raw).sum(-1, keepdims=True))
    else:
        outputs = raw
    labels = RNG.integers(0, C, size=(1, L)).astype(np.int64)

    mine = Loss(dist, output_type)
    ce, mse = mine(jnp.asarray(outputs), jnp.asarray(labels))

    ref = RefLoss("cpu", torch.from_numpy(dist), output_type)
    # reference layout (N, C, L)
    t_out = torch.from_numpy(outputs.transpose(0, 2, 1))
    rce, rmse = ref(0, t_out, torch.from_numpy(labels))
    np.testing.assert_allclose(float(ce), float(rce), rtol=1e-5)
    np.testing.assert_allclose(float(mse), float(rmse), rtol=1e-5)


def test_multistage_loss_sums():
    C = 5
    dist = np.ones(C, dtype=np.float32)
    out = jnp.asarray(RNG.normal(size=(3, 2, 20, C)).astype(np.float32))
    labels = jnp.asarray(RNG.integers(0, C, size=(2, 20)))
    ms = LossMultiStage(dist)
    single = Loss(dist)
    ce, mse = ms(out, labels)
    ce_sum = sum(float(single(out[s], labels)[0]) for s in range(3))
    np.testing.assert_allclose(float(ce), ce_sum, rtol=1e-5)


def test_masked_loss_equals_cropped():
    C = 5
    dist = np.arange(1, C + 1, dtype=np.float32)
    out = RNG.normal(size=(1, 30, C)).astype(np.float32)
    labels = RNG.integers(0, C, size=(1, 30))
    mask = np.ones((1, 30), dtype=np.float32)
    mask[:, 20:] = 0
    loss = Loss(dist)
    ce_m, mse_m = loss(jnp.asarray(out), jnp.asarray(labels), jnp.asarray(mask))
    ce_c, mse_c = loss(jnp.asarray(out[:, :20]), jnp.asarray(labels[:, :20]))
    np.testing.assert_allclose(float(ce_m), float(ce_c), rtol=1e-5)
    np.testing.assert_allclose(float(mse_m), float(mse_c), rtol=1e-5)


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
def test_statistics_parity():
    *_, RefStats = _ref_modules()
    C, L = 10, 100
    out = RNG.normal(size=(1, L, C)).astype(np.float32)
    labels = RNG.integers(0, C, size=(1, L)).astype(np.int64)
    top1, top5, c1, c5, tot = Statistics()(jnp.asarray(out), jnp.asarray(labels))
    rt1, rt5, rc1, rc5, rtot = RefStats()(
        0, torch.from_numpy(out.transpose(0, 2, 1)), torch.from_numpy(labels)
    )
    assert int(c1) == rc1 and int(c5) == rc5 and int(tot) == rtot
    np.testing.assert_array_equal(np.asarray(top1), rt1.numpy())


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
def test_f1_edit_confusion_parity():
    _, RefF1, RefEdit, RefConf, _ = _ref_modules()
    C = 7
    for seed in range(5):
        labels, predicted = _fake_streams(seed=seed)
        tl, tp = torch.from_numpy(labels)[None], torch.from_numpy(predicted)[None]

        f1 = F1Score(C, (0.1, 0.25, 0.5))
        f1.init_metric(1)
        f1(labels, predicted)
        f1.reduce()
        rf1 = RefF1("cpu", C, [0.1, 0.25, 0.5])
        rf1.init_metric(1)
        rf1(tl, tp)
        rf1.reduce()
        np.testing.assert_allclose(f1.value(), rf1.value().numpy(), atol=1e-6)

        ed = EditScore(C)
        ed.init_metric(1)
        ed(labels, predicted)
        ed.reduce()
        red = RefEdit("cpu", C)
        red.init_metric(1)
        red(tl, tp)
        red.reduce()
        np.testing.assert_allclose(ed.value(), red.value().numpy(), atol=1e-6)

        cm = ConfusionMatrix(C)
        cm.init_metric(1)
        cm(labels, predicted)
        rcm = RefConf("cpu", C)
        rcm.init_metric(1)
        rcm(tl, tp)
        np.testing.assert_array_equal(cm.value(), rcm.value().numpy())


def test_metric_csv_artifacts(tmp_path):
    labels, predicted = _fake_streams()
    for metric, fname in [
        (F1Score(7), "macro-F1@k.csv"),
        (EditScore(7), "edit.csv"),
        (ConfusionMatrix(7), "confusion-matrix.csv"),
    ]:
        metric.init_metric(1)
        metric(labels, predicted)
        metric.reduce()
        metric.save(str(tmp_path))
        assert (tmp_path / fname).exists()
