"""Batched same-bucket trial training == per-trial training (LayerNorm),
including ragged-tail divisors and step boundaries."""

import jax
import jax.numpy as jnp
import numpy as np

from stgx.graph import load_skeleton
from stgx.models import MODELS
from stgx.parallel.loop import OptimizerConfig, Trainer
from stgx.utils import LOSS
from stgx.utils.loss import Loss

SKEL = load_skeleton("imu_fogit_ABCD")


class DS:
    """7 trials of identical length (one bucket) → ragged tail at bs=3."""

    def __len__(self):
        return 7

    def __getitem__(self, i):
        rng = np.random.default_rng(100 + i)
        return (
            rng.normal(size=(48, 7, 6)).astype(np.float32),
            rng.integers(0, 5, size=48).astype(np.int64),
        )


def _trainer(trial_batch):
    model = MODELS["rt-st-gcn"](
        num_classes=5, in_feat=6, graph=SKEL, kernel=3, in_ch=(8, 16),
        out_ch=(16, 16), stride=(1, 1), residual=(1, 1), dropout=(0.0, 0.0),
        normalization="LayerNorm",
    )
    return Trainer(
        model=model, kind="frame", loss=LOSS["rt-st-gcn"](np.ones(5, np.float32)),
        opt=OptimizerConfig(batch_size=3, learning_rate=1e-3), bucket=48,
        trial_batch=trial_batch,
    )


def test_batched_equals_per_trial():
    ds = DS()
    results = {}
    for tb in (1, 3):
        tr = _trainer(tb)
        params, opt_state = tr.init(ds[0][0][None])
        params, opt_state, st = tr.train_epoch(params, opt_state, ds, 0)
        results[tb] = (st, params)
    np.testing.assert_allclose(
        results[1][0]["ce"], results[3][0]["ce"], rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(results[1][1]), jax.tree.leaves(results[3][1])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_per_sample_loss_matches_rowwise():
    rng = np.random.default_rng(0)
    dist = np.arange(1, 6, dtype=np.float32)
    out = jnp.asarray(rng.normal(size=(3, 20, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, size=(3, 20)))
    mask = jnp.asarray((rng.random((3, 20)) > 0.2).astype(np.float32))
    loss = Loss(dist)
    ce_v, mse_v = loss(out, labels, mask, per_sample=True)
    for r in range(3):
        ce_r, mse_r = loss(out[r : r + 1], labels[r : r + 1], mask[r : r + 1])
        np.testing.assert_allclose(float(ce_v[r]), float(ce_r), rtol=1e-5)
        np.testing.assert_allclose(float(mse_v[r]), float(mse_r), rtol=1e-5)


def test_batched_eval_equals_per_trial():
    """Stacked evaluation (trial_batch > 1) reproduces per-trial eval:
    losses, top-k, and the segmental metrics (LayerNorm — exact; under
    BatchNorm stacking changes the batch statistics by design, matching the
    reference's file-mode DataLoader batching)."""
    from stgx.utils.metrics import ConfusionMatrix, EditScore, F1Score

    ds = DS()
    results = {}
    for tb in (1, 3):
        tr = _trainer(tb)
        params, _ = tr.init(ds[0][0][None])
        metrics = [F1Score(5, (0.1, 0.5)), EditScore(5), ConfusionMatrix(5)]
        ev = tr.evaluate(params, ds, metrics=metrics)
        results[tb] = (ev, metrics)
    e1, e3 = results[1][0], results[3][0]
    np.testing.assert_allclose(e1["ce"], e3["ce"], rtol=1e-5)
    np.testing.assert_allclose(e1["mse"], e3["mse"], rtol=1e-4, atol=1e-6)
    assert e1["top1"] == e3["top1"] and e1["top5"] == e3["top5"]
    for m1, m3 in zip(results[1][1], results[3][1]):
        np.testing.assert_allclose(
            np.asarray(m1.value()), np.asarray(m3.value()), rtol=1e-6
        )
