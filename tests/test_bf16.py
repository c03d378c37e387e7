"""bf16 compute path: params stay fp32 in the optimizer, the model runs in
bfloat16 (Trainer.compute_dtype), norm statistics upcast to fp32
(stgx/ops/norms.py). Checks: grads are fp32 and close to the fp32 path's,
a short training run stays finite and learns, eval works."""

import numpy as np
import jax
import jax.numpy as jnp

from stgx.graph import load_skeleton
from stgx.models import MODELS
from stgx.parallel.loop import OptimizerConfig, Trainer
from stgx.utils.loss import Loss

GRAPH = load_skeleton("imu_fogit_ABCD")


class _SynthDataset:
    def __init__(self, n=6, l=40, seed=0):
        rng = np.random.default_rng(seed)
        self.items = []
        for _ in range(n):
            y = np.repeat(rng.integers(0, 5, size=l // 10 + 1), 10)[:l]
            x = rng.normal(size=(l, 7, 6)).astype(np.float32) * 0.1
            x += y[:, None, None] * 0.5  # learnable signal
            self.items.append((x.astype(np.float32), y.astype(np.int64)))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _trainer(compute_dtype):
    model = MODELS["rt-st-gcn"](
        num_classes=5, in_feat=6, graph=GRAPH, normalization="LayerNorm",
        kernel=3, in_ch=(8, 8), out_ch=(8, 16), stride=(1, 1),
        residual=(1, 1), dropout=(0.0, 0.0),
    )
    dist = np.ones(5, np.float32)
    return Trainer(
        model=model,
        kind="frame",
        loss=Loss(dist, "logits"),
        opt=OptimizerConfig(learning_rate=5e-3, batch_size=3, epochs=2),
        bucket=40,
        compute_dtype=compute_dtype,
    )


def test_bf16_grads_close_to_fp32():
    ds = _SynthDataset()
    x, y = ds[0]
    results = {}
    for dt in (None, "bfloat16"):
        tr = _trainer(dt)
        params, _ = tr.init(jnp.asarray(x[None]))
        xd, yd, mask = tr._prepare(x, y)
        grads, ce, mse, *_ = tr._grad_step(xd.shape)(
            params, xd, yd, mask, 1.0, jax.random.PRNGKey(0),
            jnp.asarray(0.0, jnp.float32),
        )
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(l.dtype == jnp.float32 for l in leaves)
        results[dt] = (
            np.concatenate([np.asarray(l).ravel() for l in leaves]),
            float(ce),
        )
    g32, ce32 = results[None]
    g16, ce16 = results["bfloat16"]
    # bf16 has ~3 decimal digits; direction must agree, magnitude loosely
    assert np.isfinite(g16).all() and np.isfinite(ce16)
    assert abs(ce16 - ce32) / max(abs(ce32), 1e-6) < 0.05
    cos = np.dot(g16, g32) / (np.linalg.norm(g16) * np.linalg.norm(g32))
    assert cos > 0.99, f"bf16/fp32 gradient cosine {cos}"


def test_bf16_training_learns():
    ds = _SynthDataset()
    tr = _trainer("bfloat16")
    x0, _ = ds[0]
    params, opt_state = tr.init(jnp.asarray(x0[None]))
    first = last = None
    for epoch in range(4):
        params, opt_state, stats = tr.train_epoch(params, opt_state, ds, epoch)
        assert np.isfinite(stats["ce"]), stats
        if first is None:
            first = stats["ce"]
        last = stats["ce"]
    assert last < first, (first, last)
    ev = tr.evaluate(params, ds)
    assert np.isfinite(ev["ce"])
    assert 0.0 <= ev["top1"] <= 1.0


def test_bf16_window_model_grads():
    """Window models train under bf16 too — pins the temporal_conv VJP
    dtype fix (preferred_element_type must follow the operand dtype or
    lax.conv's transposed-conv backward gets mismatched dtypes)."""
    model = MODELS["st-gcn"](
        num_classes=5, in_feat=6, graph=GRAPH, normalization="BatchNorm",
        kernel=3, in_ch=(8, 8), out_ch=(8, 16), stride=(1, 2),
        residual=(1, 1), dropout=(0.0, 0.0),
    )
    tr = Trainer(
        model=model, kind="window", loss=Loss(np.ones(5, np.float32)),
        opt=OptimizerConfig(learning_rate=1e-3, batch_size=2, epochs=1),
        receptive_field=10, bucket=40, compute_dtype="bfloat16",
    )
    ds = _SynthDataset(n=2)
    params, opt_state = tr.init(np.zeros((4, 10, 7, 6), np.float32))
    params, opt_state, st = tr.train_epoch(params, opt_state, ds, 0)
    assert np.isfinite(st["ce"]) and np.isfinite(st["mse"])
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)
