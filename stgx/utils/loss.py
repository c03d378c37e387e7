"""Segmentation loss: class-weighted CE + truncated temporal-smoothing MSE.

Semantics match the reference (/root/reference/utils/loss.py:6-54), which in
turn takes the CE+MSE mix from MS-GCN:

* CE with class weights ``w_c = 1 - dist_c / Σdist`` and torch's
  weighted-mean reduction ``Σ w_{y_t}·nll_t / Σ w_{y_t}`` (loss.py:21,28);
* plus ``0.15 · mean(clamp((p_t - stopgrad(p_{t-1}))², 0, 16))`` on the
  adapter-transformed outputs (loss.py:30-39);
* input adapters per model ``output_type`` — including the reference's own
  asymmetry where 'logsoftmax' models get the MSE on probabilities but
  'logits' models get it on log-probabilities (loss.py:10-18);
* multi-stage variants sum over stages (loss.py:44-54).

stgx additions: everything is a pure jittable function over ``(N, L, C)``
logits, and an optional ``(N, L)`` frame mask supports the bucketed
unequal-length batching (mask of ones reproduces the reference exactly; the
reference instead relied on exact segment tiling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["Loss", "LossMultiStage", "weighted_cross_entropy", "smoothing_mse"]


def class_weights(class_dist):
    """``w_c = 1 - dist_c / Σdist`` (reference loss.py:21)."""
    d = jnp.asarray(class_dist, dtype=jnp.float32)
    return 1.0 - d / jnp.sum(d)


def weighted_cross_entropy(logits, labels, weights, mask=None,
                           per_sample: bool = False):
    """Torch-style weighted-mean CE over frames.

    Args:
        logits: ``(N, L, C)``.
        labels: ``(N, L)`` int.
        weights: ``(C,)`` class weights.
        mask: optional ``(N, L)`` validity.
        per_sample: return a ``(N,)`` vector of per-trial weighted means —
            used when independent trials are stacked on the batch axis, so
            each keeps the reference's per-trial normalization.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = weights[labels]
    if mask is not None:
        w = w * mask.astype(w.dtype)
    if per_sample:
        return jnp.sum(w * nll, axis=-1) / jnp.sum(w, axis=-1)
    return jnp.sum(w * nll) / jnp.sum(w)


def smoothing_mse(outputs, mask=None, per_sample: bool = False):
    """``0.15 · mean(clamp((p_t - stopgrad(p_{t-1}))², 0, 16))`` over frames
    ``1..L-1`` (reference loss.py:33-39). ``outputs`` already adapter-domain."""
    d = outputs[:, 1:] - jax.lax.stop_gradient(outputs[:, :-1])
    sq = jnp.clip(d * d, 0.0, 16.0)
    if per_sample:
        if mask is None:
            return 0.15 * jnp.mean(sq, axis=(1, 2))
        m = (mask[:, 1:] * mask[:, :-1]).astype(sq.dtype)[..., None]
        return 0.15 * jnp.sum(sq * m, axis=(1, 2)) / (
            jnp.sum(m, axis=(1, 2)) * sq.shape[-1]
        )
    if mask is None:
        return 0.15 * jnp.mean(sq)
    m = (mask[:, 1:] * mask[:, :-1]).astype(sq.dtype)[..., None]
    return 0.15 * jnp.sum(sq * m) / (jnp.sum(m) * sq.shape[-1])


class Loss:
    """Callable bundling the CE+MSE pair; expects stgx ``(N, L, C)`` outputs."""

    def __init__(self, class_dist, output_type: str = "logits"):
        self.weights = class_weights(class_dist)
        if output_type == "logits":
            self.to_ce = lambda x: x
            self.to_mse = lambda x: jax.nn.log_softmax(x, axis=-1)
        elif output_type == "logsoftmax":
            self.to_ce = lambda x: x
            self.to_mse = lambda x: jnp.exp(x)
        elif output_type == "softmax":
            self.to_ce = lambda x: jnp.log(x)
            self.to_mse = lambda x: x
        else:
            raise ValueError(f"unknown output_type: {output_type!r}")

    def __call__(self, outputs, labels, mask=None, per_sample: bool = False):
        ce = weighted_cross_entropy(
            self.to_ce(outputs), labels, self.weights, mask, per_sample
        )
        mse = smoothing_mse(self.to_mse(outputs), mask, per_sample)
        return ce, mse


class LossMultiStage(Loss):
    """Sums CE and MSE over the leading stage axis ``(S, N, L, C)``."""

    def __call__(self, outputs, labels, mask=None, per_sample: bool = False):
        ce_tot, mse_tot = 0.0, 0.0
        for s in range(outputs.shape[0]):
            ce, mse = super().__call__(outputs[s], labels, mask, per_sample)
            ce_tot = ce_tot + ce
            mse_tot = mse_tot + mse
        return ce_tot, mse_tot
