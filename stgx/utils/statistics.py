"""Framewise top-1/top-5 statistics (reference utils/statistics.py:4-21)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["Statistics", "StatisticsMultiStage"]


class Statistics:
    """Top-1/top-5 correct counts over ``(N, L, C)`` outputs, ``(N, L)`` labels.

    Returns ``(top1_pred, top5_pred, top1_correct, top5_correct, total)``;
    with a mask, padded frames count neither as correct nor toward total.
    """

    def __call__(self, outputs, labels, mask=None):
        _, top5 = jax.lax.top_k(outputs, k=min(5, outputs.shape[-1]))
        top1 = top5[..., 0]
        correct1 = (top1 == labels)
        correct5 = jnp.any(top5 == labels[..., None], axis=-1)
        if mask is not None:
            m = mask.astype(bool)
            correct1 = correct1 & m
            correct5 = correct5 & m
            total = jnp.sum(m)
        else:
            total = labels.size
        return (
            top1,
            top5,
            jnp.sum(correct1),
            jnp.sum(correct5),
            total,
        )


class StatisticsMultiStage(Statistics):
    """Evaluates the last stage only (reference statistics.py:19-21)."""

    def __call__(self, outputs, labels, mask=None):
        return super().__call__(outputs[-1], labels, mask)
