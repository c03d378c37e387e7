"""Sequence segmentation: windows, overlapped segments, length bucketing.

The stgx counterpart of the reference's segment-generator layer
(/root/reference/utils/segment_generator.py — the repo's de-facto sequence
parallelism, SURVEY.md §2.5/§5.7), rebuilt for a SPMD machine:

* :func:`sliding_windows` — per-frame receptive-field windows for window
  classifiers (WindowSegment semantics: start-pad by W-1 "empty buffer",
  one window per frame, segment_generator.py:116-145);
* :func:`segment_overlapping` / :func:`fold_segments` — chop a long trial
  into Γ-overlapped chunks stacked on the batch axis and overlap-fold the
  per-frame predictions back (BufferSegment semantics: zero the first Γ
  overlap frames of every chunk but the first, then fold,
  segment_generator.py:25-106). On a mesh these chunks shard over ``data``;
  alternatively shard L directly on ``seq`` and skip segmentation entirely;
* :func:`pad_to_bucket` — static-shape length bucketing with a frame mask,
  the XLA-friendly replacement for the reference's ragged Python loops.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = [
    "sliding_windows",
    "segment_overlapping",
    "fold_segments",
    "pad_to_bucket",
]


def sliding_windows(x, window: int):
    """``(N, L, V, C)`` → ``(N, L, W, V, C)``: frame t's window covers input
    frames ``[t-W+1, t]`` with zeros before the start (empty-buffer padding).
    """
    n, l, v, c = x.shape
    xp = jnp.pad(x, ((0, 0), (window - 1, 0), (0, 0), (0, 0)))
    idx = jnp.arange(l)[:, None] + jnp.arange(window)[None, :]  # (L, W)
    return xp[:, idx]  # (N, L, W, V, C)


def segment_overlapping(x, segment: int, overlap: int):
    """``(N=1, L, V, C)`` → ``(num_segments, segment, V, C)`` chunks that
    advance by ``segment - overlap`` frames; L must be pre-padded so the
    chunks tile it exactly (use :func:`segment_padding`)."""
    _, l, v, c = x.shape
    step = segment - overlap
    num = (l - segment) // step + 1
    starts = jnp.arange(num) * step
    idx = starts[:, None] + jnp.arange(segment)[None, :]
    return x[0, idx]  # (num, segment, V, C)


def segment_padding(L: int, segment: int, overlap: int) -> int:
    """End padding so L splits into ``segment``-sized chunks advancing by
    ``segment - overlap`` (reference pad_sequence, segment_generator.py:33-47).
    """
    step = segment - overlap
    if L <= segment:
        return segment - L
    rem = (L - segment) % step
    return 0 if rem == 0 else step - rem


def fold_segments(preds, L: int, overlap: int):
    """``(num_segments, S, C)`` per-frame predictions → ``(1, L, C)``.

    Zeroes each non-first chunk's first ``overlap`` frames and overlap-adds
    (the reference's mask+F.fold round trip, segment_generator.py:83-106).
    """
    num, s, c = preds.shape
    step = s - overlap
    total = s + step * (num - 1)
    mask = jnp.ones((num, s, 1), preds.dtype).at[1:, :overlap].set(0.0)
    pm = preds * mask
    out = jnp.zeros((total, c), preds.dtype)
    starts = jnp.arange(num) * step
    idx = starts[:, None] + jnp.arange(s)[None, :]
    out = out.at[idx.reshape(-1)].add(pm.reshape(-1, c))
    return out[None, :L]


def pad_to_bucket(x: np.ndarray, labels: np.ndarray, bucket: int):
    """Pad a single trial ``(L, V, C)`` to the next multiple of ``bucket``.

    Returns ``(x_padded, labels_padded, mask)`` with static shapes per
    bucket — bounded jit recompilation in place of ragged loops.
    """
    l = x.shape[0]
    target = max(bucket, int(math.ceil(l / bucket)) * bucket)
    pad = target - l
    xp = np.pad(x, ((0, pad), (0, 0), (0, 0)))
    yp = np.pad(labels, (0, pad))
    mask = np.zeros(target, dtype=np.float32)
    mask[:l] = 1.0
    return xp, yp, mask
