"""Segmental evaluation metrics: F1@k, edit score, confusion matrix.

Host-side numpy implementations with the reference's exact semantics
(/root/reference/utils/metrics/): these run once per validation trial on
1-D label/prediction streams, so they are not a device-compute problem — but
unlike the reference they are vector-where-possible and keep the
order-dependent parts (greedy first-hit F1 matching, DP edit distance)
explicit, because naive vectorization changes results (SURVEY.md §7 "hard
parts").

API per metric (reference utils/metrics/metric.py:4-46): ``init_metric(n)``
→ per-trial ``__call__(labels, predicted)`` → ``reduce()`` → ``save(dir,
suffix)`` / ``log()``. ``reduce`` implements the cross-process reduction the
reference left as a stub (metric.py:39-40, called at processor.py:676,816):
under a multi-process ``jax.distributed`` session each process evaluates its
own trial shard, and ``reduce`` combines them — per-trial rows are gathered
across processes before averaging (F1/edit), counts matrices are summed
(confusion). Single-process sessions reduce locally with no collective.

``reduce`` also only averages the rows actually visited (``trial_id``), so a
truncated evaluation (``num_samples``) doesn't dilute the mean with
zero-filled unvisited rows.
"""

from __future__ import annotations

import csv
import os

import numpy as np

__all__ = ["F1Score", "EditScore", "ConfusionMatrix", "segment_boundaries"]


def _gather_trial_rows(rows: np.ndarray, gather=None) -> np.ndarray:
    """Concatenate per-trial metric rows from every process.

    ``rows`` is this process's ``(num_local_trials, k)`` block; processes may
    hold different trial counts, so rows are padded to the global max, stacked
    with a process allgather, and re-trimmed. ``gather`` is injectable for
    tests; the default is :func:`jax.experimental.multihost_utils
    .process_allgather` (identity when ``jax.process_count() == 1``).
    """
    if gather is None:
        import jax

        if jax.process_count() == 1:
            return rows
        from jax.experimental import multihost_utils

        gather = multihost_utils.process_allgather

    counts = np.asarray(gather(np.asarray([rows.shape[0]]))).reshape(-1)
    cap = int(counts.max())
    padded = np.zeros((cap,) + rows.shape[1:], dtype=rows.dtype)
    padded[: rows.shape[0]] = rows
    stacked = np.asarray(gather(padded))  # (procs, cap, k)
    return np.concatenate([stacked[p, : counts[p]] for p in range(len(counts))])


def _sum_across_processes(x: np.ndarray, gather=None) -> np.ndarray:
    """Elementwise sum of an accumulator over every process."""
    if gather is None:
        import jax

        if jax.process_count() == 1:
            return x
        from jax.experimental import multihost_utils

        gather = multihost_utils.process_allgather
    return np.asarray(gather(x)).sum(axis=0).astype(x.dtype)


def segment_boundaries(seq: np.ndarray):
    """Start indices and exclusive ends of constant-class runs.

    Mirrors reference ``Metric._get_segment_indices`` (metric.py:15-29),
    including its quirk that a class change back to the value of ``seq[0]``
    at index 1... (edges are nonzero diffs plus a forced edge at 0).
    """
    seq = np.asarray(seq).reshape(-1)
    edges = np.ones(len(seq), dtype=bool)
    edges[1:] = seq[1:] != seq[:-1]
    starts = np.flatnonzero(edges)
    ends = np.append(starts[1:], len(seq))
    return starts, ends


class Metric:
    def __init__(self, num_classes: int):
        self.num_classes = num_classes

    def init_metric(self, num_trials: int):
        self.num_trials = num_trials
        self.trial_id = 0

    def _advance(self):
        self.trial_id += 1

    def value(self):
        return self.metric

    def reduce(self, gather=None):
        return None

    def _write_csv(self, path, rows, header=None):
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            if header is not None:
                w.writerow(header)
            w.writerows(rows)


class F1Score(Metric):
    """Segmental F1@k (Lea et al. 2016) at multiple IoU thresholds.

    Greedy, order-dependent matching identical to the reference
    (f1.py:32-49): each predicted segment (in temporal order) matches the
    ground-truth segment of largest IoU; it is a TP iff the IoU exceeds the
    threshold, the classes agree, and that ground-truth segment is unused.
    """

    def __init__(self, num_classes: int, overlap=(0.1, 0.25, 0.5)):
        super().__init__(num_classes)
        self.overlap = np.asarray(overlap, dtype=np.float32)

    def init_metric(self, num_trials: int):
        super().init_metric(num_trials)
        self.metric = np.zeros((num_trials, len(self.overlap)), dtype=np.float32)

    def __call__(self, labels, predicted):
        labels = np.asarray(labels).reshape(-1)
        predicted = np.asarray(predicted).reshape(-1)
        k = len(self.overlap)
        tp = np.zeros(k, dtype=np.int64)
        fp = np.zeros(k, dtype=np.int64)

        ls, le = segment_boundaries(labels)
        ps, pe = segment_boundaries(predicted)
        used = np.zeros((len(ls), k), dtype=bool)

        for i in range(len(ps)):
            inter = np.minimum(pe[i], le) - np.maximum(ps[i], ls)
            union = np.maximum(pe[i], le) - np.minimum(ps[i], ls)
            iou = (inter / union) * (predicted[ps[i]] == labels[ls])
            idx = int(np.argmax(iou))
            hits = (iou[idx] > self.overlap) & ~used[idx]
            tp += hits
            fp += ~hits
            used[idx] |= hits

        fn = len(ls) - used.sum(axis=0)
        with np.errstate(divide="ignore", invalid="ignore"):
            precision = tp / (tp + fp)
            recall = tp / (tp + fn)
            f1 = 2 * precision * recall / (precision + recall)
        self.metric[self.trial_id] = f1
        self._advance()

    def reduce(self, gather=None):
        # NaN trials (no segments matched) count as 0 (reference f1.py:70-73);
        # only visited rows count, concatenated across processes
        rows = _gather_trial_rows(self.metric[: self.trial_id], gather)
        self.metric = np.nan_to_num(rows).mean(axis=0) if len(rows) else (
            np.zeros(len(self.overlap), np.float32)
        )

    def save(self, save_dir, suffix=None):
        path = os.path.join(save_dir, f"macro-F1@k{suffix or ''}.csv")
        self._write_csv(path, np.stack([self.overlap, self.metric]))

    def log(self):
        return f"f1@k = {self.metric}"


class EditScore(Metric):
    """Segmental edit score: 1 - normalized Levenshtein over the segment
    class sequences (reference edit.py:6-53)."""

    def init_metric(self, num_trials: int):
        super().init_metric(num_trials)
        self.metric = np.zeros((num_trials, 1), dtype=np.float32)

    def __call__(self, labels, predicted):
        labels = np.asarray(labels).reshape(-1)
        predicted = np.asarray(predicted).reshape(-1)
        ls, _ = segment_boundaries(labels)
        ps, _ = segment_boundaries(predicted)
        a = predicted[ps]  # segment class sequence, prediction
        b = labels[ls]
        m, n = len(a), len(b)
        D = np.zeros((m + 1, n + 1), dtype=np.float32)
        D[:, 0] = np.arange(m + 1)
        D[0, :] = np.arange(n + 1)
        for j in range(1, n + 1):
            for i in range(1, m + 1):
                if b[j - 1] == a[i - 1]:
                    D[i, j] = D[i - 1, j - 1]
                else:
                    D[i, j] = min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1]) + 1
        self.metric[self.trial_id] = 1.0 - D[m, n] / max(m, n)
        self._advance()

    def reduce(self, gather=None):
        rows = _gather_trial_rows(self.metric[: self.trial_id], gather)
        self.metric = rows.mean(axis=0) if len(rows) else np.zeros(1, np.float32)

    def save(self, save_dir, suffix=None):
        path = os.path.join(save_dir, f"edit{suffix or ''}.csv")
        self._write_csv(path, [self.metric], header=["edit"])

    def log(self):
        return f"edit = {self.metric}"


class ConfusionMatrix(Metric):
    """Framewise confusion accumulation, ``rows = predicted, cols = actual``
    (reference confusion.py:6-38)."""

    def init_metric(self, num_trials: int):
        super().init_metric(num_trials)
        self.metric = np.zeros((self.num_classes, self.num_classes), dtype=np.int64)

    def __call__(self, labels, predicted):
        labels = np.asarray(labels).reshape(-1)
        predicted = np.asarray(predicted).reshape(-1)
        np.add.at(self.metric, (predicted, labels), 1)
        self._advance()

    def reduce(self, gather=None):
        self.metric = _sum_across_processes(self.metric, gather)

    def save(self, save_dir, suffix=None):
        path = os.path.join(save_dir, f"confusion-matrix{suffix or ''}.csv")
        self._write_csv(path, self.metric)

    def log(self):
        return None
