"""Parallelism layer: device mesh, sequence sharding, train/eval steps.

Replaces the reference's single-process DataParallel + segment-scatter
machinery (SURVEY.md §2.bis) with one GSPMD code path: a ``(data, seq)``
mesh, sharding annotations, and compiler-inserted collectives — the same
program runs on 1 chip, an 8-device virtual CPU mesh, or a pod slice.
"""

from stgx.parallel.mesh import make_mesh  # noqa: F401
from stgx.parallel.segments import (  # noqa: F401
    sliding_windows,
    segment_overlapping,
    fold_segments,
    pad_to_bucket,
)
