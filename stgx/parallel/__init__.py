"""Parallelism layer: device mesh, sequence sharding, train/eval steps.

Replaces the reference's single-process DataParallel + segment-scatter
machinery (SURVEY.md §2.bis) with one GSPMD code path: a ``(data, seq,
model)`` mesh, sharding annotations, and compiler-inserted collectives — the
same program runs on 1 chip, an 8-device virtual CPU mesh, or a pod slice.
Tensor parallelism (``tp.py``) shards channels over ``model``; pipeline
parallelism (``pipeline.py``) reuses that axis for stage-per-device MS-TCN /
MS-GCN refinement.
"""

from stgx.parallel.mesh import make_mesh  # noqa: F401
from stgx.parallel.tp import param_specs_tp, shard_params_tp  # noqa: F401
from stgx.parallel.ep import (  # noqa: F401
    param_specs_ep,
    shard_params_ep,
    shard_params_tp_ep,
)
from stgx.parallel.pipeline import (  # noqa: F401
    pipeline_apply,
    mstcn_apply_pipelined,
    msgcn_refine_pipelined,
)
from stgx.parallel.segments import (  # noqa: F401
    sliding_windows,
    segment_overlapping,
    fold_segments,
    pad_to_bucket,
)
