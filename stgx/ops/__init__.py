"""Core compute ops: partitioned graph conv, temporal ops, norms, shift.

All ops use the stgx canonical activation layout ``(N, L, V, C)`` — batch,
frames, joints, channels — channels last so the MXU contracts over a
128-friendly lane dimension (the reference keeps torch's ``(N, C, L, V)``;
see /root/reference/models/utils/tgcn.py:58-79).
"""

from stgx.ops.norms import layer_norm, batch_norm, LayerNorm, BatchNorm  # noqa: F401
from stgx.ops.graph_conv import partitioned_gcn, gcn_aggregate  # noqa: F401
from stgx.ops.temporal import (  # noqa: F401
    temporal_conv,
    causal_accumulate,
    causal_accumulate_step,
)
