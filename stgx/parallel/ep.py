"""Expert parallelism: DY-SE expert mixtures sharded over ``model``.

The reference has no expert parallelism (SURVEY.md §2.bis lists EP as n/a),
but its Shift-GCN++ student carries 4-expert dynamic pointwise linears —
``(4, C_in, C_out)`` weight stacks combined per-sample by an SE gate
(reference models/shiftgcn_plus/shiftgcn_plus.py:264-288; our
``stgx/models/shiftgcn_plus.py`` ``StudentSpatialShift``/
``StudentTemporalShift``). That leading expert dim is a real parallelism
axis: shard it over ``model`` and the gate-combine einsum
``kcd,nk->ncd`` contracts over the sharded dim, so XLA emits one psum over
ICI per block. Pure GSPMD — no dispatch/routing code, and semantics are
identical to the replicated run (``tests/test_ep.py``).

EP and TP share the ``model`` mesh axis: an expert leaf shards its expert
dim, every other eligible leaf shards its output-channel dim
(``shard_params_tp_ep``); a leaf never uses the axis twice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stgx.parallel.tp import _leaf_spec as _tp_leaf_spec

__all__ = ["param_specs_ep", "shard_params_ep", "shard_params_tp_ep"]

# expert-stacked leaves inside the student's dynamic shift blocks: the
# leading dim is the expert count (4)
_EXPERT_MODULES = ("StudentSpatialShift", "StudentTemporalShift")
_EXPERT_LEAVES = {"kernel", "bias", "temporal_kernel", "temporal_bias"}


def _is_expert_leaf(path, leaf, size: int) -> bool:
    keys = [str(p.key) for p in path if hasattr(p, "key")]
    return (
        len(keys) >= 2
        and keys[-1] in _EXPERT_LEAVES
        # direct child of the shift block — the nested SE gate's own Dense
        # kernels live one level deeper and stay replicated
        and keys[-2].startswith(_EXPERT_MODULES)
        and hasattr(leaf, "ndim")
        and leaf.ndim >= 1
        and leaf.shape[0] % size == 0
        and leaf.shape[0] >= size
    )


def param_specs_ep(params, mesh: Mesh, tp: bool = False):
    """PartitionSpec pytree sharding expert dims over ``model``.

    With ``tp=True``, non-expert leaves additionally get the tensor-parallel
    output-channel sharding (``stgx/parallel/tp.py``) on the same axis.
    """
    size = mesh.shape["model"]
    if size == 1:
        return jax.tree.map(lambda _: P(), params)

    def spec(path, leaf):
        if _is_expert_leaf(path, leaf, size):
            return P("model", *([None] * (leaf.ndim - 1)))
        return _tp_leaf_spec(path, leaf, size) if tp else P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_ep(params, mesh: Mesh):
    """Place params with expert dims sharded over ``model``."""
    specs = param_specs_ep(params, mesh)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs
    )


def shard_params_tp_ep(params, mesh: Mesh):
    """Expert dims + output channels sharded over ``model`` (EP ⊕ TP)."""
    specs = param_specs_ep(params, mesh, tp=True)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs
    )
