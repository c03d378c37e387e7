"""Tensor parallelism: channel sharding over the ``model`` mesh axis.

The reference has no tensor parallelism (SURVEY.md §2.bis lists it as the
optional ``model`` mesh axis on channel dims). Here it is pure GSPMD: every
weight's output-channel dimension is sharded over ``model`` when divisible,
and XLA propagates the sharding through the network — activations become
channel-sharded, contractions over the sharded channel dim get a psum over
ICI, and the optimizer state inherits the layout from the gradients. One
code path from TP=1 to TP=N; semantics are identical to the replicated run
(proven in ``tests/test_tp.py``).

Usage::

    mesh = make_mesh(data=2, seq=2, model=2)
    params = shard_params_tp(params, mesh)      # instead of replicate()
    ... same jitted train step ...
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["param_specs_tp", "shard_params_tp"]

# parameter leaves eligible for channel sharding: every stgx weight matrix
# ends in "...kernel" with C_out last (GraphConv/temporal/res/Dense), and its
# bias is a trailing (..., C_out) vector
_SHARDABLE_SUFFIXES = ("kernel", "bias", "scale", "embedding")


def _leaf_spec(path, leaf, size: int) -> P:
    name = str(path[-1].key) if path and hasattr(path[-1], "key") else ""
    if (
        hasattr(leaf, "dtype")
        and jnp.issubdtype(leaf.dtype, jnp.floating)
        and any(name.endswith(s) for s in _SHARDABLE_SUFFIXES)
        and leaf.ndim >= 1
        and leaf.shape[-1] % size == 0
        and leaf.shape[-1] >= size
    ):
        return P(*([None] * (leaf.ndim - 1)), "model")
    return P()


def param_specs_tp(params, mesh: Mesh):
    """PartitionSpec pytree sharding output channels over ``model``."""
    size = mesh.shape["model"]
    if size == 1:
        return jax.tree.map(lambda _: P(), params)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _leaf_spec(path, leaf, size), params
    )


def shard_params_tp(params, mesh: Mesh):
    """Place params with channels sharded over ``model`` (rest replicated
    over ``data``/``seq``). The classifier head's ``num_classes`` dim is
    usually indivisible and stays replicated — the rule is per-leaf."""
    specs = param_specs_tp(params, mesh)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs
    )
