"""Device mesh construction for the ``(data, seq, model)`` GSPMD layout.

The reference's parallel mechanisms — DataParallel segment scattering and the
never-implemented DDP (SURVEY.md §2.bis) — collapse into sharding
annotations over this mesh: batch on ``data``, frames on ``seq``, channels
(tensor parallelism, optional) on ``model``. XLA inserts the gradient psums
and the temporal-conv halo exchanges; the same jitted step runs from one chip
to a multi-host slice (call ``jax.distributed.initialize`` first on
multi-host, then build the mesh over ``jax.devices()``).

The ``model`` axis doubles as the pipeline axis for stage-per-device
MS-TCN/MS-GCN refinement pipelining (``stgx/parallel/pipeline.py``).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate"]


def make_mesh(
    data: int | None = None, seq: int = 1, model: int = 1, devices=None
) -> Mesh:
    """Build a ``(data, seq, model)`` mesh.

    Args:
        data: size of the data axis; default = all devices / (seq · model).
        seq: size of the sequence axis (sequence parallelism degree).
        model: size of the model axis (tensor/pipeline parallelism degree).
        devices: device list override (defaults to ``jax.devices()``).
    """
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // (seq * model)
    if data * seq * model != len(devices):
        devices = devices[: data * seq * model]
    dev_array = mesh_utils.create_device_mesh(
        (data, seq, model), devices=np.asarray(devices)
    )
    return Mesh(dev_array, ("data", "seq", "model"))


def shard_batch(mesh: Mesh, x):
    """Place a ``(N, L, ...)`` batch with N over data and L over seq."""
    spec = P("data", "seq", *([None] * (x.ndim - 2)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params, opt state) over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))
