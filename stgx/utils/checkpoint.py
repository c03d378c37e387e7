"""Checkpoint/resume: ``{epoch, params, opt_state}`` via Orbax.

Same lifecycle as the reference (/root/reference/processor.py:325-343,
582-587): save at every configured epoch index plus ``final``, resume from
``state['epoch'] + 1`` with both model and optimizer state restored. Orbax
restores sharded trees natively, which is the multi-chip-aware part the
reference never had.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp
from jax.sharding import NamedSharding, PartitionSpec

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_epoch"]


def _ckptr():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(save_dir: str, epoch, params, opt_state, name=None):
    """Write ``{save_dir}/epoch-{N}`` (or ``{name}``)."""
    path = os.path.join(
        os.path.abspath(save_dir), name if name else f"epoch-{epoch}"
    )
    _ckptr().save(
        path,
        {"epoch": epoch, "params": params, "opt_state": opt_state},
        force=True,
    )
    return path


def restore_checkpoint(path: str, params_like, opt_state_like):
    """Restore with the given abstract targets (handles shardings/dtypes).

    When the template leaves are sharded ``jax.Array``s (e.g. TP-sharded
    params on a ``(data, seq, model)`` mesh), restore places each leaf with
    the template's sharding — authoritative over whatever topology the
    checkpoint was saved on, so a checkpoint written on N chips restores
    onto M (the multi-chip resume the reference never had,
    /root/reference/processor.py:325-343). Round-trip proven in
    ``tests/test_checkpoint_sharded.py``.
    """
    target = {
        "epoch": 0,
        "params": params_like,
        "opt_state": opt_state_like,
    }
    restore_args = ocp.checkpoint_utils.construct_restore_args(target)
    restored = _ckptr().restore(
        os.path.abspath(path), item=target, restore_args=restore_args
    )

    # orbax returns *committed* arrays; a template leaf that was uncommitted
    # (e.g. opt scalars from a plain ``opt.init``) comes back pinned to one
    # device, which then clashes with mesh-sharded params at dispatch. Put
    # NamedSharding leaves where the template says; replicate the rest over
    # the template's mesh (if any).
    mesh = next(
        (
            l.sharding.mesh
            for l in jax.tree.leaves((params_like, opt_state_like))
            if isinstance(getattr(l, "sharding", None), NamedSharding)
        ),
        None,
    )

    def _place(val, like):
        sh = getattr(like, "sharding", None)
        if isinstance(sh, NamedSharding):
            return jax.device_put(val, sh)
        if mesh is not None and hasattr(val, "dtype"):
            return jax.device_put(val, NamedSharding(mesh, PartitionSpec()))
        return val

    return (
        restored["epoch"],
        jax.tree.map(_place, restored["params"], params_like),
        jax.tree.map(_place, restored["opt_state"], opt_state_like),
    )


def restore_params(path: str, params_like):
    """Restore only the model params subtree (e.g. for inference/benchmark,
    where the optimizer state template may not match how it was trained).

    Restores the raw checkpoint tree and grafts the ``params`` subtree onto
    the given template's structure.
    """
    raw = _ckptr().restore(os.path.abspath(path))
    flat_new = jax.tree.leaves(raw["params"])
    treedef = jax.tree.structure(params_like)
    if treedef.num_leaves != len(flat_new):
        raise ValueError(
            f"checkpoint params have {len(flat_new)} leaves, "
            f"template expects {treedef.num_leaves}"
        )
    return jax.tree.unflatten(treedef, flat_new)


def latest_epoch(save_dir: str) -> str | None:
    """Most recent ``epoch-N`` checkpoint directory, or None."""
    if not os.path.isdir(save_dir):
        return None
    epochs = []
    for d in os.listdir(save_dir):
        if d.startswith("epoch-"):
            try:
                epochs.append((int(d.split("-")[1]), d))
            except ValueError:
                continue
    if not epochs:
        return None
    return os.path.join(save_dir, max(epochs)[1])
