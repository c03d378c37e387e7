"""Per-layer rematerialization wrappers (``jax.checkpoint`` via flax lift).

Long trials make activation memory the binding constraint on TPU HBM: a
9-layer ST-GCN stack over an L-frame trial holds O(9·L·V·C) activations for
the backward pass. Wrapping each layer in ``nn.remat`` stores only layer
boundaries and recomputes the interior during the backward sweep — the
standard TPU FLOPs-for-HBM trade (models opt in via their ``remat`` field,
config key ``arch.remat``).

The wrappers bake ``train=True`` (remat is pointless at eval, and a traced
python bool would break ``nn.Dropout``'s ``deterministic`` flag); callers
only route through them when ``remat and train``. Gradients match
the unremat'd path up to fp32 reassociation — pinned by tests/test_remat.py.
"""

from __future__ import annotations

from flax import linen as nn

__all__ = ["gcn_layer", "unit", "unit_epoch", "seq_layer"]


@nn.remat
def gcn_layer(layer, x, A, mask):
    """Layers called as ``layer(x, A, train=, mask=)`` (st-gcn family)."""
    return layer(x, A, train=True, mask=mask)


@nn.remat
def unit(layer, x, mask):
    """Layers called as ``layer(x, train=, mask=)`` (shift-gcn units)."""
    return layer(x, train=True, mask=mask)


@nn.remat
def unit_epoch(layer, x, epoch, mask):
    """Shift-GCN++ student units carrying the annealing epoch."""
    return layer(x, epoch, train=True, mask=mask)


@nn.remat
def seq_layer(layer, x):
    """Layers called as ``layer(x, train=)`` (MS-TCN dilated residuals)."""
    return layer(x, train=True)
