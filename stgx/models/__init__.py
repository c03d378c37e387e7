"""Model zoo registry.

Mirrors the reference registry keys (/root/reference/models/__init__.py:11-20)
— including restoring the shift models the reference had to disable for lack
of its CUDA extension (stgx ships a Pallas shift kernel instead).
"""

from stgx.models.stgcn import Stgcn
from stgx.models.rtstgcn import RtStgcn

MODELS = {
    "st-gcn": Stgcn,
    "rt-st-gcn": RtStgcn,
}

__all__ = ["MODELS", "Stgcn", "RtStgcn"]
