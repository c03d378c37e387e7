"""Model zoo registry.

Mirrors the reference registry keys (/root/reference/models/__init__.py:11-20)
— including restoring the shift models the reference had to disable for lack
of its CUDA extension (stgx ships a Pallas shift kernel instead).
"""

from stgx.models.stgcn import Stgcn
from stgx.models.rtstgcn import RtStgcn
from stgx.models.costgcn import CoStgcn
from stgx.models.aagcn import AaGcn
from stgx.models.mstcn import MsTcn
from stgx.models.msgcn import MsGcn
from stgx.models.shiftgcn import ShiftGcn
from stgx.models.shiftgcn_plus import ShiftGcnPlus, ShiftGcnPlusTeacher

MODELS = {
    "st-gcn": Stgcn,
    "co-st-gcn": CoStgcn,
    "rt-st-gcn": RtStgcn,
    "ms-tcn": MsTcn,
    "ms-gcn": MsGcn,
    "aa-gcn": AaGcn,
    "shift-gcn": ShiftGcn,
    "shift-gcn++": ShiftGcnPlus,
    # the distillation teacher, trainable standalone — a shift-gcn++ run
    # points arch["shift-gcn++"]["teacher_checkpoint"] at its output (the
    # reference trains the teacher separately and loads it,
    # shiftgcn_plus.py:595-607)
    "shift-gcn++-teacher": ShiftGcnPlusTeacher,
}

__all__ = [
    "MODELS", "Stgcn", "RtStgcn", "CoStgcn", "AaGcn", "MsTcn", "MsGcn",
    "ShiftGcn", "ShiftGcnPlus", "ShiftGcnPlusTeacher",
]
