"""Strategy plug-ins and support utilities.

Per-model strategy registries mirroring the reference's extension point
(/root/reference/utils/__init__.py:7-38): every model key maps to a Loss /
Statistics flavor; segmentation strategies live in stgx.parallel.segments.
"""

from stgx.utils.loss import Loss, LossMultiStage
from stgx.utils.statistics import Statistics, StatisticsMultiStage

LOSS = {
    "st-gcn": Loss,
    "co-st-gcn": Loss,
    "rt-st-gcn": Loss,
    "ms-tcn": LossMultiStage,
    "ms-gcn": LossMultiStage,
    "aa-gcn": Loss,
    "shift-gcn": Loss,
    "shift-gcn++": Loss,
    "shift-gcn++-teacher": Loss,
}

STATISTICS = {
    "st-gcn": Statistics,
    "co-st-gcn": Statistics,
    "rt-st-gcn": Statistics,
    "ms-tcn": StatisticsMultiStage,
    "ms-gcn": StatisticsMultiStage,
    "aa-gcn": Statistics,
    "shift-gcn": Statistics,
    "shift-gcn++": Statistics,
    "shift-gcn++-teacher": Statistics,
}

__all__ = ["LOSS", "STATISTICS", "Loss", "LossMultiStage", "Statistics",
           "StatisticsMultiStage"]
