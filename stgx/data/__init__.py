"""Data layer: skeleton datasets, offline converters, synthetic data."""

from stgx.data.dataset import (  # noqa: F401
    SkeletonDirDataset,
    SkeletonFileDataset,
    class_distribution,
    load_actions,
)
from stgx.data.prefetch import PrefetchedDataset  # noqa: F401
