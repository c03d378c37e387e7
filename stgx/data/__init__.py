"""Data layer: skeleton datasets, offline converters, synthetic data."""

import os

from stgx.data.dataset import (  # noqa: F401
    SkeletonDirDataset,
    SkeletonFileDataset,
    class_distribution,
    load_actions,
)
from stgx.data.prefetch import PrefetchedDataset  # noqa: F401


def build_datasets(proc: dict):
    """``(train_ds, val_ds)`` from a ``processor`` config group.

    ``dataset_type: "file"`` selects the single-mmap'd-file layout
    ({data}/{split}_data.npy + {split}_label.pkl — the intended behavior of
    the reference's bitrotted file path, SURVEY.md §5.9); the default ``dir``
    layout is per-trial .npy/.csv (reference processor.py:61-84).
    """
    data_dir = proc["data"]
    if proc.get("dataset_type", "dir") == "file":
        return (
            SkeletonFileDataset(
                os.path.join(data_dir, "train_data.npy"),
                os.path.join(data_dir, "train_label.pkl"),
            ),
            SkeletonFileDataset(
                os.path.join(data_dir, "val_data.npy"),
                os.path.join(data_dir, "val_label.pkl"),
            ),
        )
    return (
        SkeletonDirDataset(
            os.path.join(data_dir, "train", "features"),
            os.path.join(data_dir, "train", "labels"),
        ),
        SkeletonDirDataset(
            os.path.join(data_dir, "val", "features"),
            os.path.join(data_dir, "val", "labels"),
        ),
    )
