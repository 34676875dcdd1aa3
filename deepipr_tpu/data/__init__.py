"""Data pipeline."""

from deepipr_tpu.data.datasets import (
    CyclingIterator,
    DataLoader,
    prepare_dataset,
    prepare_wm,
    synthetic_dataset,
)

__all__ = [
    "CyclingIterator",
    "DataLoader",
    "prepare_dataset",
    "prepare_wm",
    "synthetic_dataset",
]
