"""Optional per-sample metadata generators
(rebuild of ref:generalframework/dataset/metainfoGenerator.py:9-32).

The mean-teacher trainer's 'original image' channel (ref getImage_GT usage,
ref:config/ACDC_meanteacher_config.yaml:6-9) is structural in the TPU rebuild
(the step always gathers the original batch and augments on device), so these
generators exist for API parity and for class-size statistics.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


class classSizeCalulator:
    """One-hot class pixel counts per sample (ref:metainfoGenerator.py:9-21).
    (Name kept reference-spelled.)"""

    def __init__(self, C: int, foldernames: Sequence[str] = ("gt",)) -> None:
        self.C = C
        self.foldernames = list(foldernames)

    def __call__(self, gt: np.ndarray) -> np.ndarray:
        gt = np.asarray(gt)
        return np.bincount(gt.reshape(-1).astype(np.int64),
                           minlength=self.C)[:self.C]


class getImage_GT:
    """Identity passthrough of the un-augmented (img, gt) pair
    (ref:metainfoGenerator.py:24-32)."""

    def __init__(self, foldernames: Sequence[str] = ("img", "gt")) -> None:
        self.foldernames = list(foldernames)

    def __call__(self, x):
        return x


def get_metainfo_generator(name: str, **kwargs):
    registry = {"classSizeCalulator": classSizeCalulator,
                "getImage_GT": getImage_GT}
    return registry[name](**kwargs)
