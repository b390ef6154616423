"""Shared test fixtures: tiny synthetic ACDC-style PNG tree."""
from pathlib import Path

import numpy as np
from PIL import Image


def make_synthetic_acdc(root: Path, n_train_patients: int = 10,
                        n_val_patients: int = 3, slices_per_patient: int = 4,
                        size: int = 32, n_classes: int = 4, seed: int = 0) -> Path:
    """Build root/{train,val}/{img,gt}/patientXXX_YY_Z_S.png.

    gt is a set of concentric rings whose radius is patient-dependent; img is
    a noisy rendering of gt so a segmenter can actually learn the mapping.
    """
    rs = np.random.RandomState(seed)
    root = Path(root)
    for mode, n_pat, first in (("train", n_train_patients, 1),
                               ("val", n_val_patients, 1)):
        img_dir = root / mode / "img"
        gt_dir = root / mode / "gt"
        img_dir.mkdir(parents=True, exist_ok=True)
        gt_dir.mkdir(parents=True, exist_ok=True)
        for p in range(first, first + n_pat):
            for s in range(slices_per_patient):
                yy, xx = np.mgrid[0:size, 0:size]
                cy, cx = size / 2 + rs.randint(-3, 4), size / 2 + rs.randint(-3, 4)
                r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
                gt = np.zeros((size, size), np.uint8)
                for c in range(1, n_classes):
                    gt[r < size * (0.4 - 0.1 * (c - 1))] = c
                img = (gt.astype(np.float32) / (n_classes - 1) * 180
                       + rs.randn(size, size) * 12 + 40).clip(0, 255).astype(np.uint8)
                stem = f"patient{p:03d}_01_0_{s}"
                Image.fromarray(img).save(img_dir / f"{stem}.png")
                Image.fromarray(gt).save(gt_dir / f"{stem}.png")
    return root
