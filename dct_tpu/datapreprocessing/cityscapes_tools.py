"""Cityscapes offline preprocessing: parallel resize + label remap
(rebuild of ref:generalframework/datapreprocessing/{resize_image,
cityscapes_target_remap}.py).

The online pipeline (dct_tpu.data.cityscapes) resizes/remaps at load, so these
exist for the reference's offline workflow: bake a resized tree once and train
from it.
"""
from __future__ import annotations

import argparse
from multiprocessing import Pool
from pathlib import Path
from typing import Tuple

import numpy as np
from PIL import Image

from ..data.cityscapes import encode_segmap


def _resize_one(args) -> str:
    src, dst, size, is_label, remap = args
    img = Image.open(src)
    resample = Image.NEAREST if is_label else Image.BILINEAR
    img = img.resize((size[1], size[0]), resample)
    if is_label and remap:
        img = Image.fromarray(encode_segmap(np.asarray(img)))
    Path(dst).parent.mkdir(parents=True, exist_ok=True)
    img.save(dst)
    return dst


def resize_tree(source: str, dest: str, size: Tuple[int, int] = (512, 1024),
                workers: int = 4, remap_labels: bool = True) -> int:
    """Mirror ``source`` PNG tree into ``dest`` at ``size`` (H,W); gtFine
    labelIds get NEAREST + 19-class remap, images get BILINEAR."""
    source_p = Path(source)
    jobs = []
    for src in source_p.rglob("*.png"):
        rel = src.relative_to(source_p)
        is_label = "gtFine" in str(rel) and "labelIds" in src.name
        jobs.append((str(src), str(Path(dest) / rel), size, is_label,
                     remap_labels))
    if workers > 1:
        with Pool(workers) as pool:
            done = pool.map(_resize_one, jobs)
    else:
        done = [_resize_one(j) for j in jobs]
    return len(done)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--source", required=True)
    parser.add_argument("--dest", required=True)
    parser.add_argument("--size", type=int, nargs=2, default=[512, 1024])
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--no_remap", action="store_true")
    args = parser.parse_args(argv)
    n = resize_tree(args.source, args.dest, tuple(args.size), args.workers,
                    not args.no_remap)
    print(f"resized {n} images into {args.dest}")


if __name__ == "__main__":
    main()
