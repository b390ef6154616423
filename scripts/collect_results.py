#!/usr/bin/env python
"""Persist compact run artifacts from runs/<name> into results/<name>.

`runs/` is gitignored (checkpoints can be large and checkpoints alone are
re-derivable), but the *evidence* of a completed run — metric CSVs, the
config snapshot, summary/report CSVs, and small best checkpoints — must
survive across build sessions for verification. This copies everything
under a size cap into the committed `results/` tree.

Usage:
    python scripts/collect_results.py runs/ACDC_meanteacher [runs/...]
"""
from __future__ import annotations

import shutil
import sys
from pathlib import Path

SIZE_CAP = 24 * 1024 * 1024  # per-file cap: ENet ckpts are ~1.5-6 MB
KEEP_SUFFIXES = {".csv", ".yml", ".yaml", ".json", ".npy", ".txt", ".md", ".ckpt"}
SKIP_NAMES = {"last.ckpt"}  # resume-only payload (opt state); best_*.ckpt kept


def collect(run_dir: Path, out_root: Path = Path("results")) -> int:
    if not run_dir.is_dir():
        print(f"skip (not a dir): {run_dir}")
        return 0
    dest = out_root / run_dir.name
    n = 0
    for src in sorted(run_dir.rglob("*")):
        if not src.is_file():
            continue
        if src.suffix not in KEEP_SUFFIXES or src.name in SKIP_NAMES:
            continue
        if src.stat().st_size > SIZE_CAP:
            print(f"skip (too big): {src}")
            continue
        rel = src.relative_to(run_dir)
        target = dest / rel
        target.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, target)
        n += 1
    print(f"{run_dir} -> {dest}: {n} files")
    return n


if __name__ == "__main__":
    total = sum(collect(Path(a)) for a in sys.argv[1:])
    if not total:
        sys.exit("no files collected")
