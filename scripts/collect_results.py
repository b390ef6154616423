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
REPO_ROOT = Path(__file__).resolve().parents[1]


def _is_resume_only(name: str) -> bool:
    # last.ckpt plus the city co-trainer's per-model last_0.ckpt/last_1.ckpt
    # (dct_tpu/train/city.py) — resume-only payloads; best_*.ckpt kept.
    return name == "last.ckpt" or (name.startswith("last_") and name.endswith(".ckpt"))


def collect(run_dir: Path, out_root: Path = REPO_ROOT / "results") -> int:
    if not run_dir.is_dir():
        print(f"skip (not a dir): {run_dir}")
        return 0
    dest = out_root / run_dir.name
    # Mirror deletions in the run dir (e.g. mean_teacher prunes superseded
    # best_*.ckpt): clear the destination so stale copies don't accumulate.
    shutil.rmtree(dest, ignore_errors=True)
    n = 0
    for src in sorted(run_dir.rglob("*")):
        if not src.is_file():
            continue
        if src.suffix not in KEEP_SUFFIXES or _is_resume_only(src.name):
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
