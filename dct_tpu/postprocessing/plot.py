"""Learning-curve plots from metric CSV/npy dumps
(rebuild of ref:generalframework/postprocessing/plot.py / plot_cityscapes.py).

The TPU trainers dump tidy CSVs per run (metrics.csv / metrics_{s}.csv), so
curves plot straight from those; the reference's .npy path is supported too.
"""
from __future__ import annotations

import argparse
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd


def plot_learning_curves(folders: Sequence[str], file: str = "metrics.csv",
                         columns: Optional[List[str]] = None,
                         out: Optional[str] = None, y_lim=None,
                         smooth: int = 1, show: bool = False):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    colors = ["c", "r", "g", "b", "m", "y", "k", "chartreuse", "coral"]
    fig, ax = plt.subplots(figsize=(8, 5))
    for folder, color in zip(folders, colors):
        path = Path(folder) / file
        assert path.exists(), path
        if path.suffix == ".csv":
            df = pd.read_csv(path, index_col=0)
        else:
            arr = np.load(path)
            df = pd.DataFrame(arr.reshape(arr.shape[0], -1))
            df.columns = [str(c) for c in df.columns]
        cols = columns or [c for c in df.columns if "dice" in c.lower()]
        for i, col in enumerate(cols):
            if col not in df.columns:
                continue
            y = df[col].rolling(smooth, min_periods=1).mean() if smooth > 1 else df[col]
            ax.plot(df.index, y, color=color, linestyle=["-", "--", ":", "-."][i % 4],
                    label=f"{Path(folder).name}:{col}")
    ax.set_xlabel("epoch")
    ax.grid(True, alpha=0.3)
    if y_lim:
        ax.set_ylim(y_lim)
    ax.legend(fontsize=7)
    fig.tight_layout()
    out = out or str(Path(folders[0]) / "learning_curves.png")
    fig.savefig(out, dpi=120)
    if show:
        plt.show()
    plt.close(fig)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--folders", nargs="+", required=True)
    parser.add_argument("--file", default="metrics.csv")
    parser.add_argument("--columns", nargs="*", default=None)
    parser.add_argument("--out", default=None)
    parser.add_argument("--y_lim", nargs=2, type=float, default=None)
    parser.add_argument("--smooth", type=int, default=1)
    args = parser.parse_args(argv)
    return plot_learning_curves(args.folders, args.file, args.columns,
                                args.out, args.y_lim, args.smooth)


if __name__ == "__main__":
    main()
