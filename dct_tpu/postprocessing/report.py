"""Aggregate per-run ensemble CSVs into a ranked comparison table
(rebuild of ref:generalframework/postprocessing/report.py:16-79).

Walks ``folder/**/bsummary.csv`` (+ sibling div.csv), ranks experiments by
mean ensemble score, appends the kappa-diversity row and writes
``ensemble_results.csv`` / ``mean_score_results.csv``.
"""
from __future__ import annotations

import argparse
from pathlib import Path
from typing import Dict

import pandas as pd


def aggregate_ensemble_results(folder: str, file: str = "bsummary.csv"
                               ) -> Dict[str, pd.DataFrame]:
    folder_path = Path(folder)
    assert folder_path.exists(), folder_path
    file_list = sorted(folder_path.glob(f"**/{file}"))
    assert file_list, f"no {file} under {folder}"

    # name each run by its parent dir when unique, else by full path
    if len({f.parent.name for f in file_list}) == len(file_list):
        name_dict = {f.parent.name: f for f in file_list}
    else:
        name_dict = {str(f): f for f in file_list}

    kappa = {}
    for name, path in name_dict.items():
        div_path = path.parent / "div.csv"
        if div_path.exists():
            kappa[name] = float(pd.read_csv(div_path).mean(axis=1).values[0])
    kappa_row = pd.DataFrame(kappa, index=["kappa"])

    def build(table_of) -> pd.DataFrame:
        results = {}
        for name, path in name_dict.items():
            summary = pd.read_csv(path, index_col=0)
            results[name] = table_of(summary)
        df = pd.DataFrame(results)
        order = df.loc["mean_score"].sort_values(ascending=False)
        df = df[order.index]
        return pd.concat([df, kappa_row[order.index.intersection(kappa_row.columns)]],
                         sort=False)

    def ensemble_cols(summary: pd.DataFrame) -> pd.Series:
        cols = [c for c in summary.columns if c.startswith("ens_DSC")]
        s = summary.loc["mean", cols] if "mean" in summary.index \
            else summary[cols].mean()
        s["mean_score"] = s.mean()
        return s

    def average_cols(summary: pd.DataFrame) -> pd.Series:
        cols = [c for c in summary.columns if "_DSC" in c and not c.startswith("ens")]
        s = summary.loc["mean", cols] if "mean" in summary.index \
            else summary[cols].mean()
        s["mean_score"] = s.mean()
        return s

    ensemble = build(ensemble_cols)
    average = build(average_cols)
    ensemble.T.to_csv(folder_path / "ensemble_results.csv", float_format="%.4f")
    average.T.to_csv(folder_path / "mean_score_results.csv", float_format="%.4f")
    print("\nEnsemble score:\n", ensemble)
    print("\nAverage score:\n", average)
    return {"ensemble": ensemble, "average": average}


def main(argv=None):
    parser = argparse.ArgumentParser(description="aggregate run folders")
    parser.add_argument("--folder", type=str, required=True)
    parser.add_argument("--file", type=str, default="bsummary.csv")
    args = parser.parse_args(argv)
    return aggregate_ensemble_results(args.folder, args.file)


if __name__ == "__main__":
    main()
