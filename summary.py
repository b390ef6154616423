#!/usr/bin/env python
"""Ensemble evaluation of a co-training run (parity with ref:/root/reference/Summary.py).

Loads every ``best_*.ckpt`` from a run directory (checkpoints are
self-describing: arch/optim/scheduler dicts embedded), re-runs the val set
patient-by-patient, and reports:

* per-model 2D (per-slice) and 3D (per-patient) dice,
* soft-vote (mean probs) and hard-vote (pixelwise majority) ensemble dice
  (ref:Summary.py:100-120),
* Hausdorff distance per patient (voxel spacing from ``patient_info.csv``
  when present, ref:Summary.py:156-157),
* inter-model diversity: Cohen's kappa of each model vs the ensemble vote on
  the foreground classes (ref:Summary.py:171-172).

Outputs: ``summary.csv`` (2D), ``bsummary.csv`` (3D + Hausdorff),
``div.csv`` (kappa) in the run dir.

Usage:
    python summary.py --input_dir runs/exp [--ensemble_method soft|hard]
        [--dataset_root path] [--axises 1 2 3]
"""
from __future__ import annotations

import argparse
from pathlib import Path
from typing import Dict, List

import numpy as np
import pandas as pd


def hausdorff_distance(a: np.ndarray, b: np.ndarray, spacing=None) -> float:
    """Symmetric Hausdorff distance between two binary masks (2D/3D),
    via distance transforms (ref uses deepclustering's metric; same def)."""
    from scipy.ndimage import distance_transform_edt

    a = a.astype(bool)
    b = b.astype(bool)
    if not a.any() and not b.any():
        return 0.0
    if not a.any() or not b.any():
        return float("nan")
    dt_b = distance_transform_edt(~b, sampling=spacing)
    dt_a = distance_transform_edt(~a, sampling=spacing)
    return float(max(dt_b[a].max(), dt_a[b].max()))


def soft_voting(probs: np.ndarray) -> np.ndarray:
    """(K,L,H,W,C) probs → (L,H,W) class map by mean prob (ref:Summary.py:100-108)."""
    return probs.mean(0).argmax(-1)


def hard_voting(probs: np.ndarray) -> np.ndarray:
    """(K,L,H,W,C) probs → (L,H,W) pixelwise majority vote of per-model argmax
    (ref:Summary.py:110-120); ties resolve to the smallest class id."""
    K, L, H, W, C = probs.shape
    votes = probs.argmax(-1)                     # (K,L,H,W)
    counts = np.zeros((C, L, H, W), np.int32)
    for c in range(C):
        counts[c] = (votes == c).sum(0)
    return counts.argmax(0)


def dice_from_class_maps(pred: np.ndarray, gt: np.ndarray, C: int,
                         per_slice: bool) -> np.ndarray:
    """Hard dice from (L,H,W) class maps: (L,C) if per_slice else (C,)."""
    axes = (1, 2) if per_slice else (0, 1, 2)
    out = []
    for c in range(C):
        p = (pred == c).astype(np.float64)
        g = (gt == c).astype(np.float64)
        inter = (p * g).sum(axis=axes)
        sums = p.sum(axis=axes) + g.sum(axis=axes)
        out.append((2 * inter + 1e-8) / (sums + 1e-8))
    return np.stack(out, axis=-1)


def main(argv=None) -> Dict[str, pd.DataFrame]:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--ensemble_method", default="soft", choices=["soft", "hard"])
    parser.add_argument("--dataset_root", default=None,
                        help="override Dataset.root_dir from the run config")
    parser.add_argument("--axises", "--kappa_considered_class", dest="axises",
                        nargs="+", type=int, default=[1, 2, 3])
    parser.add_argument("--patient_info", default=None,
                        help="csv with per-patient voxel spacing for Hausdorff")
    args = parser.parse_args(argv)

    import jax

    from dct_tpu.checkpoint import load_checkpoint
    from dct_tpu.config import load_yaml
    from dct_tpu.data.dataset import MedicalImageDataset, parse_transform_size
    from dct_tpu.data.pipeline import DeviceDataset, PatientBuckets
    from dct_tpu.metrics import KappaMetrics
    from dct_tpu.models import Segmentator

    run_dir = Path(args.input_dir)
    config = load_yaml(run_dir / "config.yml")
    ckpts = sorted(run_dir.glob("best_*.ckpt")) or sorted(run_dir.glob("best.ckpt"))
    assert ckpts, f"no best checkpoints under {run_dir}"
    print(f"found {len(ckpts)} checkpoints: {[c.name for c in ckpts]}")

    ds_cfg = dict(config["Dataset"])
    root = args.dataset_root or ds_cfg.pop("root_dir")
    ds_cfg.pop("root_dir", None)
    name = ds_cfg.pop("name", None)
    if name == "gm":
        # GM has no val/ folder — the val set is the site3/site4 slice of
        # train (ref:GM_helper.py:34-60); rebuild it via the split builder
        from dct_tpu.data.splits import get_gmc_split_datasets
        cfg = {**config, "Dataset": {**config["Dataset"], "root_dir": root}}
        _, _, val_set = get_gmc_split_datasets(cfg)
    else:
        val_set = MedicalImageDataset(root, "val", **{**ds_cfg, "quite": True})
    h, w = parse_transform_size(config["Dataset"].get("transform"))

    segs: List[Segmentator] = []
    for i, p in enumerate(ckpts):
        sd = load_checkpoint(p)["segmentator"]
        sd.setdefault("scheduler_state_dict", {"epoch": 0})
        seg = Segmentator(sd["arch_dict"], sd["optim_dict"], sd["scheduler_dict"],
                          jax.random.PRNGKey(i), input_shape=(1, h, w, 1))
        seg.state["params"] = sd["net_state_dict"]
        seg.state["batch_stats"] = sd["batch_stats"]
        segs.append(seg)
    C = segs[0].arch_params["num_classes"]

    grp_regex = r"(patient\d+_\d+)_\d+"
    bs_cfg = config.get("Lab_Dataloader", {}).get("batch_sampler")
    if bs_cfg:
        grp_regex = bs_cfg[1]["grp_regex"]
    buckets = PatientBuckets(val_set, grp_regex)
    dev = DeviceDataset(val_set)

    spacing_by_patient = {}
    info_path = args.patient_info or Path(root, "patient_info.csv")
    if Path(info_path).exists():
        # headerless csv: patientXXX,<in-plane voxel spacing scalar>
        # (ref:Summary.py:48,156 passes the scalar as voxelspacing)
        info = pd.read_csv(info_path, header=None, index_col=0)
        for pid, rowi in info.iterrows():
            spacing_by_patient[str(pid)] = float(rowi.values[0])

    import jax.numpy as jnp

    from dct_tpu.models import stack_states
    from dct_tpu.train.steps import make_summary_step
    from dct_tpu.utils.general import save_images

    K = len(segs)
    # ---- ONE jit call for all P patients × K models (steps.py:
    # make_summary_step); only uint8 class maps + dice tensors come back ----
    stacked = stack_states([{"params": s.state["params"],
                             "batch_stats": s.state["batch_stats"]}
                            for s in segs])
    step = make_summary_step(segs[0], C, ensemble=args.ensemble_method)
    out = step(stacked["params"], stacked["batch_stats"], dev.img, dev.gt,
               jnp.asarray(buckets.indices), jnp.asarray(buckets.mask))
    preds = np.asarray(out["pred"])          # (P,K,L,H,W) uint8
    ens_preds = np.asarray(out["ens"])       # (P,L,H,W) uint8
    dice2d = np.asarray(out["dice2d"])       # (P,K,L,C)
    dice3d = np.asarray(out["dice3d"])       # (P,K,C)
    ens_dice2d = np.asarray(out["ens_dice2d"])   # (P,L,C)
    ens_dice3d = np.asarray(out["ens_dice3d"])   # (P,C)

    kappa_meter = KappaMetrics()
    rows2d, rows3d = [], []
    # per-slice / per-patient raw logs (ref:Summary.py:248-252)
    logs2d: List[List[np.ndarray]] = [[] for _ in range(K + 1)]
    for p in range(len(buckets)):
        mask = buckets.mask[p]
        name = buckets.patients[p]
        idx = buckets.indices[p][mask]
        gt = val_set.data["gt"][idx].astype(np.int64)
        model_preds = preds[p][:, mask]      # (K,L,H,W)
        ens = ens_preds[p][mask]
        kappa_meter.add(list(model_preds), ens, considered_classes=args.axises)

        slice_names = [val_set.filenames[i] for i in idx]
        for s in range(K):
            save_images(model_preds[s], slice_names, run_dir, "val", 1000, str(s))
            logs2d[s].append(dice2d[p, s][mask])
        save_images(ens, slice_names, run_dir, "val", 1000, "voting")
        logs2d[K].append(ens_dice2d[p][mask])

        spacing = spacing_by_patient.get(name.split("_")[0])
        row2d, row3d = {"patient": name}, {"patient": name}
        for s in range(K):
            for i in args.axises:
                row2d[f"S{s}_DSC{i}"] = dice2d[p, s][mask, i].mean()
                row3d[f"S{s}_DSC{i}"] = dice3d[p, s, i]
            row3d[f"S{s}_HD"] = np.nanmean([
                hausdorff_distance(model_preds[s] == i, gt == i, spacing)
                for i in args.axises])
        for i in args.axises:
            row2d[f"ens_DSC{i}"] = ens_dice2d[p][mask, i].mean()
            row3d[f"ens_DSC{i}"] = ens_dice3d[p, i]
        row3d["ens_HD"] = np.nanmean([hausdorff_distance(ens == i, gt == i, spacing)
                                      for i in args.axises])
        rows2d.append(row2d)
        rows3d.append(row3d)
        print(f"  {name}: ens 3D fg dice "
              f"{np.mean([ens_dice3d[p, i] for i in args.axises]):.4f}")

    summary = pd.DataFrame(rows2d).set_index("patient")
    bsummary = pd.DataFrame(rows3d).set_index("patient")
    div = pd.DataFrame([kappa_meter.summary()])
    summary.loc["mean"] = summary.mean()
    bsummary.loc["mean"] = bsummary.mean()
    summary.to_csv(run_dir / "summary.csv", float_format="%.4f")
    bsummary.to_csv(run_dir / "bsummary.csv", float_format="%.4f")
    div.to_csv(run_dir / "div.csv", float_format="%.4f", index=False)

    # ---- reference-format std tables + raw per-slice/per-patient logs
    # (ref:Summary.py:199-252) --------------------------------------------
    cols = {f"model_{s}": s for s in range(K)}
    names2d = {**{"ensemble": K}, **cols}
    all2d = [np.concatenate(logs2d[i], axis=0) for i in range(K + 1)]  # (ΣL,C)
    summary_std = pd.DataFrame(
        {nm: {f"DSC{c}": all2d[i][:, c].std() for c in range(C)}
         for nm, i in names2d.items()})
    summary_std.to_csv(run_dir / "summary_std.csv", float_format="%.4f")
    d3_all = {**{"ensemble": ens_dice3d}, **{f"model_{s}": dice3d[:, s]
                                             for s in range(K)}}
    bsummary_std = pd.DataFrame(
        {nm: {f"DSC{c}": v[:, c].std() for c in range(C)}
         for nm, v in d3_all.items()})
    bsummary_std.to_csv(run_dir / "bsummary_std.csv", float_format="%.4f")

    pd.DataFrame(all2d[K]).to_csv(run_dir / "log_2Ddice_ensemble.csv")
    pd.DataFrame(ens_dice3d).to_csv(run_dir / "log_3Ddice_ensemble.csv")
    for s in range(K):
        pd.DataFrame(all2d[s]).to_csv(run_dir / f"log_2Ddice_model_{s}.csv")
        pd.DataFrame(dice3d[:, s]).to_csv(run_dir / f"log_3Ddice_model_{s}.csv")
    print(f"wrote {run_dir}/summary.csv, bsummary.csv, div.csv, *_std.csv, "
          f"log_{{2,3}}Ddice_*.csv, iter1000/val PNGs")
    print(bsummary.loc["mean"].to_string())
    return {"summary": summary, "bsummary": bsummary, "div": div,
            "summary_std": summary_std, "bsummary_std": bsummary_std}


if __name__ == "__main__":
    main()
