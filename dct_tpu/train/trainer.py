"""Supervised Trainer — the baseline epoch loop (ref:generalframework/trainer/trainer.py:51-230).

Flow parity: per epoch, a train pass then an eval pass; per-slice 2D dice on
both, per-patient 3D dice at eval; CSV + .npy metric dumps every epoch;
best-checkpoint keyed on mean foreground val 2D dice (ref:trainer.py:144,208-216);
resumable (ref:trainer.py:83-91).

TPU shape: the whole train pass is ONE jit call (scan over batches on
device-resident data); eval runs one jit call per patient bucket. Host code
only shuffles indices, aggregates small arrays and writes files.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Dict, List, Optional, Union

import jax
import numpy as np
import pandas as pd

from .. import ModelMode
from ..checkpoint import load_checkpoint, save_checkpoint
from ..config import save_yaml
from ..utils.logging import resume_records
from ..data.dataset import MedicalImageDataset
from ..data.pipeline import DeviceDataset, EpochBatcher, PatientBuckets
from ..models.segmentator import Segmentator
from ..utils.general import check_finite_losses, save_images
from .steps import make_eval_all_step, make_eval_patient_step, make_supervised_epoch

DEFAULT_GRP_REGEX = r"(patient\d+_\d+)_\d+"


class Trainer:
    def __init__(self, segmentator: Segmentator,
                 datasets: Dict[str, MedicalImageDataset],
                 criterion: Callable,
                 max_epoch: int = 100,
                 save_dir: Union[str, Path] = "tmp",
                 axises: Optional[List[int]] = None,
                 checkpoint: Optional[str] = None,
                 metricname: str = "metrics.csv",
                 batch_size: int = 4,
                 grp_regex: str = DEFAULT_GRP_REGEX,
                 seed: int = 1234,
                 whole_config: Optional[dict] = None,
                 nan_policy: str = "warn",
                 mesh=None) -> None:
        self.segmentator = segmentator
        self.criterion = criterion
        self.max_epoch = max_epoch
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        if whole_config:
            save_yaml(whole_config, self.save_dir / "config.yml")
        self.C = segmentator.arch_params["num_classes"]
        self.axises = axises if axises is not None else list(range(1, self.C))
        self.metricname = metricname
        self.batch_size = batch_size
        self.best_score = -1.0
        self.start_epoch = 0
        self.seed = seed
        self.rs = np.random.RandomState(seed)
        self.root_key = jax.random.PRNGKey(seed)

        # optional GSPMD data parallelism: batch indices sharded over the
        # mesh 'data' axis, params/data replicated — the partitioner inserts
        # the gradient psum (the DataParallel the reference applies to EVERY
        # trainer's model, ref:models/segmentators.py:34-36)
        self.nan_policy = nan_policy
        self.mesh = mesh
        rep = None
        if mesh is not None:
            assert mesh.shape.get("model", 1) == 1, \
                "supervised Trainer is single-model: use a data-only mesh"
            assert batch_size % mesh.shape["data"] == 0, \
                (batch_size, dict(mesh.shape))
            from ..parallel.mesh import place_replicated
            self.segmentator.state = place_replicated(mesh, self.segmentator.state)
            from jax.sharding import NamedSharding, PartitionSpec
            rep = NamedSharding(mesh, PartitionSpec())

        self.train_set = datasets["train"]
        self.val_set = datasets["val"]
        self.train_dev = DeviceDataset(self.train_set, sharding=rep)
        self.val_dev = DeviceDataset(self.val_set, sharding=rep)
        self.batcher = EpochBatcher(len(self.train_set), batch_size)
        self.val_buckets = PatientBuckets(self.val_set, grp_regex)
        self.eval_step = make_eval_patient_step(segmentator, self.C)
        self.eval_all = make_eval_all_step(segmentator, self.C)
        self._epoch_fns: Dict[bool, Callable] = {}

        if checkpoint is not None:
            self._load_checkpoint(checkpoint)

    # ------------------------------------------------------------------
    def _epoch_fn(self, augment: bool) -> Callable:
        if augment not in self._epoch_fns:
            self._epoch_fns[augment] = make_supervised_epoch(
                self.segmentator, self.criterion, self.C, augment)
        return self._epoch_fns[augment]

    def start_training(self, save_train: bool = False, save_val: bool = False,
                       augment_labeled_data: bool = False) -> pd.DataFrame:
        records = resume_records(self.save_dir / self.metricname, self.start_epoch)
        for epoch in range(self.start_epoch, self.max_epoch):
            t0 = time.time()
            train_metrics = self._train_epoch(epoch, augment_labeled_data)
            check_finite_losses({"train": train_metrics["loss"]}, epoch,
                                self.nan_policy)
            t_eval0 = time.time()
            val_metrics = self._eval_epoch(epoch, save_val)
            t_eval = time.time() - t_eval0
            self.segmentator.scheduler_step()
            step_time = time.time() - t0

            row = {"epoch": epoch,
                   **{f"train_dice_{i}": train_metrics["dice_per_class"][i]
                      for i in self.axises},
                   **{f"val_dice_{i}": val_metrics["dice2d_per_class"][i]
                      for i in self.axises},
                   **{f"val_batch_dice_{i}": val_metrics["dice3d_per_class"][i]
                      for i in self.axises},
                   "train_loss": train_metrics["loss"],
                   "val_loss": val_metrics["loss"],
                   "images_per_sec": train_metrics["n_images"] / max(
                       train_metrics["train_time"], 1e-9),
                   "t_train": train_metrics["train_time"],
                   "t_eval": t_eval}
            records.append(row)
            df = pd.DataFrame(records).set_index("epoch")
            df.to_csv(self.save_dir / self.metricname, float_format="%.4f")
            np.save(self.save_dir / "val_dice.npy", df.filter(like="val_dice").values)
            np.save(self.save_dir / "train_dice.npy", df.filter(like="train_dice").values)

            current = float(np.mean([val_metrics["dice2d_per_class"][i]
                                     for i in self.axises]))
            self.checkpoint(current, epoch)
            print(f">> epoch {epoch}: val fg 2D dice {current:.4f}  "
                  f"(3D {np.mean([val_metrics['dice3d_per_class'][i] for i in self.axises]):.4f})  "
                  f"loss {val_metrics['loss']:.4f}  [{step_time:.1f}s]")
        return pd.DataFrame(records)

    # ------------------------------------------------------------------
    def _train_epoch(self, epoch: int, augment: bool) -> Dict:
        idx = self.batcher.epoch(self.rs)
        if self.mesh is not None:
            from ..parallel.mesh import dp_shard_idx
            idx = dp_shard_idx(self.mesh, idx)
        key = jax.random.fold_in(self.root_key, epoch)
        lr = self.segmentator.lr(epoch)
        t0 = time.time()
        new_state, metrics = self._epoch_fn(augment)(
            self.segmentator.state, self.train_dev.img, self.train_dev.gt,
            idx, key, lr)
        self.segmentator.state = new_state
        dice = np.asarray(metrics["dice"])   # (T,B,C)
        loss = float(np.mean(np.asarray(metrics["loss"])))
        train_time = time.time() - t0
        return {"dice_per_class": dice.reshape(-1, self.C).mean(0),
                "loss": loss, "n_images": idx.size, "train_time": train_time}

    def _eval_epoch(self, epoch: int, save: bool = False) -> Dict:
        params = self.segmentator.state["params"]
        bs = self.segmentator.state["batch_stats"]
        if save:  # slow path: per-patient calls that materialize predictions
            for p in range(len(self.val_buckets)):
                idx = self.val_buckets.indices[p]
                mask = self.val_buckets.mask[p]
                out = self.eval_step(params, bs, self.val_dev.img,
                                     self.val_dev.gt, idx, mask)
                preds = np.asarray(out["pred"])[mask]
                names = [self.val_set.filenames[i] for i in idx[mask]]
                save_images(preds, names, self.save_dir,
                            ModelMode.EVAL.value.lower(), iter=epoch)
        out = self.eval_all(params, bs, self.val_dev.img, self.val_dev.gt,
                            self.val_buckets.indices, self.val_buckets.mask)
        dice2d = np.asarray(out["dice2d"])[self.val_buckets.mask]
        return {"dice2d_per_class": dice2d.mean(0),
                "dice3d_per_class": np.asarray(out["dice3d"]).mean(0),
                "loss": float(np.mean(np.asarray(out["loss"])))}

    # ------------------------------------------------------------------
    def checkpoint(self, metric: float, epoch: int, filename: str = "best.ckpt") -> None:
        last_payload = {"segmentator": self.segmentator.state_dict,
                        "best_score": self.best_score, "best_epoch": epoch}
        save_checkpoint(self.save_dir / "last.ckpt", last_payload)
        if metric <= self.best_score:
            return
        self.best_score = metric
        save_checkpoint(self.save_dir / filename,
                        {"segmentator": self.segmentator.state_dict,
                         "best_score": metric, "best_epoch": epoch})

    def _load_checkpoint(self, checkpoint: str) -> None:
        sd = load_checkpoint(checkpoint)
        self.segmentator.load_state_dict(sd["segmentator"])
        self.best_score = float(sd["best_score"])
        self.start_epoch = int(sd["best_epoch"]) + 1
        print(f">>> {checkpoint} loaded. Best {self.best_score:.3f} "
              f"@ epoch {sd['best_epoch']}")
