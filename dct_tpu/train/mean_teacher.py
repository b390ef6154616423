"""Mean-Teacher trainer (ref:generalframework/trainer/mean_teacher_trainer.py:23-260).

Semantics (the reference's *intent* — its dataset augmentation gate is
inverted, ref:medicalDataLoader.py:103, and its replay trick pickles process
RNG state through a string; see SURVEY §7.3):

* student sees the augmented view, supervised CE on labeled data;
* teacher (no gradient) predicts on the ORIGINAL view in train mode (its BN
  stats evolve through its own forwards; EMA covers parameters only,
  ref::254-256) and its probabilities are re-augmented with the SAME
  transform — here simply the same affine thetas;
* MSE consistency on both the labeled and an unlabeled stream, ramped by
  λ(t); student steps; teacher ← α·teacher + (1−α)·student with α=0.99.

Whole epoch = one jitted lax.scan; eval is the teacher's 2D/3D dice; best
checkpoint keyed on teacher val 2D dice (ref::126,135).
"""
from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..checkpoint import load_checkpoint, save_checkpoint
from ..config import save_yaml
from ..data.augment import apply_thetas, sample_aug_thetas
from ..data.dataset import MedicalImageDataset
from ..data.pipeline import DeviceDataset, InfiniteBatcher, PatientBuckets
from ..losses import mse_probs
from ..models.segmentator import Segmentator
from ..optim import apply_direction
from ..schedules import get_weight_scheduler
from .steps import make_eval_all_step
from .trainer import DEFAULT_GRP_REGEX


def make_mean_teacher_epoch(seg: Segmentator, sup_loss: Callable, C: int,
                            ema_alpha: float = 0.99) -> Callable:
    """jitted ``epoch(state, img_u8, gt_u8, idx_lab (T,B), idx_unlab (T,Bu),
    key, lr, lam_con)`` where state = {student{params,bs,opt}, teacher{params,bs}}."""

    @partial(jax.jit, donate_argnums=(0,))
    def epoch(state, img_u8, gt_u8, idx_lab, idx_unlab, key, lr, lam_con):
        def one_step(carry, xs):
            idx_l, idx_u, k = xs
            from ..data.pipeline import normalize_gather
            img_o, gt_o = normalize_gather(img_u8, gt_u8, idx_l)
            b, h, w = gt_o.shape
            thetas = sample_aug_thetas(jax.random.fold_in(k, 0), b, h, w)
            img_s = apply_thetas(img_o, thetas, "bilinear")
            gt_s = apply_thetas(gt_o.astype(jnp.float32), thetas,
                                "nearest").astype(gt_o.dtype)

            u_img_o, _ = normalize_gather(img_u8, gt_u8, idx_u)
            thetas_u = sample_aug_thetas(jax.random.fold_in(k, 1),
                                         u_img_o.shape[0], h, w)
            u_img_s = apply_thetas(u_img_o, thetas_u, "bilinear")

            # teacher forwards on ORIGINAL views (no grad, train-mode BN)
            t_logits, t_bs = seg.apply_train(carry["teacher"]["params"],
                                             carry["teacher"]["batch_stats"], img_o)
            t_probs = jax.lax.stop_gradient(jax.nn.softmax(t_logits, axis=-1))
            tu_logits, t_bs = seg.apply_train(carry["teacher"]["params"], t_bs,
                                              u_img_o)
            tu_probs = jax.lax.stop_gradient(jax.nn.softmax(tu_logits, axis=-1))
            # replay the student's augmentation on teacher predictions
            t_probs_aug = apply_thetas(t_probs, thetas, "bilinear")
            tu_probs_aug = apply_thetas(tu_probs, thetas_u, "bilinear")

            def loss_of(params_s):
                s_logits, s_bs = seg.apply_train(
                    params_s, carry["student"]["batch_stats"], img_s,
                    dropout_rng=jax.random.fold_in(k, 2))
                sup = sup_loss(s_logits, gt_s)
                s_probs = jax.nn.softmax(s_logits, axis=-1)
                su_logits, s_bs = seg.apply_train(
                    params_s, s_bs, u_img_s,
                    dropout_rng=jax.random.fold_in(k, 3))
                su_probs = jax.nn.softmax(su_logits, axis=-1)
                con1 = mse_probs(s_probs, t_probs_aug)
                con2 = mse_probs(su_probs, tu_probs_aug)
                total = sup + lam_con * (con1 + con2)
                return total, (sup, con1 + con2, s_logits, s_bs)

            (_, (sup, con, s_logits, s_bs)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(carry["student"]["params"])
            direction, new_opt = seg.tx.update(grads, carry["student"]["opt_state"],
                                               carry["student"]["params"])
            new_params = apply_direction(carry["student"]["params"], direction, lr)
            # EMA AFTER the student step (ref::213-214,254-256), params only
            new_t_params = jax.tree_util.tree_map(
                lambda t, s: ema_alpha * t + (1 - ema_alpha) * s,
                carry["teacher"]["params"], new_params)

            from .steps import _dice_rows
            metrics = {"sup_loss": sup, "con_loss": con,
                       "student_dice": _dice_rows(s_logits, gt_s, C),
                       "teacher_dice": _dice_rows(t_logits, gt_o, C)}
            new_carry = {"student": {"params": new_params, "batch_stats": s_bs,
                                     "opt_state": new_opt},
                         "teacher": {"params": new_t_params, "batch_stats": t_bs}}
            return new_carry, metrics

        keys = jax.random.split(key, idx_lab.shape[0])
        return jax.lax.scan(one_step, state, (idx_lab, idx_unlab, keys))

    return epoch


class MeanTeacherTrainer:
    def __init__(self, student_segmentator: Segmentator,
                 teacher_segmentator: Segmentator,
                 labeled_dataset: MedicalImageDataset,
                 unlabeled_dataset: MedicalImageDataset,
                 val_dataset: MedicalImageDataset,
                 criterions: Dict[str, Callable],
                 max_epoch: int = 100,
                 save_dir: Union[str, Path] = "tmp",
                 axises=None,
                 cot_scheduler_dict: Optional[dict] = None,
                 checkpoint: Optional[str] = None,
                 metricname: str = "metrics.csv",
                 batch_size: int = 4,
                 grp_regex: str = DEFAULT_GRP_REGEX,
                 ema_alpha: float = 0.99,
                 seed: int = 1234,
                 whole_config: Optional[dict] = None,
                 nan_policy: str = "warn",
                 mesh=None) -> None:
        self.student = student_segmentator
        self.teacher = teacher_segmentator
        self.criterions = criterions
        self.max_epoch = max_epoch
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        if whole_config:
            save_yaml(whole_config, self.save_dir / "mt_config.yml")
        self.C = student_segmentator.arch_params["num_classes"]
        self.axises = axises if axises is not None else [1, 2, 3]
        self.metricname = metricname
        self.best_score = -1.0
        self.start_epoch = 0
        self.seed = seed
        self.rs = np.random.RandomState(seed)
        self.root_key = jax.random.PRNGKey(seed)
        self.con_scheduler = get_weight_scheduler(
            cot_scheduler_dict or {"name": "RampScheduler", "begin_epoch": 0,
                                   "max_epoch": 80, "max_value": 1.0,
                                   "ramp_mult": -5})

        # optional GSPMD DP (ref wraps every trainer's model in DataParallel,
        # ref:models/segmentators.py:34-36): data replicated, per-epoch batch
        # indices sharded over 'data' in start_training
        self.nan_policy = nan_policy
        self.mesh = mesh
        rep = None
        if mesh is not None:
            assert mesh.shape.get("model", 1) == 1, \
                "MeanTeacherTrainer is single-model: use a data-only mesh"
            assert batch_size % mesh.shape["data"] == 0, \
                (batch_size, dict(mesh.shape))
            from jax.sharding import NamedSharding, PartitionSpec
            rep = NamedSharding(mesh, PartitionSpec())

        self.lab_dev = DeviceDataset(labeled_dataset, sharding=rep)
        self.unlab_dev = DeviceDataset(unlabeled_dataset, sharding=rep)
        self.val_set = val_dataset
        self.val_dev = DeviceDataset(val_dataset, sharding=rep)
        self.lab_batcher = InfiniteBatcher(len(labeled_dataset), batch_size, self.rs)
        self.unlab_batcher = InfiniteBatcher(len(unlabeled_dataset), batch_size, self.rs)
        self.iters_per_epoch = max(len(labeled_dataset) // batch_size, 1)
        self.val_buckets = PatientBuckets(val_dataset, grp_regex)
        self.eval_all = make_eval_all_step(self.student, self.C)
        self.epoch_fn = make_mean_teacher_epoch(self.student, criterions["sup"],
                                                self.C, ema_alpha)

        # labeled + unlabeled share one concatenated device array
        self._img_cat = jnp.concatenate([self.lab_dev.img, self.unlab_dev.img], 0)
        self._gt_cat = jnp.concatenate([self.lab_dev.gt, self.unlab_dev.gt], 0)
        self._unlab_offset = len(labeled_dataset)

        self.state = {"student": dict(self.student.state),
                      "teacher": {"params": self.teacher.state["params"],
                                  "batch_stats": self.teacher.state["batch_stats"]}}
        if mesh is not None:
            from ..parallel.mesh import place_replicated
            self.state = place_replicated(mesh, self.state)
        if checkpoint is not None:
            self._load_checkpoint(checkpoint)

    def start_training(self) -> pd.DataFrame:
        from ..utils.logging import resume_records
        records = resume_records(self.save_dir / self.metricname, self.start_epoch)
        for epoch in range(self.start_epoch, self.max_epoch):
            t0 = time.time()
            T = self.iters_per_epoch
            idx_lab = self.lab_batcher.take(T).astype(np.int32)
            idx_unlab = (self._unlab_offset
                         + self.unlab_batcher.take(T)).astype(np.int32)
            if self.mesh is not None:
                from ..parallel.mesh import dp_shard_idx
                idx_lab = dp_shard_idx(self.mesh, idx_lab)
                idx_unlab = dp_shard_idx(self.mesh, idx_unlab)
            key = jax.random.fold_in(self.root_key, epoch)
            self.state, m = self.epoch_fn(self.state, self._img_cat, self._gt_cat,
                                          idx_lab, idx_unlab, key,
                                          self.student.lr(epoch),
                                          self.con_scheduler.value)
            np.asarray(m["sup_loss"])          # force the async epoch
            t_train = time.time() - t0
            t_eval0 = time.time()
            val = self._eval_epoch()
            t_eval = time.time() - t_eval0
            self.student.scheduler_step()
            self.con_scheduler.step()

            from ..utils.general import check_finite_losses
            check_finite_losses({"sup": np.asarray(m["sup_loss"]),
                                 "con": np.asarray(m["con_loss"])},
                                epoch, self.nan_policy)
            row = {"epoch": epoch,
                   "tra_student_loss": float(np.mean(np.asarray(m["sup_loss"]))),
                   "tra_con_loss": float(np.mean(np.asarray(m["con_loss"]))),
                   **{f"tra_student_dice_{i}": np.asarray(m["student_dice"]).reshape(
                       -1, self.C).mean(0)[i] for i in self.axises},
                   **{f"tra_teacher_dice_{i}": np.asarray(m["teacher_dice"]).reshape(
                       -1, self.C).mean(0)[i] for i in self.axises},
                   **{f"val_teacher_2d_dice_{i}": val["dice2d"][i] for i in self.axises},
                   **{f"val_teacher_3d_dice_{i}": val["dice3d"][i] for i in self.axises},
                   "images_per_sec": (idx_lab.size + idx_unlab.size) / max(t_train, 1e-9),
                   "t_train": t_train, "t_eval": t_eval}
            records.append(row)
            pd.DataFrame(records).set_index("epoch").to_csv(
                self.save_dir / self.metricname, float_format="%.4f")
            save_criterion = float(np.mean([val["dice2d"][i] for i in self.axises]))
            self.save_checkpoint(save_criterion, epoch)
            print(f">> MT epoch {epoch}: teacher val 2D {save_criterion:.4f} "
                  f"(3D {np.mean([val['dice3d'][i] for i in self.axises]):.4f}) "
                  f"[{time.time() - t0:.1f}s]")
        return pd.DataFrame(records)

    def _eval_epoch(self) -> Dict:
        t = self.state["teacher"]
        out = self.eval_all(t["params"], t["batch_stats"],
                            self.val_dev.img, self.val_dev.gt,
                            self.val_buckets.indices, self.val_buckets.mask)
        return {"dice2d": np.asarray(out["dice2d"])[self.val_buckets.mask].mean(0),
                "dice3d": np.asarray(out["dice3d"]).mean(0)}

    def save_checkpoint(self, metric: float, epoch: int) -> None:
        # built from self.state only — the segmentators' construction-time
        # arrays were donated into the first jitted epoch call
        def describe(seg):
            return {"arch_dict": seg.arch_dict, "optim_dict": seg.optim_dict,
                    "scheduler_dict": seg.scheduler_dict,
                    "scheduler_state_dict": {"epoch": epoch + 1}}

        payload = {"student": {**describe(self.student),
                               "net_state_dict": self.state["student"]["params"],
                               "batch_stats": self.state["student"]["batch_stats"],
                               "optim_state_dict": self.state["student"]["opt_state"]},
                   "teacher": {**describe(self.teacher),
                               "net_state_dict": self.state["teacher"]["params"],
                               "batch_stats": self.state["teacher"]["batch_stats"]},
                   "metric": metric, "epoch": epoch,
                   "con_scheduler": self.con_scheduler.state_dict()}
        save_checkpoint(self.save_dir / "last.ckpt", payload)
        if metric > self.best_score:
            self.best_score = metric
            for p in self.save_dir.glob("best_*.ckpt"):
                p.unlink()
            save_checkpoint(self.save_dir / f"best_{metric:.4f}_{epoch}.ckpt", payload)

    def _load_checkpoint(self, checkpoint: str) -> None:
        sd = load_checkpoint(checkpoint)
        self.state["student"]["params"] = sd["student"]["net_state_dict"]
        self.state["student"]["batch_stats"] = sd["student"]["batch_stats"]
        self.state["student"]["opt_state"] = sd["student"]["optim_state_dict"]
        self.state["teacher"]["params"] = sd["teacher"]["net_state_dict"]
        self.state["teacher"]["batch_stats"] = sd["teacher"]["batch_stats"]
        self.best_score = float(sd["metric"])
        self.start_epoch = int(sd["epoch"]) + 1
        self.con_scheduler.load_state_dict(sd["con_scheduler"])
        print(f">>> {checkpoint} loaded (best {self.best_score:.3f})")
