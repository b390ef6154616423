"""VAT trainer (ref:generalframework/trainer/vattrainer.py:19-223).

Per iteration: supervised CE on a labeled batch; when the ramped λ_adv is
positive, a VAT perturbation on an unlabeled batch and a consistency term
KL(pred(adv) ‖ pred(clean).detach()) (ref::148-160). The reference's
VATGenerator plumbing is broken as written (SURVEY §2 VAT row); this uses the
fixed power-iteration VAT from dct_tpu.adversarial.

Whole epoch = one jitted lax.scan. λ_adv enters the compiled graph as a
scalar; the λ>0 gating that skips the VAT branch host-side in the reference
is preserved by selecting a no-adv compiled variant when λ==0.
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

from ..adversarial import vat_perturbation
from ..checkpoint import load_checkpoint, save_checkpoint
from ..config import save_yaml
from ..data.dataset import MedicalImageDataset
from ..data.pipeline import (DeviceDataset, InfiniteBatcher, PatientBuckets,
                             gather_augment_u8, normalize_gather)
from ..losses import kl_div_2d
from ..models.segmentator import Segmentator
from ..optim import apply_direction
from ..schedules import get_weight_scheduler
from .steps import _dice_rows, make_eval_all_step
from .trainer import DEFAULT_GRP_REGEX


def make_vat_epoch(seg: Segmentator, sup_loss: Callable, C: int,
                   train_adv: bool, augment_labeled: bool,
                   augment_unlabeled: bool, eps: float, xi: float,
                   ip: int) -> Callable:

    @partial(jax.jit, donate_argnums=(0,))
    def epoch(state, img_u8, gt_u8, idx_lab, idx_unlab, key, lr, lam_adv):
        def one_step(carry, xs):
            idx_l, idx_u, k = xs
            if augment_labeled:
                img, gt = gather_augment_u8(img_u8, gt_u8, idx_l,
                                            jax.random.fold_in(k, 0))
            else:
                img, gt = normalize_gather(img_u8, gt_u8, idx_l)

            def loss_of(params):
                bs = carry["batch_stats"]
                logits, bs = seg.apply_train(params, bs, img)
                sup = sup_loss(logits, gt)
                adv = jnp.zeros((), logits.dtype)
                if train_adv:
                    if augment_unlabeled:
                        u_img, u_gt = gather_augment_u8(
                            img_u8, gt_u8, idx_u, jax.random.fold_in(k, 1))
                    else:
                        u_img, u_gt = normalize_gather(img_u8, gt_u8, idx_u)
                    adv_img, _, bs = vat_perturbation(
                        seg.apply_train, params, bs, u_img,
                        jax.random.fold_in(k, 2), xi=xi, epsilon=eps, ip=ip)
                    real_logits, bs = seg.apply_train(params, bs, u_img)
                    real_probs = jax.lax.stop_gradient(
                        jax.nn.softmax(real_logits, axis=-1))
                    adv_logits, bs = seg.apply_train(params, bs, adv_img)
                    adv_probs = jax.nn.softmax(adv_logits, axis=-1)
                    adv = jnp.mean(kl_div_2d(adv_probs, real_probs))
                total = sup + lam_adv * adv
                return total, (sup, adv, logits, bs)

            (_, (sup, adv, logits, new_bs)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(carry["params"])
            direction, new_opt = seg.tx.update(grads, carry["opt_state"],
                                               carry["params"])
            new_params = apply_direction(carry["params"], direction, lr)
            new_carry = {"params": new_params, "batch_stats": new_bs,
                         "opt_state": new_opt}
            return new_carry, {"sup_loss": sup, "adv_loss": adv,
                               "dice": _dice_rows(logits, gt, C)}

        keys = jax.random.split(key, idx_lab.shape[0])
        return jax.lax.scan(one_step, state, (idx_lab, idx_unlab, keys))

    return epoch


class VatTrainer:
    def __init__(self, segmentator: Segmentator,
                 labeled_dataset: MedicalImageDataset,
                 unlabeled_dataset: MedicalImageDataset,
                 val_dataset: MedicalImageDataset,
                 criterion: Callable,
                 max_epoch: int = 100,
                 save_dir: Union[str, Path] = "tmp",
                 axises=None,
                 checkpoint: Optional[str] = None,
                 metricname: str = "metrics.csv",
                 adv_scheduler_dict: Optional[dict] = None,
                 adv_training_dict: Optional[dict] = None,
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
        self.axises = axises if axises is not None else [1, 2, 3]
        self.metricname = metricname
        self.best_score = -1.0
        self.start_epoch = 0
        self.rs = np.random.RandomState(seed)
        self.root_key = jax.random.PRNGKey(seed)
        self.adv_scheduler = get_weight_scheduler(
            adv_scheduler_dict or {"name": "ConstantScheduler", "begin_epoch": 0,
                                   "max_value": 0.0})
        adv_cfg = adv_training_dict or {}
        self.eps = float(adv_cfg.get("eplision", 0.05))
        self.xi = float(adv_cfg.get("xi", 1e-6))
        self.ip = int(adv_cfg.get("ip", 1))

        # optional GSPMD DP (ref wraps every trainer's model in DataParallel,
        # ref:models/segmentators.py:34-36)
        self.nan_policy = nan_policy
        self.mesh = mesh
        rep = None
        if mesh is not None:
            assert mesh.shape.get("model", 1) == 1, \
                "VatTrainer is single-model: use a data-only mesh"
            assert batch_size % mesh.shape["data"] == 0, \
                (batch_size, dict(mesh.shape))
            from ..parallel.mesh import place_replicated
            self.segmentator.state = place_replicated(mesh, self.segmentator.state)
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
        self.eval_all = make_eval_all_step(segmentator, self.C)
        self._epoch_fns: Dict = {}

        import jax.numpy as jnp2
        self._img_cat = jnp2.concatenate([self.lab_dev.img, self.unlab_dev.img], 0)
        self._gt_cat = jnp2.concatenate([self.lab_dev.gt, self.unlab_dev.gt], 0)
        self._unlab_offset = len(labeled_dataset)

        if checkpoint is not None:
            self._load_checkpoint(checkpoint)

    def _epoch_fn(self, train_adv, aug_l, aug_u):
        sig = (train_adv, aug_l, aug_u)
        if sig not in self._epoch_fns:
            self._epoch_fns[sig] = make_vat_epoch(
                self.segmentator, self.criterion, self.C, train_adv,
                aug_l, aug_u, self.eps, self.xi, self.ip)
        return self._epoch_fns[sig]

    def start_training(self, train_adv: bool = False,
                       augment_labeled_data: bool = False,
                       augment_unlabeled_data: bool = False,
                       save_train: bool = False, save_val: bool = False
                       ) -> pd.DataFrame:
        from ..utils.logging import resume_records
        records = resume_records(self.save_dir / self.metricname, self.start_epoch)
        for epoch in range(self.start_epoch, self.max_epoch):
            t0 = time.time()
            lam = self.adv_scheduler.value
            adv_on = bool(train_adv and lam > 0)
            T = self.iters_per_epoch
            idx_lab = self.lab_batcher.take(T).astype(np.int32)
            idx_unlab = (self._unlab_offset
                         + self.unlab_batcher.take(T)).astype(np.int32)
            if self.mesh is not None:
                from ..parallel.mesh import dp_shard_idx
                idx_lab = dp_shard_idx(self.mesh, idx_lab)
                idx_unlab = dp_shard_idx(self.mesh, idx_unlab)
            self_state = self.segmentator.state
            new_state, m = self._epoch_fn(adv_on, augment_labeled_data,
                                          augment_unlabeled_data)(
                self_state, self._img_cat, self._gt_cat, idx_lab, idx_unlab,
                jax.random.fold_in(self.root_key, epoch),
                self.segmentator.lr(epoch), lam)
            self.segmentator.state = new_state
            np.asarray(m["sup_loss"])          # force the async epoch
            t_train = time.time() - t0
            t_eval0 = time.time()
            val = self._eval_epoch()
            t_eval = time.time() - t_eval0
            self.segmentator.scheduler_step()
            self.adv_scheduler.step()

            from ..utils.general import check_finite_losses
            check_finite_losses({"sup": np.asarray(m["sup_loss"]),
                                 "adv": np.asarray(m["adv_loss"])},
                                epoch, self.nan_policy)
            row = {"epoch": epoch,
                   "sup_loss": float(np.mean(np.asarray(m["sup_loss"]))),
                   "adv_loss": float(np.mean(np.asarray(m["adv_loss"]))),
                   **{f"tra_dice_{i}": np.asarray(m["dice"]).reshape(-1, self.C).mean(0)[i]
                      for i in self.axises},
                   **{f"val_dice_{i}": val["dice2d"][i] for i in self.axises},
                   **{f"val_batch_dice_{i}": val["dice3d"][i] for i in self.axises},
                   "images_per_sec": (idx_lab.size + (idx_unlab.size if adv_on else 0))
                   / max(t_train, 1e-9),
                   "t_train": t_train, "t_eval": t_eval}
            records.append(row)
            pd.DataFrame(records).set_index("epoch").to_csv(
                self.save_dir / self.metricname, float_format="%.4f")
            current = float(np.mean([val["dice2d"][i] for i in self.axises]))
            self.checkpoint(current, epoch)
            print(f">> VAT epoch {epoch}: val 2D {current:.4f} λ_adv={lam:.4f} "
                  f"[{time.time() - t0:.1f}s]")
        return pd.DataFrame(records)

    def _eval_epoch(self) -> Dict:
        st = self.segmentator.state
        out = self.eval_all(st["params"], st["batch_stats"],
                            self.val_dev.img, self.val_dev.gt,
                            self.val_buckets.indices, self.val_buckets.mask)
        return {"dice2d": np.asarray(out["dice2d"])[self.val_buckets.mask].mean(0),
                "dice3d": np.asarray(out["dice3d"]).mean(0)}

    def checkpoint(self, metric: float, epoch: int) -> None:
        payload = {"segmentator": self.segmentator.state_dict,
                   "best_score": float(self.best_score), "best_epoch": epoch,
                   "adv_scheduler": self.adv_scheduler.state_dict()}
        save_checkpoint(self.save_dir / "last.ckpt", payload)
        if metric > self.best_score:
            self.best_score = metric
            save_checkpoint(self.save_dir / "best.ckpt",
                            {**payload, "best_score": metric})

    def _load_checkpoint(self, checkpoint: str) -> None:
        sd = load_checkpoint(checkpoint)
        self.segmentator.load_state_dict(sd["segmentator"])
        self.best_score = float(sd["best_score"])
        self.start_epoch = int(sd["best_epoch"]) + 1
        self.adv_scheduler.load_state_dict(sd["adv_scheduler"])
        print(f">>> {checkpoint} loaded (best {self.best_score:.3f})")
