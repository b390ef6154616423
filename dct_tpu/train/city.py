"""Cityscapes trainers: supervised ``TrainerCity`` and ``CoTrainerCity``
(rebuild of ref:generalframework/trainer/{trainer_city,cotraining_city}.py).

Differences from the medical CoTrainer:
* losses use ignore_index=250 (remapped void pixels);
* metrics are streaming IoU from a confusion matrix — accumulated ON DEVICE
  inside a scanned eval step, fetched once (ref builds it per-pixel on host,
  ref:metrics/confusionmatrix.py:60-90);
* the adversarial diversity term draws FRESH batches and mixes, per
  direction, FGSM-on-labeled vs VAT-on-unlabeled by ``fsgm_ratio``
  (ref:cotraining_city.py:359-400), attacking both directions 0→1 and 1→0;
* per-10-epoch prediction dumps (ref::136,150).

COCO-pretrained DeepLabV2 init (ref:trainer_city.py:56-66) is not
downloadable here; checkpoints can carry converted weights instead.
"""
from __future__ import annotations

import time  # noqa: F401  (used by trainers below)
from functools import partial
from pathlib import Path
from typing import Callable, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..adversarial import fgsm, vat_perturbation
from ..checkpoint import load_checkpoint, save_checkpoint
from ..config import save_yaml
from ..data.cityscapes import IGNORE_INDEX, CityscapesDataset
from ..data.pipeline import DeviceDataset, EpochBatcher, InfiniteBatcher, normalize_gather
from ..losses import jsd_2d, kl_div_2d
from ..models.segmentator import Segmentator, stack_states, unstack_states
from ..optim import apply_direction
from ..schedules import get_weight_scheduler



def make_city_eval_step(seg: Segmentator, C: int) -> Callable:
    """jitted ``step(params, bs, img_u8, gt_u8, idx (B,)) -> (C,C) confusion
    counts`` — rows gt, cols pred, void pixels dropped on device."""

    @jax.jit
    def step(params, batch_stats, img_u8, gt_u8, idx):
        img, gt = normalize_gather(img_u8, gt_u8, idx)
        logits = seg.apply_eval(params, batch_stats, img)
        pred = jnp.argmax(logits, axis=-1)
        valid = (gt != IGNORE_INDEX) & (gt < C)
        flat = jnp.where(valid, gt * C + pred, C * C)   # void → overflow bin
        counts = jnp.bincount(flat.reshape(-1), length=C * C + 1)
        return counts[:C * C].reshape(C, C)

    return step


def make_city_pred_step(seg: Segmentator) -> Callable:
    """jitted ``step(params, bs, img_u8, gt_u8, idx (B,)) -> (B,H,W) argmax
    class maps`` — for the per-10-epoch prediction dumps."""

    @jax.jit
    def step(params, batch_stats, img_u8, gt_u8, idx):
        img, _ = normalize_gather(img_u8, gt_u8, idx)
        return jnp.argmax(seg.apply_eval(params, batch_stats, img), axis=-1)

    return step


def iou_from_confusion(hist: np.ndarray) -> Dict[str, np.ndarray]:
    """(ref:metrics/iou.py:96-113 value())"""
    hist = hist.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc = np.diag(hist).sum() / hist.sum()
        acc_cls = np.nanmean(np.diag(hist) / hist.sum(1))
        iu = np.diag(hist) / (hist.sum(1) + hist.sum(0) - np.diag(hist))
        freq = hist.sum(1) / hist.sum()
        fwavacc = (freq[freq > 0] * iu[freq > 0]).sum()
    return {"Overall_Acc": acc, "Mean_Acc": acc_cls, "FreqW_Acc": fwavacc,
            "Mean_IoU": np.nanmean(iu), "Class_IoU": iu}


def make_city_cotrain_epoch(seg: Segmentator, K: int, C: int,
                            sup_loss: Callable, train_jsd: bool,
                            train_adv: bool, eps_fgsm: float,
                            eps_vat: float,
                            augment_fn: Optional[Callable] = None) -> Callable:
    """City co-training epoch: like steps.make_cotrain_epoch but with the
    fresh-batch two-direction FGSM/VAT mix; ``fsgm_flags (T,2)`` bools pick
    FGSM (True) or VAT (False) per direction, drawn host-side with
    ``fsgm_ratio`` (ref:cotraining_city.py:369,386). ``augment_fn`` is a
    composed key2aug augmenter (data.city_augment) applied on device to the
    labeled/unlabeled streams (the reference augments in DataLoader
    workers)."""
    assert not train_adv or K == 2, \
        "city adv path is defined for 2 segmentators (ref::364)"
    vapply_own = jax.vmap(seg.apply_train, in_axes=(0, 0, 0))
    vapply_shared = jax.vmap(seg.apply_train, in_axes=(0, 0, None))
    # fused two-group labeled+unlabeled forward (exact semantics; same
    # construction as steps.make_cotrain_epoch fuse_forward — measured +20%
    # on the medical step, BASELINE.md)
    vapply_grouped = jax.vmap(jax.vmap(seg.apply_train,
                                       in_axes=(None, None, 0)),
                              in_axes=(0, 0, 0))
    bn_m = getattr(seg, "bn_momentum", None)

    def take_model(tree, i):
        return jax.tree_util.tree_map(lambda x: jnp.take(x, i, axis=0), tree)

    @partial(jax.jit, donate_argnums=(0,))
    def epoch(stacked_state, img_u8, gt_u8, idx_lab, idx_unlab,
              idx_adv_lab, idx_adv_unlab, fsgm_flags, key, lr, lam_cot, lam_adv):
        def one_step(carry, xs):
            idx_lab_t, idx_unlab_t, idx_adv_lab_t, idx_adv_unlab_t, flags, k = xs
            lab = [normalize_gather(img_u8, gt_u8, idx_lab_t[i]) for i in range(K)]
            if augment_fn is not None:
                lab = [augment_fn(im, g, jax.random.fold_in(k, i))
                       for i, (im, g) in enumerate(lab)]
            lab_img = jnp.stack([x[0] for x in lab])
            lab_gt = jnp.stack([x[1] for x in lab])
            unlab_img, _ = normalize_gather(img_u8, gt_u8, idx_unlab_t)
            if augment_fn is not None:
                unlab_img, _ = augment_fn(
                    unlab_img, jnp.zeros(unlab_img.shape[:3], jnp.int32),
                    jax.random.fold_in(k, 101))

            def total_loss(params_stack):
                bs0 = carry["batch_stats"]
                if (train_jsd and bn_m is not None
                        and lab_img.shape[1] == unlab_img.shape[0]):
                    merged = jnp.stack(
                        [lab_img,
                         jnp.broadcast_to(unlab_img[None], lab_img.shape)],
                        axis=1)
                    logits_kg, bs_kg = vapply_grouped(params_stack, bs0,
                                                      merged)
                    lab_logits = logits_kg[:, 0]
                    unlab_logits = logits_kg[:, 1]
                    bs = jax.tree_util.tree_map(
                        lambda kg, r0: bn_m * kg[:, 0] + kg[:, 1]
                        - bn_m * r0, bs_kg, bs0)
                    sup_each = jax.vmap(sup_loss)(lab_logits, lab_gt)
                    supervised = jnp.sum(sup_each)
                    jsd_loss = jnp.mean(jsd_2d(jax.nn.softmax(unlab_logits,
                                                              -1)))
                else:
                    bs = bs0
                    lab_logits, bs = vapply_own(params_stack, bs, lab_img)
                    sup_each = jax.vmap(sup_loss)(lab_logits, lab_gt)
                    supervised = jnp.sum(sup_each)

                    jsd_loss = jnp.zeros((), lab_logits.dtype)
                    if train_jsd:
                        unlab_logits, bs = vapply_shared(params_stack, bs,
                                                         unlab_img)
                        jsd_loss = jnp.mean(jsd_2d(
                            jax.nn.softmax(unlab_logits, -1)))

                adv_loss = jnp.zeros((), lab_logits.dtype)
                if train_adv:
                    losses = []
                    for direction, (atk, tgt) in enumerate(((0, 1), (1, 0))):
                        p_atk = take_model(params_stack, atk)
                        bs_atk = take_model(bs, atk)
                        lab_i, lab_g = normalize_gather(
                            img_u8, gt_u8, idx_adv_lab_t[direction])
                        unl_i, _ = normalize_gather(
                            img_u8, gt_u8, idx_adv_unlab_t[direction])

                        adv_f, _, _, _ = fgsm(seg.apply_train, p_atk, bs_atk,
                                              lab_i, lab_g, sup_loss, eps_fgsm)
                        adv_v, _, _ = vat_perturbation(
                            seg.apply_train, p_atk, bs_atk, unl_i,
                            jax.random.fold_in(k, 7 + direction),
                            epsilon=eps_vat)
                        use_f = flags[direction]
                        img_clean = jnp.where(use_f, lab_i, unl_i)
                        img_adv = jnp.where(use_f, adv_f, adv_v)

                        real_logits, _ = seg.apply_train(p_atk, bs_atk, img_clean)
                        real = jax.lax.stop_gradient(
                            jax.nn.softmax(real_logits, -1))
                        p_tgt = take_model(params_stack, tgt)
                        bs_tgt = take_model(bs, tgt)
                        adv_logits, _ = seg.apply_train(p_tgt, bs_tgt, img_adv)
                        losses.append(jnp.mean(kl_div_2d(
                            jax.nn.softmax(adv_logits, -1), real)))
                    adv_loss = sum(losses) / len(losses)

                total = supervised + lam_cot * jsd_loss + lam_adv * adv_loss
                return total, {"sup_each": sup_each, "jsd": jsd_loss,
                               "adv": adv_loss, "batch_stats": bs}

            (_, aux), grads = jax.value_and_grad(total_loss, has_aux=True)(
                carry["params"])
            direction, new_opt = seg.tx.update(grads, carry["opt_state"],
                                               carry["params"])
            new_params = apply_direction(carry["params"], direction, lr)
            new_carry = {"params": new_params,
                         "batch_stats": aux["batch_stats"], "opt_state": new_opt}
            return new_carry, {"sup_loss": aux["sup_each"],
                               "jsd_loss": aux["jsd"], "adv_loss": aux["adv"]}

        keys = jax.random.split(key, idx_lab.shape[0])
        return jax.lax.scan(one_step, stacked_state,
                            (idx_lab, idx_unlab, idx_adv_lab, idx_adv_unlab,
                             fsgm_flags, keys))

    return epoch


class CoTrainerCity:
    def __init__(self, segmentators: List[Segmentator],
                 labeled_datasets: List[CityscapesDataset],
                 unlabeled_dataset: CityscapesDataset,
                 val_dataset: CityscapesDataset,
                 criterions: Dict[str, Callable],
                 max_epoch: int = 100,
                 save_dir: Union[str, Path] = "tmp",
                 checkpoint: Optional[str] = None,
                 metricname: str = "metrics.csv",
                 cot_scheduler_dict: Optional[dict] = None,
                 adv_scheduler_dict: Optional[dict] = None,
                 adv_training_dict: Optional[dict] = None,
                 batch_size: int = 2,
                 iters_per_epoch: Optional[int] = None,
                 seed: int = 1234,
                 augmentations: Optional[dict] = None,
                 whole_config: Optional[dict] = None,
                 nan_policy: str = "warn",
                 mesh=None) -> None:
        assert len(segmentators) == len(labeled_datasets)
        self.K = len(segmentators)
        self.segmentators = segmentators
        self.seg = segmentators[0]
        self.criterions = criterions
        self.max_epoch = max_epoch
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        if whole_config:
            save_yaml(whole_config, self.save_dir / "config.yml")
        self.C = self.seg.arch_params["num_classes"]
        self.metricname = metricname
        self.batch_size = batch_size
        self.best_scores = np.zeros(self.K)
        self.start_epoch = 0
        self.rs = np.random.RandomState(seed)
        self.root_key = jax.random.PRNGKey(seed)
        self.cot_scheduler = get_weight_scheduler(
            cot_scheduler_dict or {"name": "ConstantScheduler", "begin_epoch": 0,
                                   "max_value": 0.0})
        self.adv_scheduler = get_weight_scheduler(
            adv_scheduler_dict or {"name": "ConstantScheduler", "begin_epoch": 0,
                                   "max_value": 0.0})
        from ..data.city_augment import get_composed_augmentations
        self.augment_fn = get_composed_augmentations(augmentations)
        adv_cfg = adv_training_dict or {}
        self.eps_fgsm = float(adv_cfg.get("eplision", 0.03))
        self.eps_vat = float(adv_cfg.get("vat_eplision", adv_cfg.get("eplision", 10.0)))
        self.fsgm_ratio = float(adv_cfg.get("fsgm_ratio", 0.5))

        # optional GSPMD DP over the batch axis (the DataParallel the
        # reference applies to every trainer's model,
        # ref:models/segmentators.py:34-36) — the 512×1024 city config is
        # the most compute-hungry one, so this trainer shards too. The K
        # model axis stays vmapped/replicated (model-parallel city would
        # need a shard_map port of the two-direction adv mix).
        self.nan_policy = nan_policy
        self.mesh = mesh
        rep = None
        if mesh is not None:
            assert mesh.shape.get("model", 1) == 1, \
                "CoTrainerCity supports data-only meshes (model axis == 1)"
            assert batch_size % mesh.shape["data"] == 0, \
                (batch_size, dict(mesh.shape))
            from jax.sharding import NamedSharding, PartitionSpec
            rep = NamedSharding(mesh, PartitionSpec())

        self.lab_dev = [DeviceDataset(d, sharding=rep) for d in labeled_datasets]
        self.unlab_dev = DeviceDataset(unlabeled_dataset, sharding=rep)
        self.val_set = val_dataset
        self.val_dev = DeviceDataset(val_dataset, sharding=rep)
        self.lab_batchers = [InfiniteBatcher(len(d), batch_size, self.rs)
                             for d in labeled_datasets]
        self.unlab_batcher = InfiniteBatcher(len(unlabeled_dataset), batch_size,
                                             self.rs)
        self.iters_per_epoch = iters_per_epoch or max(
            min(len(d) for d in labeled_datasets) // batch_size, 1)
        self.val_batcher = EpochBatcher(len(val_dataset), batch_size,
                                        shuffle=False, drop_last=False)
        self.eval_step = make_city_eval_step(self.seg, self.C)
        self.pred_step = make_city_pred_step(self.seg)

        import jax.numpy as jnp2
        offs, imgs, gts = [], [], []
        off = 0
        for dev in self.lab_dev + [self.unlab_dev]:
            offs.append(off)
            imgs.append(dev.img)
            gts.append(dev.gt)
            off += len(dev)
        self._offsets = offs
        self._img_cat = jnp2.concatenate(imgs, axis=0)
        self._gt_cat = jnp2.concatenate(gts, axis=0)

        stacked = stack_states([{"params": s.state["params"],
                                 "batch_stats": s.state["batch_stats"]}
                                for s in segmentators])
        self.stacked_state = {"params": stacked["params"],
                              "batch_stats": stacked["batch_stats"],
                              "opt_state": self.seg.tx.init(stacked["params"])}
        if mesh is not None:
            from ..parallel.mesh import place_replicated
            self.stacked_state = place_replicated(mesh, self.stacked_state)
        self._epoch_fns: Dict = {}
        if checkpoint is not None:
            self._load_checkpoint(checkpoint)

    def _epoch_fn(self, train_jsd, train_adv):
        sig = (train_jsd, train_adv)
        if sig not in self._epoch_fns:
            self._epoch_fns[sig] = make_city_cotrain_epoch(
                self.seg, self.K, self.C, self.criterions["sup"],
                train_jsd, train_adv, self.eps_fgsm, self.eps_vat,
                augment_fn=self.augment_fn)
        return self._epoch_fns[sig]

    def start_training(self, train_jsd: bool = False, train_adv: bool = False,
                       save_val: bool = False, **_ignored) -> pd.DataFrame:
        from ..utils.logging import resume_records
        epoch_fn = self._epoch_fn(train_jsd, train_adv)
        records = resume_records(self.save_dir / self.metricname, self.start_epoch)
        for epoch in range(self.start_epoch, self.max_epoch):
            t0 = time.time()
            T = self.iters_per_epoch
            idx_lab = np.stack([off + b.take(T) for off, b in
                                zip(self._offsets[:-1], self.lab_batchers)],
                               axis=1).astype(np.int32)
            idx_unlab = (self._offsets[-1]
                         + self.unlab_batcher.take(T)).astype(np.int32)
            idx_adv_lab = np.stack([off + b.take(T) for off, b in
                                    zip(self._offsets[:-1], self.lab_batchers)],
                                   axis=1).astype(np.int32)
            idx_adv_unlab = np.stack([self._offsets[-1] + self.unlab_batcher.take(T)
                                      for _ in range(self.K)],
                                     axis=1).astype(np.int32)
            flags = (self.rs.rand(T, 2) <= self.fsgm_ratio)
            if self.mesh is not None:
                from ..parallel.mesh import dp_shard_idx, place_replicated
                idx_lab = dp_shard_idx(self.mesh, idx_lab)          # (T,K,B)
                idx_unlab = dp_shard_idx(self.mesh, idx_unlab)      # (T,Bu)
                idx_adv_lab = dp_shard_idx(self.mesh, idx_adv_lab)
                idx_adv_unlab = dp_shard_idx(self.mesh, idx_adv_unlab)
                flags = place_replicated(self.mesh, flags)

            self.stacked_state, m = epoch_fn(
                self.stacked_state, self._img_cat, self._gt_cat,
                idx_lab, idx_unlab, idx_adv_lab, idx_adv_unlab, flags,
                jax.random.fold_in(self.root_key, epoch),
                self.seg.lr(epoch), self.cot_scheduler.value,
                self.adv_scheduler.value)
            np.asarray(m["sup_loss"])          # force the async epoch
            t_train = time.time() - t0
            t_eval0 = time.time()
            val = self._eval_epoch()
            t_eval = time.time() - t_eval0
            if save_val and epoch % 10 == 0:
                # per-10-epoch prediction dumps (ref:cotraining_city.py:150)
                self._save_val_predictions(epoch)
            for s in self.segmentators:
                s.scheduler_step()
            self.cot_scheduler.step()
            self.adv_scheduler.step()

            from ..utils.general import check_finite_losses
            check_finite_losses({"sup": np.asarray(m["sup_loss"]),
                                 "jsd": np.asarray(m["jsd_loss"]),
                                 "adv": np.asarray(m["adv_loss"])},
                                epoch, self.nan_policy)
            row = {"epoch": epoch,
                   **{f"val_mIoU_{s}": val[s]["Mean_IoU"] for s in range(self.K)},
                   **{f"val_acc_{s}": val[s]["Overall_Acc"] for s in range(self.K)},
                   **{f"sup_loss_{s}": float(np.asarray(m["sup_loss"]).mean(0)[s])
                      for s in range(self.K)},
                   "jsd_loss": float(np.mean(np.asarray(m["jsd_loss"]))),
                   "adv_loss": float(np.mean(np.asarray(m["adv_loss"]))),
                   "images_per_sec": (idx_lab.size + idx_unlab.size)
                   / max(t_train, 1e-9),
                   "t_train": t_train, "t_eval": t_eval}
            records.append(row)
            pd.DataFrame(records).set_index("epoch").to_csv(
                self.save_dir / self.metricname, float_format="%.4f")
            current = np.array([val[s]["Mean_IoU"] for s in range(self.K)])
            self.checkpoint(current, epoch)
            print(f">> city epoch {epoch}: mIoU "
                  + " ".join(f"S{s}:{current[s]:.4f}" for s in range(self.K))
                  + f" [{time.time() - t0:.1f}s]")
        return pd.DataFrame(records)

    def _eval_epoch(self) -> List[Dict]:
        states = unstack_states({"params": self.stacked_state["params"],
                                 "batch_stats": self.stacked_state["batch_stats"]},
                                self.K)
        out = []
        batches = self.val_batcher.epoch(np.random.RandomState(0))
        for st in states:
            hist = np.zeros((self.C, self.C), np.int64)
            for idx in batches:
                hist += np.asarray(self.eval_step(
                    st["params"], st["batch_stats"], self.val_dev.img,
                    self.val_dev.gt, idx.astype(np.int32)))
            out.append(iou_from_confusion(hist))
        return out

    def _save_val_predictions(self, epoch: int) -> None:
        """Dump every model's val argmax maps as PNGs under
        save_dir/iter{epoch}/eval/{model}/ (ref:utils/utils.py:238-250)."""
        from ..utils.general import save_images
        states = unstack_states({"params": self.stacked_state["params"],
                                 "batch_stats": self.stacked_state["batch_stats"]},
                                self.K)
        for s, st in enumerate(states):
            for idx in self.val_batcher.epoch(np.random.RandomState(0)):
                preds = self.pred_step(st["params"], st["batch_stats"],
                                       self.val_dev.img, self.val_dev.gt,
                                       idx.astype(np.int32))
                names = [self.val_dev.filenames[i] for i in idx]
                save_images(preds, names, self.save_dir, "eval", epoch,
                            seg_num=str(s))

    def checkpoint(self, metric: np.ndarray, epoch: int) -> None:
        states = unstack_states({"params": self.stacked_state["params"],
                                 "batch_stats": self.stacked_state["batch_stats"]},
                                self.K)
        for i, (seg, st) in enumerate(zip(self.segmentators, states)):
            payload = {"segmentator": {"arch_dict": seg.arch_dict,
                                       "optim_dict": seg.optim_dict,
                                       "scheduler_dict": seg.scheduler_dict,
                                       "net_state_dict": st["params"],
                                       "batch_stats": st["batch_stats"],
                                       "scheduler_state_dict": {"epoch": epoch + 1}},
                       "best_score": float(self.best_scores[i]),
                       "best_epoch": epoch}
            save_checkpoint(self.save_dir / f"last_{i}.ckpt", payload)
            if metric[i] > self.best_scores[i]:
                self.best_scores[i] = float(metric[i])
                save_checkpoint(self.save_dir / f"best_{i}.ckpt",
                                {**payload, "best_score": float(metric[i])})

    def _load_checkpoint(self, checkpoint_dir: str) -> None:
        paths = sorted(Path(checkpoint_dir).glob("last_*.ckpt"))
        assert paths, checkpoint_dir
        params, bss = [], []
        for i, p in enumerate(paths):
            sd = load_checkpoint(p)
            params.append(sd["segmentator"]["net_state_dict"])
            bss.append(sd["segmentator"]["batch_stats"])
            self.best_scores[i] = sd["best_score"]
            self.start_epoch = int(sd["best_epoch"]) + 1
        stacked = stack_states([{"params": p, "batch_stats": b}
                                for p, b in zip(params, bss)])
        self.stacked_state = {"params": stacked["params"],
                              "batch_stats": stacked["batch_stats"],
                              "opt_state": self.seg.tx.init(stacked["params"])}


class TrainerCity:
    """Supervised Cityscapes baseline (ref:trainer_city.py:29+): a 1-model
    CoTrainerCity with both semi-supervised terms off."""

    def __init__(self, segmentator: Segmentator, labeled_dataset,
                 unlabeled_dataset, val_dataset, criterion, **kwargs) -> None:
        self.inner = CoTrainerCity([segmentator], [labeled_dataset],
                                   unlabeled_dataset, val_dataset,
                                   {"sup": criterion, "jsd": None, "adv": None},
                                   **kwargs)

    def start_training(self, **kwargs):
        return self.inner.start_training(train_jsd=False, train_adv=False)
