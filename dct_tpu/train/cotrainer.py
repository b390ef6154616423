"""CoTrainer — K-model deep co-training (the framework's centerpiece).

Rebuild of ref:generalframework/trainer/cotraining_totalloss.py:28-482:
K segmentators (shared architecture), K labeled streams + one unlabeled +
one patient-grouped val stream; per iteration supervised CE per model, JSD
consistency across all models on the unlabeled batch, FGSM diversity on a
random model pair; λ_cot / λ_adv epoch ramps; fixed 300 iterations/epoch
(ref::191); per-model best checkpoints keyed on mean foreground per-patient
3D val dice (ref::155-156, 474-482); per-model metric CSVs + .npy dumps.

TPU shape: the K models live as ONE stacked state; a whole epoch is one jit
call (see dct_tpu.train.steps.make_cotrain_epoch). Host work per epoch:
index shuffling, one metrics fetch, file writes.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..checkpoint import load_checkpoint, save_checkpoint
from ..config import save_yaml
from ..data.dataset import MedicalImageDataset
from ..data.pipeline import DeviceDataset, InfiniteBatcher, PatientBuckets
from ..models.segmentator import Segmentator, stack_states, unstack_states
from ..schedules import get_weight_scheduler
from ..utils.general import check_finite_losses
from ..utils.logging import RateMeter, ScalarWriter
from .steps import (make_cotrain_epoch, make_eval_all_models_step,
                    make_eval_all_step, make_eval_patient_step)
from .trainer import DEFAULT_GRP_REGEX

ITERS_PER_EPOCH = 300  # ref:cotraining_totalloss.py:191


class CoTrainer:
    def __init__(self, segmentators: List[Segmentator],
                 labeled_datasets: List[MedicalImageDataset],
                 unlabeled_dataset: MedicalImageDataset,
                 val_dataset: MedicalImageDataset,
                 criterions: Dict[str, Callable],
                 max_epoch: int = 100,
                 save_dir: Union[str, Path] = "tmp",
                 axises: Optional[List[int]] = None,
                 checkpoint: Optional[str] = None,
                 metricname: str = "metrics.csv",
                 cot_scheduler_dict: Optional[dict] = None,
                 adv_scheduler_dict: Optional[dict] = None,
                 adv_training_dict: Optional[dict] = None,
                 batch_size: int = 4,
                 unlab_batch_size: Optional[int] = None,
                 grp_regex: str = DEFAULT_GRP_REGEX,
                 iters_per_epoch: int = ITERS_PER_EPOCH,
                 seed: int = 1234,
                 mesh=None,
                 fuse_forward: bool = True,
                 adv_dtype: Optional[str] = None,
                 iters_per_dispatch: Optional[int] = None,
                 nan_policy: str = "warn",
                 whole_config: Optional[dict] = None) -> None:
        assert len(segmentators) == len(labeled_datasets)
        assert len(segmentators) >= 1
        assert len({id(s) for s in segmentators}) == len(segmentators)
        assert set(criterions.keys()) == {"sup", "jsd", "adv"}, criterions.keys()

        self.K = len(segmentators)
        self.segmentators = segmentators
        self.seg = segmentators[0]            # shared arch: apply fns/tx
        self.criterions = criterions
        self.max_epoch = max_epoch
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        if whole_config:
            save_yaml(whole_config, self.save_dir / "config.yml")
        self.writer = ScalarWriter(self.save_dir)   # ref:cotraining:69 SummaryWriter
        self.rate_meter = RateMeter()
        self.C = self.seg.arch_params["num_classes"]
        self.axises = axises if axises is not None else [1, 2, 3]
        self.metricname = metricname
        self.iters_per_epoch = iters_per_epoch
        # merge the labeled+unlabeled forwards into one two-group apply
        # (exact semantics; see train/steps.py fuse_forward). Config knob:
        # Trainer.fuse_forward.
        self.fuse_forward = bool(fuse_forward)
        # run the FGSM segment in this dtype (None = arch compute_dtype);
        # "float32" pins the adv term against the bf16-512² tunnel-compiler
        # NaN (see train/steps.py adv_dtype). Config knob: Trainer.adv_dtype.
        self.adv_dtype = adv_dtype
        self.nan_policy = nan_policy
        # split each training epoch into ceil(T/iters_per_dispatch) equal jit
        # calls (state threaded through; ONE compile reused since every chunk
        # has the same static length). Long single dispatches at 512²+ (~2min
        # on-device) crash this tunnel's TPU worker — chunks of ~50 iters
        # keep each execution under the observed kill threshold. None = one
        # call per epoch (default). Config knob: Trainer.iters_per_dispatch.
        self.iters_per_dispatch = (int(iters_per_dispatch)
                                   if iters_per_dispatch else None)
        if self.iters_per_dispatch:
            assert iters_per_epoch % self.iters_per_dispatch == 0, \
                (iters_per_epoch, self.iters_per_dispatch)
        self.batch_size = batch_size
        self.unlab_batch_size = unlab_batch_size or batch_size
        self.best_scores = np.zeros(self.K)
        self.start_epoch = 0
        self.seed = seed
        self.rs = np.random.RandomState(seed)
        self.root_key = jax.random.PRNGKey(seed)

        self.cot_scheduler = get_weight_scheduler(
            cot_scheduler_dict or {"name": "ConstantScheduler", "begin_epoch": 0,
                                   "max_value": 0.0})
        self.adv_scheduler = get_weight_scheduler(
            adv_scheduler_dict or {"name": "ConstantScheduler", "begin_epoch": 0,
                                   "max_value": 0.0})
        self.adv_training_dict = adv_training_dict or {}
        self.eps_fgsm = float(self.adv_training_dict.get("eplision", 0.03))

        # ---- device data: one shared train array + per-stream index spaces
        # Labeled subsets are *views* into their own packed arrays; simplest
        # device layout is one DeviceDataset per stream (small duplication,
        # zero gather indirection).
        self.lab_dev = [DeviceDataset(d) for d in labeled_datasets]
        self.unlab_dev = DeviceDataset(unlabeled_dataset)
        self.val_set = val_dataset
        self.val_dev = DeviceDataset(val_dataset)
        self.lab_batchers = [InfiniteBatcher(len(d), batch_size, self.rs)
                             for d in labeled_datasets]
        self.unlab_batcher = InfiniteBatcher(len(unlabeled_dataset),
                                             self.unlab_batch_size, self.rs)
        self.val_buckets = PatientBuckets(val_dataset, grp_regex)
        self.eval_step = make_eval_patient_step(self.seg, self.C)
        self.eval_all = make_eval_all_step(self.seg, self.C)
        self.eval_all_models = make_eval_all_models_step(self.seg, self.C)
        self._val_idx = jnp.asarray(self.val_buckets.indices)
        self._val_mask = jnp.asarray(self.val_buckets.mask)

        # Stack params/batch_stats across models; the optimizer state is
        # initialized ONCE over the stacked params (optax moments are
        # elementwise, so this is exactly K independent optimizers — whereas
        # stacking per-model states would stack Adam's scalar step count).
        stacked = stack_states([{"params": s.state["params"],
                                 "batch_stats": s.state["batch_stats"]}
                                for s in segmentators])
        self.stacked_state = {"params": stacked["params"],
                              "batch_stats": stacked["batch_stats"],
                              "opt_state": self.seg.tx.init(stacked["params"])}
        # optional multi-chip execution. model axis > 1 routes the epoch
        # through the shard_map step (each group owns K/n_model models);
        # model axis == 1 is pure GSPMD DP: params replicated, batch indices
        # sharded over 'data', the partitioner inserts the gradient psum.
        self.mesh = mesh
        self._dp_only = mesh is not None and mesh.shape.get("model", 1) == 1
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            assert self.K % mesh.shape["model"] == 0, \
                f"K={self.K} not divisible by mesh model axis {mesh.shape['model']}"
        if self._dp_only:
            assert self.batch_size % mesh.shape["data"] == 0 and \
                self.unlab_batch_size % mesh.shape["data"] == 0, \
                (self.batch_size, self.unlab_batch_size, dict(mesh.shape))
            from ..parallel.mesh import place_stacked_state
            self.stacked_state = place_stacked_state(mesh, self.stacked_state,
                                                     self.K)
        self._epoch_fns: Dict = {}

        if checkpoint is not None:
            self._load_checkpoint(checkpoint)

    # ------------------------------------------------------------------
    def _epoch_fn(self, train_jsd, train_adv, aug_lab, aug_unlab):
        sig = (train_jsd, train_adv, aug_lab, aug_unlab)
        if sig not in self._epoch_fns:
            if self.mesh is not None and self.mesh.shape.get("model", 1) > 1:
                from ..parallel.shard_cotrain import make_shard_cotrain_epoch
                fn = make_shard_cotrain_epoch(
                    self.seg, self.mesh, self.K, self.C, self.criterions["sup"],
                    train_jsd, train_adv, aug_lab, self.eps_fgsm,
                    state_template=self.stacked_state,
                    fuse_forward=self.fuse_forward,
                    adv_dtype=self.adv_dtype)
                self._epoch_fns[sig] = ("shard", fn)
            else:
                fn = make_cotrain_epoch(
                    self.seg, self.K, self.C, self.criterions["sup"],
                    train_jsd, train_adv, aug_lab, aug_unlab, self.eps_fgsm,
                    fuse_aug="split" if self._dp_only else "merged",
                    fuse_forward=self.fuse_forward,
                    adv_dtype=self.adv_dtype)
                self._epoch_fns[sig] = ("vmap", fn)
        return self._epoch_fns[sig]

    # The labeled streams index their own arrays, but the fused epoch expects
    # one (img,gt) pair; with per-stream arrays we offset indices into a
    # concatenated array once at construction.
    def _concat_lab_arrays(self):
        if hasattr(self, "_lab_img_cat"):
            return
        import jax.numpy as jnp
        offs, imgs, gts = [], [], []
        off = 0
        for dev in self.lab_dev:
            offs.append(off)
            imgs.append(dev.img)
            gts.append(dev.gt)
            off += len(dev)
        # unlabeled appended at the end so ONE array serves all streams
        offs.append(off)
        imgs.append(self.unlab_dev.img)
        gts.append(self.unlab_dev.gt)
        self._lab_offsets = offs
        self._lab_img_cat = jnp.concatenate(imgs, axis=0)
        self._lab_gt_cat = jnp.concatenate(gts, axis=0)
        if self._dp_only:
            from ..parallel.mesh import place_replicated
            self._lab_img_cat = place_replicated(self.mesh, self._lab_img_cat)
            self._lab_gt_cat = place_replicated(self.mesh, self._lab_gt_cat)

    def start_training(self, train_jsd: bool = False, train_adv: bool = False,
                       save_train: bool = False, save_val: bool = False,
                       augment_labeled_data: bool = False,
                       augment_unlabeled_data: bool = False) -> pd.DataFrame:
        self._concat_lab_arrays()
        epoch_fn = self._epoch_fn(train_jsd, train_adv,
                                  augment_labeled_data, augment_unlabeled_data)
        from ..utils.logging import resume_records
        records = resume_records(self.save_dir / self.metricname, self.start_epoch)
        for epoch in range(self.start_epoch, self.max_epoch):
            t0 = time.time()
            train_m = self._train_epoch(epoch, epoch_fn, train_jsd, train_adv)
            check_finite_losses({"sup": train_m["sup_loss"],
                                 "jsd": train_m["jsd_loss"],
                                 "adv": train_m["adv_loss"]},
                                epoch, self.nan_policy)
            if save_train:
                self._save_train_predictions(epoch, train_jsd)
            t_eval0 = time.time()
            val_m = self._eval_epoch(epoch, save_val)
            t_eval = time.time() - t_eval0
            self._scheduler_step()
            elapsed = time.time() - t0

            row = {"epoch": epoch}
            for s in range(self.K):
                for i in self.axises:
                    row[f"tra_dice_{s}_{i}"] = train_m["lab_dice"][s][i]
                    row[f"val_dice_{s}_{i}"] = val_m["dice2d"][s][i]
                    row[f"val_batch_dice_{s}_{i}"] = val_m["dice3d"][s][i]
                row[f"sup_loss_{s}"] = train_m["sup_loss"][s]
            row["jsd_loss"] = train_m["jsd_loss"]
            row["adv_loss"] = train_m["adv_loss"]
            row["images_per_sec"] = train_m["n_images"] / max(train_m["train_time"], 1e-9)
            # wall breakdown (VERDICT r1 asked for the epoch-tail profile):
            # train scan / eval dispatch+fetch / everything else (csv, TB,
            # checkpoint)
            row["t_train"] = train_m["train_time"]
            row["t_eval"] = t_eval
            records.append(row)

            df = pd.DataFrame(records).set_index("epoch")
            # full history (all models + jsd/adv/perf) — also what a resumed
            # run reloads so the CSVs keep absolute epoch numbering
            df.to_csv(self.save_dir / self.metricname, float_format="%.4f")
            for s in range(self.K):
                cols = [c for c in df.columns if c.endswith(tuple(
                    f"_{s}_{i}" for i in self.axises)) or c == f"sup_loss_{s}"]
                df[cols].to_csv(self.save_dir / self.metricname.replace(
                    ".csv", f"_{s}.csv"), float_format="%.4f")
            np.save(self.save_dir / "val_batch_dice.npy",
                    df.filter(like="val_batch_dice").values)
            np.save(self.save_dir / "val_dice.npy",
                    np.asarray(df.filter(regex=r"^val_dice").values))

            # tensorboard scalars, epoch-granular (ref:cotraining:444-450)
            for s in range(self.K):
                self.writer.add_scalars(
                    f"val/S{s}", {f"DSC{i}": float(val_m["dice3d"][s][i])
                                  for i in self.axises}, epoch)
                self.writer.add_scalar(f"loss/sup_{s}",
                                       float(train_m["sup_loss"][s]), epoch)
            self.writer.add_scalar("loss/jsd", train_m["jsd_loss"], epoch)
            self.writer.add_scalar("loss/adv", train_m["adv_loss"], epoch)
            self.writer.add_scalar("perf/images_per_sec",
                                   row["images_per_sec"], epoch)

            current = np.array([np.mean([val_m["dice3d"][s][i] for i in self.axises])
                                for s in range(self.K)])
            self.checkpoint(current, epoch)
            print(f">> epoch {epoch}: val fg 3D dice "
                  + " ".join(f"S{s}:{current[s]:.4f}" for s in range(self.K))
                  + f"  jsd {train_m['jsd_loss']:.4f} adv {train_m['adv_loss']:.4f}"
                  + f"  [{elapsed:.1f}s = train {train_m['train_time']:.1f}"
                  + f" + eval {t_eval:.1f} + host "
                  + f"{elapsed - train_m['train_time'] - t_eval:.1f}; "
                  + f"{row['images_per_sec']:.0f} img/s]")
        return pd.DataFrame(records)

    # ------------------------------------------------------------------
    def _train_epoch(self, epoch: int, epoch_fn, train_jsd, train_adv) -> Dict:
        T = self.iters_per_epoch
        idx_lab = np.stack([off + b.take(T) for off, b in
                            zip(self._lab_offsets[:-1], self.lab_batchers)], axis=1
                           ).astype(np.int32)                      # (T,K,B)
        idx_unlab = (self._lab_offsets[-1]
                     + self.unlab_batcher.take(T)).astype(np.int32)  # (T,Bu)
        # random adversarial pair per iteration (ref::235-242)
        pairs = np.stack([np.sort(self.rs.choice(self.K, 2, replace=self.K < 2))
                          for _ in range(T)]).astype(np.int32)
        key = jax.random.fold_in(self.root_key, epoch)
        lr = self.seg.lr(epoch)
        lam_cot = self.cot_scheduler.value
        lam_adv = self.adv_scheduler.value

        kind, fn = epoch_fn
        t0 = time.time()
        chunk = self.iters_per_dispatch
        if chunk and chunk < T:
            # chunked epoch: same compiled graph per chunk (equal static
            # length), state threaded through; per-chunk keys are folded so
            # draws differ from the single-call epoch but stay deterministic
            parts = []
            for s in range(0, T, chunk):
                il, iu, pr = (idx_lab[s:s + chunk], idx_unlab[s:s + chunk],
                              pairs[s:s + chunk])
                if self._dp_only:
                    from ..parallel.mesh import place_batches
                    il, iu, pr = place_batches(self.mesh, il, iu, pr)
                self.stacked_state, m = fn(
                    self.stacked_state, self._lab_img_cat, self._lab_gt_cat,
                    il, iu, pr, jax.random.fold_in(key, s), lr, lam_cot,
                    lam_adv)
                # fetch per chunk: keeps each device execution bounded AND
                # bounds in-flight async dispatches to one
                parts.append({k: np.asarray(v) for k, v in m.items()})
            metrics = {k: np.concatenate([p[k] for p in parts], axis=0)
                       for k in parts[0]}
        else:
            if self._dp_only:
                from ..parallel.mesh import place_batches
                idx_lab, idx_unlab, pairs = place_batches(self.mesh, idx_lab,
                                                          idx_unlab, pairs)
            self.stacked_state, metrics = fn(
                self.stacked_state, self._lab_img_cat, self._lab_gt_cat,
                idx_lab, idx_unlab, pairs, key, lr, lam_cot, lam_adv)
        # the jit dispatch is async — the np.asarray metric fetches below are
        # what force completion, so time AFTER them (block_until_ready returns
        # early on the axon platform, CLAUDE.md)
        n_images = idx_lab.size + (idx_unlab.size if (train_jsd or train_adv) else 0)
        if kind == "shard":
            # shard metrics are (T,K,...); adv slots are scaled so the sum
            # over the model axis reconstructs the per-iteration total
            lab_dice = np.asarray(metrics["lab_dice"])          # (T,K,B,C)
            out = {"lab_dice": lab_dice.transpose(1, 0, 2, 3).reshape(
                        self.K, -1, self.C).mean(1),
                   "sup_loss": np.asarray(metrics["sup_loss"]).mean(0),
                   "jsd_loss": float(np.mean(np.asarray(metrics["jsd_loss"]))),
                   "adv_loss": float(np.sum(np.asarray(metrics["adv_loss"]), 1).mean())}
        else:
            lab_dice = np.asarray(metrics["lab_dice"])          # (T,K,B,C)
            out = {"lab_dice": lab_dice.transpose(1, 0, 2, 3).reshape(
                        self.K, -1, self.C).mean(1),
                   "sup_loss": np.asarray(metrics["sup_loss"]).mean(0),
                   "jsd_loss": float(np.mean(np.asarray(metrics["jsd_loss"]))),
                   "adv_loss": float(np.mean(np.asarray(metrics["adv_loss"])))}
        return {**out, "n_images": n_images, "train_time": time.time() - t0}

    def _unstack_model_states(self) -> List[Dict]:
        """Per-model {'params','batch_stats'} views (opt_state stays stacked)."""
        return unstack_states({"params": self.stacked_state["params"],
                               "batch_stats": self.stacked_state["batch_stats"]},
                              self.K)

    def _replicated_stacked(self):
        """(params, batch_stats), all-gathered to replicated if the mesh
        shards the model axis (GSPMD can't split the vmapped eval's grouped
        convs along 'model')."""
        params = self.stacked_state["params"]
        bstats = self.stacked_state["batch_stats"]
        if self.mesh is not None and self.mesh.shape.get("model", 1) > 1:
            from jax.sharding import NamedSharding, PartitionSpec
            rep = NamedSharding(self.mesh, PartitionSpec())
            params = jax.device_put(params, rep)
            bstats = jax.device_put(bstats, rep)
        return params, bstats

    _DUMP_CHUNK = 16   # padded slice-chunk length for whole-stream dumps

    def _dump_stream(self, dev, epoch: int, mode: str, models=None) -> None:
        """PNG class-map dumps for one data stream by the given models
        (ref:cotraining_totalloss.py:214-216,229-231 — the reference dumps
        per-iteration mid-epoch predictions; here predictions are recomputed
        in one deterministic pass with the epoch's final params, trading the
        reference's 300 host syncs for a few chunked eval dispatches)."""
        from ..utils.general import save_images

        params, bstats = self._replicated_stacked()
        states = unstack_states({"params": params, "batch_stats": bstats},
                                self.K)
        n, L = len(dev), self._DUMP_CHUNK
        for start in range(0, n, L):
            idx = np.arange(start, start + L, dtype=np.int32)
            mask = idx < n
            idx = np.minimum(idx, n - 1)
            for i in (range(self.K) if models is None else models):
                st = states[i]
                out = self.eval_step(st["params"], st["batch_stats"],
                                     dev.img, dev.gt, jnp.asarray(idx),
                                     jnp.asarray(mask))
                preds = np.asarray(out["pred"])[mask]
                names = [dev.filenames[j] for j in idx[mask]]
                save_images(preds, names, self.save_dir, mode,
                            iter=epoch, seg_num=str(i))

    def _save_train_predictions(self, epoch: int, train_jsd: bool) -> None:
        """``save_train``: model i dumps its own labeled stream (mode
        'train', ref:cotraining_totalloss.py:214-216) +, when the JSD branch
        is active, every model dumps the unlabeled stream (mode 'unlab',
        ref::227-231)."""
        for i, dev in enumerate(self.lab_dev):
            self._dump_stream(dev, epoch, "train", models=[i])
        if train_jsd:
            self._dump_stream(self.unlab_dev, epoch, "unlab")

    def _eval_epoch(self, epoch: int, save: bool = False) -> Dict:
        params, bstats = self._replicated_stacked()
        if save:
            # slow path (ref:cotraining_totalloss.py:301-303): per-model,
            # per-patient eval that materializes the argmax maps as PNGs
            from ..utils.general import save_images
            states = unstack_states({"params": params, "batch_stats": bstats},
                                    self.K)
            for p in range(len(self.val_buckets)):
                idx = self.val_buckets.indices[p]
                mask = self.val_buckets.mask[p]
                for i, st in enumerate(states):
                    out = self.eval_step(st["params"], st["batch_stats"],
                                         self.val_dev.img, self.val_dev.gt,
                                         jnp.asarray(idx), jnp.asarray(mask))
                    preds = np.asarray(out["pred"])[mask]
                    names = [self.val_set.filenames[j] for j in idx[mask]]
                    save_images(preds, names, self.save_dir, "eval",
                                iter=epoch, seg_num=str(i))
        # all K models × all patient buckets in one jit call (the gather and
        # one-hot gt are shared across the vmapped model axis)
        out = self.eval_all_models(
            params, bstats,
            self.val_dev.img, self.val_dev.gt, self._val_idx, self._val_mask)
        d2 = np.asarray(out["dice2d"])              # (P,K,L,C)
        mask = self.val_buckets.mask                # (P,L) bool
        dice2d = np.stack([d2[:, s][mask].mean(0) for s in range(self.K)])
        dice3d = np.asarray(out["dice3d"]).mean(0)  # (P,K,C) → (K,C)
        return {"dice2d": dice2d, "dice3d": dice3d}

    # ------------------------------------------------------------------
    def _scheduler_step(self) -> None:
        for s in self.segmentators:
            s.scheduler_step()
        self.cot_scheduler.step()
        self.adv_scheduler.step()

    def checkpoint(self, metric: np.ndarray, epoch: int) -> None:
        """Per-model best/last checkpoints (ref::458-482) — self-describing
        (arch/optim/scheduler dicts embedded, ref:segmentators.py:81-95) so
        summary.py can rebuild models from checkpoints alone. The stacked
        optimizer state is saved once alongside for exact resume."""
        states = self._unstack_model_states()
        for i, (seg, st) in enumerate(zip(self.segmentators, states)):
            payload = {"segmentator": {
                           "arch_dict": seg.arch_dict,
                           "optim_dict": seg.optim_dict,
                           "scheduler_dict": seg.scheduler_dict,
                           "net_state_dict": st["params"],
                           "batch_stats": st["batch_stats"],
                           "scheduler_state_dict": {"epoch": epoch + 1}},
                       "best_score": float(self.best_scores[i]),
                       "best_epoch": epoch,
                       "cot_scheduler": self.cot_scheduler.state_dict(),
                       "adv_scheduler": self.adv_scheduler.state_dict()}
            save_checkpoint(self.save_dir / f"last_{i}.ckpt", payload)
            if metric[i] > self.best_scores[i]:
                self.best_scores[i] = float(metric[i])
                payload = {**payload, "best_score": float(metric[i])}
                save_checkpoint(self.save_dir / f"best_{i}.ckpt", payload)
        save_checkpoint(self.save_dir / "opt_state.ckpt",
                        {"opt_state": self.stacked_state["opt_state"]})

    def _load_checkpoint(self, checkpoint_dir: str) -> None:
        paths = sorted(Path(checkpoint_dir).glob("last_*.ckpt"))
        assert paths, f"no last_*.ckpt under {checkpoint_dir}"
        params, bss = [], []
        for i, p in enumerate(paths):
            sd = load_checkpoint(p)
            params.append(sd["segmentator"]["net_state_dict"])
            bss.append(sd["segmentator"]["batch_stats"])
            self.best_scores[i] = sd["best_score"]
            self.start_epoch = int(sd["best_epoch"]) + 1
            self.cot_scheduler.load_state_dict(sd["cot_scheduler"])
            self.adv_scheduler.load_state_dict(sd["adv_scheduler"])
            self.segmentators[i].epoch = self.start_epoch
            print(f">>> {p} loaded (best {self.best_scores[i]:.3f})")
        stacked = stack_states([{"params": p, "batch_stats": b}
                                for p, b in zip(params, bss)])
        opt_path = Path(checkpoint_dir) / "opt_state.ckpt"
        opt_state = None
        if opt_path.exists():
            try:
                opt_state = load_checkpoint(opt_path)["opt_state"]
            except Exception as e:  # truncated/corrupt file: warm-start fresh
                print(f">>> opt_state.ckpt unreadable ({e}); reinitializing optimizer")
        if opt_state is None:
            opt_state = self.seg.tx.init(stacked["params"])
        self.stacked_state = {"params": stacked["params"],
                              "batch_stats": stacked["batch_stats"],
                              "opt_state": opt_state}
