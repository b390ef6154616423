"""The fused jitted train/eval steps — the framework's hot path.

Design (vs ref:generalframework/trainer/cotraining_totalloss.py:203-264, which
runs K sequential torch forwards, a Python FGSM sub-procedure and per-iteration
``.item()`` syncs):

* K co-trained models = ONE stacked param pytree (leading K axis) + vmapped
  flax apply. Supervised CE for all K, the JSD consistency term on the shared
  unlabeled batch, the FGSM diversity term, and ONE ``jax.value_and_grad``
  over the stacked params (the reference back-propagates the combined loss
  once through all models, ref::245-248).
* A whole epoch (300 iterations, ref::191) is a single ``lax.scan`` inside one
  jit call: batches are index rows into the device-resident uint8 dataset,
  normalization + augmentation are on-device, metrics are accumulated as
  small stacked arrays and fetched once per epoch. Zero host Python per
  iteration.
* BatchNorm threading follows the reference's mutation order per iteration:
  labeled forward (per model) → unlabeled forward (all models) → FGSM
  generation forward (attacked model) → adversarial forward (updated model)
  — all in train mode (ref::178, BN batch stats), stats carried functionally.

Detach parity (SURVEY §7.3): FGSM adversarial image and its source
predictions are stop-gradiented (ref:AEGenerator.py:31, ref::392); JSD couples
all models (no detach); FGSM generation contributes **no** parameter
gradients (the reference zero_grads after the generator's backward).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..data.pipeline import gather_augment_u8, normalize_gather
from ..losses import jsd_2d, kl_div_2d
from ..models.segmentator import Segmentator
from ..optim import apply_direction
from ..utils.general import class2one_hot, dice_coef, probs2one_hot


def _masked_ce(logits, gt, mask, weight=None):
    """CE over valid slices only (padded patient buckets).

    One-hot select instead of take_along_axis — same rewrite as
    losses.cross_entropy2d (gather + backward scatter are the expensive
    forms on TPU; the class-axis compare fuses away)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = gt[..., None] == jnp.arange(logits.shape[-1], dtype=gt.dtype)
    nll = -jnp.sum(jnp.where(onehot, logp, 0), axis=-1)
    if weight is not None:
        wv = jnp.asarray(weight, logits.dtype)
        w = jnp.sum(jnp.where(onehot, wv, 0), axis=-1)
    else:
        w = jnp.ones_like(nll)
    w = w * mask[:, None, None]
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def _dice_rows(logits, gt, C):
    """(B,C) hard 2D dice rows, on device (ref:metrics/dice_meter.py:12-33)."""
    pred_oh = probs2one_hot(jax.nn.softmax(logits, axis=-1))
    gt_oh = class2one_hot(gt, C)
    return dice_coef(gt_oh, pred_oh)


# ---------------------------------------------------------------------------
# supervised epoch (Trainer hot path, ref:trainer.py:147-206)
# ---------------------------------------------------------------------------

def make_supervised_epoch(seg: Segmentator, loss_fn: Callable, C: int,
                          augment: bool) -> Callable:
    """Returns jitted ``epoch(state, img_u8, gt_u8, idx (T,B), key, lr)``
    → (new_state, metrics {loss (T,), dice (T,B,C)})."""

    @partial(jax.jit, donate_argnums=(0,))
    def epoch(state, img_u8, gt_u8, idx, key, lr):
        def one_step(carry, xs):
            batch_idx, k = xs
            if augment:
                img, gt = gather_augment_u8(img_u8, gt_u8, batch_idx, k)
            else:
                img, gt = normalize_gather(img_u8, gt_u8, batch_idx)

            def loss_of(params):
                logits, new_bs = seg.apply_train(
                    params, carry["batch_stats"], img,
                    dropout_rng=jax.random.fold_in(k, 1))
                return loss_fn(logits, gt), (logits, new_bs)

            (loss, (logits, new_bs)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(carry["params"])
            direction, new_opt = seg.tx.update(grads, carry["opt_state"],
                                               carry["params"])
            new_params = apply_direction(carry["params"], direction, lr)
            new_carry = {"params": new_params, "batch_stats": new_bs,
                         "opt_state": new_opt}
            return new_carry, {"loss": loss, "dice": _dice_rows(logits, gt, C)}

        keys = jax.random.split(key, idx.shape[0])
        return jax.lax.scan(one_step, state, (idx, keys))

    return epoch


# ---------------------------------------------------------------------------
# patient-bucket eval step (ref:trainer.py:173-175, cotraining:273-318)
# ---------------------------------------------------------------------------

def make_eval_patient_step(seg: Segmentator, C: int, loss_weight=None) -> Callable:
    """Returns jitted ``step(params, batch_stats, img_u8, gt_u8, idx (L,),
    mask (L,))`` → per-slice 2D dice (L,C), whole-volume 3D dice (C,), masked
    CE loss, argmax prediction map. 3D dice = ``bcwh->c`` over the volume
    (padded slices excluded by the mask)."""

    def body(params, batch_stats, img_u8, gt_u8, idx, mask):
        img, gt = normalize_gather(img_u8, gt_u8, idx)
        logits = seg.apply_eval(params, batch_stats, img)
        maskf = mask.astype(logits.dtype)
        loss = _masked_ce(logits, gt, maskf, loss_weight)
        pred_oh = probs2one_hot(jax.nn.softmax(logits, axis=-1)) * maskf[:, None, None, None]
        gt_oh = class2one_hot(gt, C) * maskf[:, None, None, None]
        dice2d = dice_coef(gt_oh, pred_oh)                       # (L,C)
        inter = jnp.sum(gt_oh * pred_oh, axis=(0, 1, 2))
        sums = jnp.sum(gt_oh, axis=(0, 1, 2)) + jnp.sum(pred_oh, axis=(0, 1, 2))
        dice3d = (2 * inter + 1e-8) / (sums + 1e-8)              # (C,)
        return {"dice2d": dice2d, "dice3d": dice3d, "loss": loss,
                "pred": jnp.argmax(logits, axis=-1)}

    return jax.jit(body)


def make_eval_all_step(seg: Segmentator, C: int, loss_weight=None) -> Callable:
    """Whole-val-set eval in ONE jit call: ``step(params, batch_stats,
    img_u8, gt_u8, indices (P,L), masks (P,L))`` → dict of per-patient
    stacked metrics {dice2d (P,L,C), dice3d (P,C), loss (P,)}. A lax.map over
    patient buckets — compiles once, no per-patient dispatch/host syncs
    (predictions are not materialized; use make_eval_patient_step to dump
    masks)."""

    def one_patient(params, batch_stats, img_u8, gt_u8, idx, mask):
        img, gt = normalize_gather(img_u8, gt_u8, idx)
        logits = seg.apply_eval(params, batch_stats, img)
        maskf = mask.astype(logits.dtype)
        loss = _masked_ce(logits, gt, maskf, loss_weight)
        pred_oh = probs2one_hot(jax.nn.softmax(logits, axis=-1)) * maskf[:, None, None, None]
        gt_oh = class2one_hot(gt, C) * maskf[:, None, None, None]
        dice2d = dice_coef(gt_oh, pred_oh)
        inter = jnp.sum(gt_oh * pred_oh, axis=(0, 1, 2))
        sums = jnp.sum(gt_oh, axis=(0, 1, 2)) + jnp.sum(pred_oh, axis=(0, 1, 2))
        return {"dice2d": dice2d,
                "dice3d": (2 * inter + 1e-8) / (sums + 1e-8),
                "loss": loss}

    @jax.jit
    def step(params, batch_stats, img_u8, gt_u8, indices, masks):
        return jax.lax.map(
            lambda xs: one_patient(params, batch_stats, img_u8, gt_u8, *xs),
            (indices, masks))

    return step


def make_eval_all_models_step(seg: Segmentator, C: int, loss_weight=None) -> Callable:
    """All K models × all patients in ONE jit call: ``step(stacked_params,
    stacked_batch_stats, img_u8, gt_u8, indices (P,L), masks (P,L))`` →
    {dice2d (P,K,L,C), dice3d (P,K,C), loss (P,K)}. The patient gather +
    one-hot gt are computed once and shared by the vmapped model axis — K
    dispatches and K redundant gathers collapse into one."""

    def one_patient(params, batch_stats, img_u8, gt_u8, idx, mask):
        img, gt = normalize_gather(img_u8, gt_u8, idx)
        maskf = mask.astype(img.dtype)
        gt_oh = class2one_hot(gt, C) * maskf[:, None, None, None]
        gt_sum = jnp.sum(gt_oh, axis=(0, 1, 2))

        def per_model(p, bs):
            logits = seg.apply_eval(p, bs, img)
            loss = _masked_ce(logits, gt, maskf.astype(logits.dtype), loss_weight)
            pred_oh = probs2one_hot(jax.nn.softmax(logits, axis=-1)) \
                * maskf[:, None, None, None]
            dice2d = dice_coef(gt_oh, pred_oh)
            inter = jnp.sum(gt_oh * pred_oh, axis=(0, 1, 2))
            sums = gt_sum + jnp.sum(pred_oh, axis=(0, 1, 2))
            return {"dice2d": dice2d,
                    "dice3d": (2 * inter + 1e-8) / (sums + 1e-8),
                    "loss": loss}

        return jax.vmap(per_model)(params, batch_stats)

    @jax.jit
    def step(params, batch_stats, img_u8, gt_u8, indices, masks):
        return jax.lax.map(
            lambda xs: one_patient(params, batch_stats, img_u8, gt_u8, *xs),
            (indices, masks))

    return step


def make_summary_step(seg: Segmentator, C: int, ensemble: str = "soft") -> Callable:
    """The whole ensemble evaluation (ref:Summary.py:147-172) as ONE jit:
    ``step(stacked_params, stacked_batch_stats, img_u8, gt_u8,
    indices (P,L), masks (P,L))`` → per-model + ensemble class maps (uint8,
    for host-side Hausdorff/kappa/PNG dumps) and per-slice 2D / per-patient
    3D dices, all padded by the patient masks.

    Replaces summary.py's per-patient-per-model dispatch loop (P×K jit calls
    each fetching full (L,H,W,C) float probs over the device→host tunnel)
    with one dispatch and a uint8-class-map fetch — the probs never leave
    the device.
    """

    def dices(pred, gt_oh, m4, gt_sum2, gt_sum3):
        pred_oh = class2one_hot(pred, C) * m4
        inter2 = jnp.sum(gt_oh * pred_oh, axis=(1, 2))
        sums2 = gt_sum2 + jnp.sum(pred_oh, axis=(1, 2))
        inter3 = jnp.sum(gt_oh * pred_oh, axis=(0, 1, 2))
        sums3 = gt_sum3 + jnp.sum(pred_oh, axis=(0, 1, 2))
        return ((2 * inter2 + 1e-8) / (sums2 + 1e-8),
                (2 * inter3 + 1e-8) / (sums3 + 1e-8))

    def one_patient(params, batch_stats, img_u8, gt_u8, idx, mask):
        img, gt = normalize_gather(img_u8, gt_u8, idx)
        m4 = mask.astype(img.dtype)[:, None, None, None]
        gt_oh = class2one_hot(gt, C) * m4
        gt_sum2 = jnp.sum(gt_oh, axis=(1, 2))       # (L,C)
        gt_sum3 = jnp.sum(gt_oh, axis=(0, 1, 2))    # (C,)

        probs = jax.vmap(
            lambda p, bs: jax.nn.softmax(seg.apply_eval(p, bs, img), -1)
        )(params, batch_stats)                      # (K,L,H,W,C)
        model_pred = jnp.argmax(probs, axis=-1)     # (K,L,H,W)
        if ensemble == "soft":
            ens_pred = jnp.argmax(jnp.mean(probs, axis=0), axis=-1)
        else:
            # pixelwise majority vote; argmax ties resolve to the smallest
            # class id (documented divergence, PARITY.md)
            votes = jnp.sum(jax.nn.one_hot(model_pred, C, dtype=jnp.int32,
                                           axis=-1), axis=0)
            ens_pred = jnp.argmax(votes, axis=-1)

        d2m, d3m = jax.vmap(dices, in_axes=(0, None, None, None, None))(
            model_pred, gt_oh, m4, gt_sum2, gt_sum3)
        d2e, d3e = dices(ens_pred, gt_oh, m4, gt_sum2, gt_sum3)
        return {"pred": model_pred.astype(jnp.uint8),
                "ens": ens_pred.astype(jnp.uint8),
                "dice2d": d2m, "dice3d": d3m,
                "ens_dice2d": d2e, "ens_dice3d": d3e}

    @jax.jit
    def step(params, batch_stats, img_u8, gt_u8, indices, masks):
        return jax.lax.map(
            lambda xs: one_patient(params, batch_stats, img_u8, gt_u8, *xs),
            (indices, masks))

    return step


# ---------------------------------------------------------------------------
# the K-model co-training epoch (the centerpiece)
# ---------------------------------------------------------------------------

def make_cotrain_epoch(seg: Segmentator, K: int, C: int,
                       sup_loss: Callable,
                       train_jsd: bool, train_adv: bool,
                       augment_labeled: bool, augment_unlabeled: bool,
                       eps_fgsm: float = 0.03,
                       fuse_aug="merged", fuse_forward: bool = True,
                       adv_dtype=None,
                       _dynamic_pair: bool = False) -> Callable:
    """Build the jitted co-training epoch.

    ``epoch(stacked_state, img_u8, gt_u8, idx_lab (T,K,B), idx_unlab (T,Bu),
    pairs (T,2) int32, key, lr, λ_cot, λ_adv)`` →
    (new_state, metrics {sup_loss (T,K), jsd_loss (T,), adv_loss (T,),
    lab_dice (T,K,B,C), unlab_dice (T,K,Bu,C)}).

    All K labeled streams index into the same device-resident train split;
    ``pairs`` is the per-iteration random 2-of-K adversarial choice
    (ref::235-242; the draw is sorted, so with K=2 it is always (0,1):
    attack model 1, update model 0 — the compiled epoch relies on this and
    specializes K=2 to static indices; pass K>2 for data-dependent pairs).

    ``fuse_aug`` selects the augmentation fusion level (all three produce
    bit-identical draws — pinned by tests/test_data.py):
      * ``"merged"`` / ``True`` — ONE gather + ONE warp over all K·B+Bu
        images (fastest single-chip; the (K,B)→K·B reshape mis-shards under
        a GSPMD-DP mesh, see CLAUDE.md).
      * ``"split"`` — one (K,B) gather + one K-vmapped warp for the labeled
        streams plus one gather+warp for the unlabeled stream; the K and B
        axes stay separate, so the GSPMD partitioner shards it cleanly.
      * ``False`` — per-stream gather+warp (K+1 calls).

    ``fuse_forward`` merges the labeled and unlabeled forwards (steps (1)
    and (2) below) into ONE two-group vmapped apply when ``train_jsd`` and
    B == Bu: the group axis keeps BatchNorm statistics per-stream (vmap
    hides the axis from BN's reduction), and the two sequential
    running-stat updates are composed exactly from the one pass
    (r2 = m·ra_lab + ra_unlab − m·r0, m the arch's uniform BN momentum) —
    bit-equal semantics up to float reassociation
    (tests/test_step_semantics.py::test_fuse_forward_matches_unfused),
    at half the conv-op count of the two separate applies. On the tunnel
    chip, where per-conv dispatch latency floors the small-batch step
    (BASELINE.md conv-efficiency study), fewer-but-bigger convs is the
    win; XLA cannot do this merge itself because the two applies see
    different BN reduction scopes.

    ``adv_dtype`` (config: Trainer.adv_dtype) overrides the compute dtype of
    the FGSM segment only — generation forward, input gradient, sign step and
    the adversarial forward — leaving the main pass in the arch's
    compute_dtype. Motivation (BASELINE.md "512² step-decomposition ladder"):
    on some tunnel-compiler sessions the bf16 512² binaries produce
    adv-term NaN from iteration 0 (sup/jsd stay finite and correct) while
    fp32 is always clean; ``adv_dtype=float32`` pins the fragile segment to
    fp32 at a fraction of full-fp32's cost (the segment touches 8 of the 24
    images per step). Same math, higher precision — semantics unchanged.
    """
    seg_adv = seg
    if adv_dtype is not None and jnp.dtype(adv_dtype) != seg.compute_dtype:
        import copy
        seg_adv = copy.copy(seg)
        seg_adv.compute_dtype = jnp.dtype(adv_dtype)

    vapply_own = jax.vmap(seg.apply_train, in_axes=(0, 0, 0))        # per-model batch
    vapply_shared = jax.vmap(seg.apply_train, in_axes=(0, 0, None))  # shared batch
    # two-group apply: outer vmap over K models, inner over the
    # (labeled, unlabeled) group axis with shared params/stats
    vapply_grouped = jax.vmap(jax.vmap(seg.apply_train,
                                       in_axes=(None, None, 0)),
                              in_axes=(0, 0, 0))
    bn_m = getattr(seg, "bn_momentum", None)

    def take_model(tree, i):
        return jax.tree_util.tree_map(lambda x: jnp.take(x, i, axis=0), tree)

    def put_model(tree, sub, i):
        return jax.tree_util.tree_map(
            lambda x, s: jax.lax.dynamic_update_index_in_dim(
                x, s.astype(x.dtype), i, 0), tree, sub)

    def fgsm_generate(params_b, bs_b, img_cat, gt_b):
        """FGSM on concat(labeled_b, unlabeled) (ref:AEGenerator.py:16-51 +
        cotraining::381-390). Labels beyond the gt batch are the model's own
        argmax pseudo-labels (ref:AEGenerator.py:24-25). Entirely
        stop-gradiented w.r.t. parameters."""
        params_b = jax.lax.stop_gradient(params_b)
        bs_b = jax.lax.stop_gradient(bs_b)

        def ce_of_input(x):
            logits, new_bs = seg_adv.apply_train(params_b, bs_b, x)
            pseudo = jnp.argmax(logits[gt_b.shape[0]:], axis=-1)
            gt_full = jnp.concatenate([gt_b, jax.lax.stop_gradient(pseudo)], axis=0)
            return sup_loss(logits, gt_full), (logits, new_bs)

        g, (logits, new_bs) = jax.grad(ce_of_input, has_aux=True)(img_cat)
        adv_img = jax.lax.stop_gradient(img_cat + eps_fgsm * jnp.sign(g))
        real_probs = jax.lax.stop_gradient(jax.nn.softmax(logits, axis=-1))
        return adv_img, real_probs, new_bs

    @partial(jax.jit, donate_argnums=(0,))
    def epoch(stacked_state, img_u8, gt_u8, idx_lab, idx_unlab, pairs, key,
              lr, lam_cot, lam_adv):
        def one_step(carry, xs):
            idx_lab_t, idx_unlab_t, pair, k = xs

            # ---- gather + augment (on device) ----------------------------
            if augment_labeled and augment_unlabeled and fuse_aug == "split":
                # DP-safe fusion: one gather + one K-vmapped warp for all K
                # labeled streams (K and B axes kept separate — merging them
                # makes the GSPMD partitioner split the vmapped grouped convs
                # along feature groups), one gather+warp for the unlabeled
                # stream. Draws identical to the per-stream path.
                from ..data.augment import (sample_aug_thetas,
                                            warp_gathered_u8)
                B = idx_lab_t.shape[1]
                h, w = img_u8.shape[1], img_u8.shape[2]
                lab_img_u8 = jnp.take(img_u8, idx_lab_t, axis=0)   # (K,B,H,W)
                lab_gt_u8 = jnp.take(gt_u8, idx_lab_t, axis=0)
                thetas_lab = jnp.stack(
                    [sample_aug_thetas(jax.random.fold_in(k, i), B, h, w)
                     for i in range(K)])                           # (K,B,2,3)
                lab_img, lab_gt = jax.vmap(warp_gathered_u8)(
                    lab_img_u8, lab_gt_u8, thetas_lab)
                unlab_img, unlab_gt = gather_augment_u8(
                    img_u8, gt_u8, idx_unlab_t, jax.random.fold_in(k, 101))
            elif augment_labeled and augment_unlabeled and fuse_aug:
                # fused: ONE gather + ONE warp for all K labeled streams +
                # the unlabeled stream. Each stream's thetas still come from
                # its own key (fold_in(k, i) / fold_in(k, 101)), so the
                # augmentation draws are bit-identical to the separate
                # augment_batch calls this replaces.
                # (folding the warp into ONE gather straight out of the u8
                # dataset — pipeline.warp_gather_normalize — measured 148.4
                # vs 180.3 img/s: arbitrary indices into the 110M-element
                # array lose the per-image gather's locality; negative
                # result, two-step kept)
                from ..data.augment import (sample_aug_thetas,
                                            warp_gathered_u8)
                B = idx_lab_t.shape[1]
                Bu = idx_unlab_t.shape[0]
                idx_all = jnp.concatenate(
                    [idx_lab_t.reshape(-1), idx_unlab_t], axis=0)
                img_all_u8 = jnp.take(img_u8, idx_all, axis=0)
                gt_all_u8 = jnp.take(gt_u8, idx_all, axis=0)
                h, w = img_all_u8.shape[1], img_all_u8.shape[2]
                thetas = jnp.concatenate(
                    [sample_aug_thetas(jax.random.fold_in(k, i), B, h, w)
                     for i in range(K)]
                    + [sample_aug_thetas(jax.random.fold_in(k, 101), Bu, h, w)],
                    axis=0)
                # normalize-then-warp (measured faster than the u8-warp
                # variant; see augment.warp_gathered_u8 / BASELINE.md)
                img_all, gt_all = warp_gathered_u8(img_all_u8,
                                                   gt_all_u8, thetas)
                lab_img = img_all[:K * B].reshape((K, B) + img_all.shape[1:])
                lab_gt = gt_all[:K * B].reshape((K, B) + gt_all.shape[1:])
                unlab_img, unlab_gt = img_all[K * B:], gt_all[K * B:]
            else:
                def gather_lab(i):
                    if augment_labeled:
                        return gather_augment_u8(img_u8, gt_u8, idx_lab_t[i],
                                                 jax.random.fold_in(k, i))
                    return normalize_gather(img_u8, gt_u8, idx_lab_t[i])

                lab = [gather_lab(i) for i in range(K)]
                lab_img = jnp.stack([x[0] for x in lab])   # (K,B,H,W,1)
                lab_gt = jnp.stack([x[1] for x in lab])    # (K,B,H,W)
                if augment_unlabeled:
                    unlab_img, unlab_gt = gather_augment_u8(
                        img_u8, gt_u8, idx_unlab_t, jax.random.fold_in(k, 101))
                else:
                    unlab_img, unlab_gt = normalize_gather(img_u8, gt_u8,
                                                           idx_unlab_t)

            def total_loss(params_stack):
                bs0 = carry["batch_stats"]
                unlab_logits = None
                if (train_jsd and fuse_forward and bn_m is not None
                        and lab_img.shape[1] == unlab_img.shape[0]):
                    # (1)+(2) fused: each model forwards its labeled batch
                    # AND the shared unlabeled batch in one two-group apply
                    # (exact semantics — see the fuse_forward note above).
                    merged = jnp.stack(
                        [lab_img,
                         jnp.broadcast_to(unlab_img[None], lab_img.shape)],
                        axis=1)                              # (K,2,B,H,W,1)
                    logits_kg, bs_kg = vapply_grouped(params_stack, bs0,
                                                      merged)
                    lab_logits = logits_kg[:, 0]
                    unlab_logits = logits_kg[:, 1]
                    # compose the two sequential running-stat updates from
                    # the per-group ones (both computed against r0):
                    # r2 = m·ra_lab + ra_unlab − m·r0
                    bs = jax.tree_util.tree_map(
                        lambda kg, r0: bn_m * kg[:, 0] + kg[:, 1]
                        - bn_m * r0, bs_kg, bs0)
                    sup_each = jax.vmap(sup_loss)(lab_logits, lab_gt)  # (K,)
                    supervised = jnp.sum(sup_each)
                    probs = jax.nn.softmax(unlab_logits, axis=-1)
                    jsd_loss = jnp.mean(jsd_2d(probs))
                else:
                    bs = bs0
                    # (1) supervised, all K at once (ref::208-218)
                    lab_logits, bs = vapply_own(params_stack, bs, lab_img)
                    sup_each = jax.vmap(sup_loss)(lab_logits, lab_gt)  # (K,)
                    supervised = jnp.sum(sup_each)

                    jsd_loss = jnp.zeros((), lab_logits.dtype)
                    if train_jsd:
                        # (2) JSD on the shared unlabeled batch (ref::219-226)
                        unlab_logits, bs = vapply_shared(params_stack, bs,
                                                         unlab_img)
                        probs = jax.nn.softmax(unlab_logits, axis=-1)
                        jsd_loss = jnp.mean(jsd_2d(probs))

                adv_loss = jnp.zeros((), lab_logits.dtype)
                if train_adv:
                    # (3) FGSM diversity on the cached batches (ref::371-442):
                    # attack model b, feed adv images to model a,
                    # KL(a(adv) ‖ b(clean).detach()).
                    if K == 2 and not _dynamic_pair:
                        # the sorted 2-of-2 draw is always (0, 1)
                        # (ref::235-242; cotrainer.py pair sampling) — use
                        # static indices so every take_model/put_model below
                        # lowers to a free slice/update instead of ~4
                        # dynamic-slice ops per param/batch-stat leaf per
                        # step (dispatch latency floors the small-batch
                        # step; see BASELINE.md conv-efficiency study).
                        a, b = 0, 1
                    else:
                        a, b = pair[0], pair[1]
                    params_b = take_model(params_stack, b)
                    bs_b = take_model(bs, b)
                    img_cat = jnp.concatenate(
                        [jnp.take(lab_img, b, axis=0), unlab_img], axis=0)
                    gt_b = jnp.take(lab_gt, b, axis=0)
                    adv_img, real_probs, new_bs_b = fgsm_generate(
                        params_b, bs_b, img_cat, gt_b)
                    bs = put_model(bs, new_bs_b, b)
                    params_a = take_model(params_stack, a)
                    bs_a = take_model(bs, a)
                    adv_logits, new_bs_a = seg_adv.apply_train(params_a, bs_a, adv_img)
                    bs = put_model(bs, new_bs_a, a)
                    adv_probs = jax.nn.softmax(adv_logits, axis=-1)
                    adv_loss = jnp.mean(kl_div_2d(adv_probs, real_probs))

                total = supervised + lam_cot * jsd_loss + lam_adv * adv_loss
                aux = {"sup_each": sup_each, "jsd": jsd_loss, "adv": adv_loss,
                       "lab_logits": lab_logits, "unlab_logits": unlab_logits,
                       "batch_stats": bs}
                return total, aux

            (_, aux), grads = jax.value_and_grad(total_loss, has_aux=True)(
                carry["params"])
            direction, new_opt = seg.tx.update(grads, carry["opt_state"],
                                               carry["params"])
            new_params = apply_direction(carry["params"], direction, lr)

            lab_dice = jax.vmap(_dice_rows, in_axes=(0, 0, None))(
                aux["lab_logits"], lab_gt, C)                          # (K,B,C)
            if train_jsd:
                unlab_dice = jax.vmap(_dice_rows, in_axes=(0, None, None))(
                    aux["unlab_logits"], unlab_gt, C)                  # (K,Bu,C)
            else:
                unlab_dice = jnp.zeros((K, unlab_gt.shape[0], C), lab_dice.dtype)

            new_carry = {"params": new_params, "batch_stats": aux["batch_stats"],
                         "opt_state": new_opt}
            metrics = {"sup_loss": aux["sup_each"], "jsd_loss": aux["jsd"],
                       "adv_loss": aux["adv"], "lab_dice": lab_dice,
                       "unlab_dice": unlab_dice}
            return new_carry, metrics

        keys = jax.random.split(key, idx_lab.shape[0])
        return jax.lax.scan(one_step, stacked_state,
                            (idx_lab, idx_unlab, pairs, keys))

    return epoch
