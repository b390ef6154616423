"""Model-parallel co-training via shard_map.

The vmapped K-model step (dct_tpu.train.steps) lowers stacked convs to
``feature_group_count=K`` grouped convs, which GSPMD cannot partition along
the model axis. This module expresses the same semantics with ``shard_map``
over a ``('model','data')`` mesh so K co-trained models genuinely parallelize.

General shape: K models over ``n_model`` groups, each group owning
``K_local = K / n_model`` models (a local vmapped stack) — n_model=K gives one
model per group, n_model<K hybridizes the vmap and shard paths. Per shard:

* supervised forwards run on the local model stack (zero cross-model traffic);
* the JSD consistency term all-gathers the K unlabeled probability maps over
  the ``model`` axis (ICI) and reshapes (n_model, K_local, ...) → (K, ...);
  its gradient scatters back via the all_gather transpose;
* the FGSM diversity term: every shard generates an adversarial batch with its
  local slot ``b % K_local`` (equal work in parallel), the attacked model's
  owner group ``b // K_local`` supplies the real adv image + clean probs via
  all_gather, and only model ``a``'s owner contributes (and backprops) the KL;
* gradients are ``pmean``-ed over ``data`` (classic DP), never over ``model``
  (each model's params live on one group).

BN note: inside shard_map each model's BatchNorm reduces over its LOCAL data
shard (per-device BN — the same semantics as the reference's nn.DataParallel
wrapper, which replicates the module so BN runs per replica,
ref:generalframework/models/segmentators.py:34-36); the GSPMD DP path reduces
over the global batch (sync-BN, strictly more faithful to the single-device
run). Semantics equal at data=1 (pinned to 1e-6 in f64 by
tests/test_shard_parity_f64.py::test_inner_f64). At data>1 the divergence is
real but bounded — per-shard batch means/vars differ from global ones, and
the running var drops the between-shard mean variance (law of total
variance). Measured at an adversarially small operating point (2 random 16²
samples per shard, 4 steps, SGD lr=1e-2, f64): running-mean abs drift 0.30,
running-var 34% rel, params 7.6e-2 — quantified and bounded by
tests/test_shard_parity_f64.py::test_inner_f64_bn_divergence; real configs
shard at >=4 samples/shard where batch statistics are tighter.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..data.pipeline import gather_augment_u8, normalize_gather
from ..losses import jsd_2d, kl_div_2d
from ..models.segmentator import Segmentator
from ..optim import apply_direction


def make_shard_cotrain_epoch(seg: Segmentator, mesh: Mesh, K: int, C: int,
                             sup_loss: Callable, train_jsd: bool,
                             train_adv: bool, augment: bool,
                             eps_fgsm: float = 0.03,
                             state_template=None,
                             fuse_forward: bool = True,
                             adv_dtype=None) -> Callable:
    n_model = mesh.shape["model"]
    assert K % n_model == 0, f"K={K} not divisible into {n_model} model groups"
    K_local = K // n_model

    def _is_model_leaf(x) -> bool:
        return hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == K

    if state_template is None:
        raise ValueError("pass state_template= (the stacked state) so per-leaf "
                         "shardings can be derived (optax step counts are "
                         "scalars and must replicate)")
    state_specs = jax.tree_util.tree_map(
        lambda x: P("model") if _is_model_leaf(x) else P(), state_template)

    vapply_own = jax.vmap(seg.apply_train, in_axes=(0, 0, 0))
    vapply_shared = jax.vmap(seg.apply_train, in_axes=(0, 0, None))
    # two-group apply for the fused labeled+unlabeled forward (same
    # optimization as train/steps.py fuse_forward: outer vmap over the
    # LOCAL model stack, inner over the (labeled, unlabeled) group axis)
    vapply_grouped = jax.vmap(jax.vmap(seg.apply_train,
                                       in_axes=(None, None, 0)),
                              in_axes=(0, 0, 0))
    bn_m = getattr(seg, "bn_momentum", None)
    # FGSM-segment dtype override — same knob and rationale as
    # train/steps.py make_cotrain_epoch(adv_dtype=...).
    seg_adv = seg
    if adv_dtype is not None and jnp.dtype(adv_dtype) != seg.compute_dtype:
        import copy
        seg_adv = copy.copy(seg)
        seg_adv.compute_dtype = jnp.dtype(adv_dtype)

    def take_model(tree, i):
        return jax.tree_util.tree_map(lambda x: jnp.take(x, i, axis=0), tree)

    def put_model(tree, sub, i):
        return jax.tree_util.tree_map(
            lambda x, s: jax.lax.dynamic_update_index_in_dim(
                x, s.astype(x.dtype), i, 0), tree, sub)

    def put_model_if(tree, sub, i, cond):
        """put_model gated on a traced predicate (SPMD-uniform)."""
        updated = put_model(tree, sub, i)
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(cond, n, o), updated, tree)

    def local_step(carry, xs, img_u8, gt_u8, lr, lam_cot, lam_adv):
        """Runs per (model, data) shard. carry holds K_local models' state
        (leading K_local axis on every stacked leaf)."""
        idx_lab_l, idx_unlab_l, pair, k = xs          # idx_lab_l (K_local, B_l)
        my = jax.lax.axis_index("model")

        lab = []
        for j in range(K_local):
            if augment:
                # augmentation key keyed on the GLOBAL model id, matching the
                # vmap path's per-model streams; u8-warp fast path is
                # bit-identical to normalize_gather->augment_batch
                im, g = gather_augment_u8(img_u8, gt_u8, idx_lab_l[j],
                                          jax.random.fold_in(k, my * K_local + j))
            else:
                im, g = normalize_gather(img_u8, gt_u8, idx_lab_l[j])
            lab.append((im, g))
        lab_img = jnp.stack([x[0] for x in lab])      # (K_local, B_l, H, W, 1)
        lab_gt = jnp.stack([x[1] for x in lab])       # (K_local, B_l, H, W)
        if augment:
            unlab_img, unlab_gt = gather_augment_u8(img_u8, gt_u8, idx_unlab_l,
                                                    jax.random.fold_in(k, 101))
        else:
            unlab_img, unlab_gt = normalize_gather(img_u8, gt_u8, idx_unlab_l)

        def total_loss(params):
            bs0 = carry["batch_stats"]
            unlab_logits = None
            if (train_jsd and fuse_forward and bn_m is not None
                    and lab_img.shape[1] == unlab_img.shape[0]):
                # fused two-group forward per LOCAL stack (same exact
                # semantics as train/steps.py fuse_forward: vmap keeps BN
                # statistics per (model, group); the two sequential
                # running-stat updates compose as r2 = m·ra_lab + ra_unlab
                # − m·r0 since both per-group updates were taken against r0)
                merged = jnp.stack(
                    [lab_img,
                     jnp.broadcast_to(unlab_img[None], lab_img.shape)],
                    axis=1)                       # (K_local,2,B,H,W,1)
                logits_kg, bs_kg = vapply_grouped(params, bs0, merged)
                lab_logits = logits_kg[:, 0]
                unlab_logits = logits_kg[:, 1]
                bs = jax.tree_util.tree_map(
                    lambda kg, r0: bn_m * kg[:, 0] + kg[:, 1] - bn_m * r0,
                    bs_kg, bs0)
                sup_each = jax.vmap(sup_loss)(lab_logits, lab_gt)
                supervised = jnp.sum(sup_each)
                my_probs = jax.nn.softmax(unlab_logits, axis=-1)
                all_probs = jax.lax.all_gather(my_probs, "model")
                all_probs = all_probs.reshape((K,) + all_probs.shape[2:])
                jsd_loss = jnp.mean(jsd_2d(all_probs))
                jsd_loss = jax.lax.pmean(jsd_loss, "data")
            else:
                bs = bs0
                lab_logits, bs = vapply_own(params, bs, lab_img)
                sup_each = jax.vmap(sup_loss)(lab_logits, lab_gt)  # (K_local,)
                supervised = jnp.sum(sup_each)

                jsd_loss = jnp.zeros((), lab_logits.dtype)
                if train_jsd:
                    unlab_logits, bs = vapply_shared(params, bs, unlab_img)
                    my_probs = jax.nn.softmax(unlab_logits, axis=-1)
                    all_probs = jax.lax.all_gather(my_probs, "model")
                    all_probs = all_probs.reshape((K,) + all_probs.shape[2:])
                    jsd_loss = jnp.mean(jsd_2d(all_probs))
                    jsd_loss = jax.lax.pmean(jsd_loss, "data")

            adv_loss = jnp.zeros((), lab_logits.dtype)
            if train_adv:
                if K == 2:
                    # sorted 2-of-2 draw is always (0, 1) — static indices
                    # fold the per-leaf take/put into free slices (same
                    # specialization as train/steps.py)
                    a, b = 0, 1
                else:
                    a, b = pair[0], pair[1]
                a_own, a_loc = a // K_local, a % K_local
                b_own, b_loc = b // K_local, b % K_local
                # every shard attacks with its local slot b_loc (parallel,
                # equal work); only shard b_own's result is the real one
                params_b = jax.lax.stop_gradient(take_model(params, b_loc))
                bs_b = jax.lax.stop_gradient(take_model(bs, b_loc))
                img_b = jnp.take(lab_img, b_loc, axis=0)
                gt_b = jnp.take(lab_gt, b_loc, axis=0)
                img_cat = jnp.concatenate([img_b, unlab_img], axis=0)

                def gen_ce(x):
                    lg, gbs = seg_adv.apply_train(params_b, bs_b, x)
                    pseudo = jnp.argmax(lg[gt_b.shape[0]:], axis=-1)
                    gt_full = jnp.concatenate(
                        [gt_b, jax.lax.stop_gradient(pseudo)], axis=0)
                    return sup_loss(lg, gt_full), (lg, gbs)

                g, (gen_logits, gen_bs) = jax.grad(gen_ce, has_aux=True)(img_cat)
                # the attacked model's BN stats advance through the generation
                # forward (reference train-mode attack semantics) — only on
                # its owner shard, at its local slot
                bs = put_model_if(bs, gen_bs, b_loc, my == b_own)
                my_adv = jax.lax.stop_gradient(img_cat + eps_fgsm * jnp.sign(g))
                my_real = jax.lax.stop_gradient(
                    jax.nn.softmax(gen_logits, axis=-1))
                adv_img = jnp.take(jax.lax.all_gather(my_adv, "model"),
                                   b_own, axis=0)
                real_probs = jnp.take(jax.lax.all_gather(my_real, "model"),
                                      b_own, axis=0)
                # every shard runs the adv forward with its slot a_loc; only
                # model a's owner pays/backprops the KL term
                params_a = take_model(params, a_loc)
                bs_a = take_model(bs, a_loc)
                adv_logits, bs2 = seg_adv.apply_train(params_a, bs_a, adv_img)
                kl = jnp.mean(kl_div_2d(jax.nn.softmax(adv_logits, -1),
                                        real_probs))
                adv_loss = jax.lax.pmean(kl * (my == a_own).astype(kl.dtype),
                                         "data")
                bs = put_model_if(bs, bs2, a_loc, my == a_own)

            # jsd enters each of the n_model shard totals once, and the
            # all_gather transpose SUMS the n_model identical cotangents
            # into each shard's probs — scale by 1/n_model so the summed
            # JSD gradient equals the joint (vmap) gradient exactly
            # (pinned to 1e-6 by tests/test_shard_parity_f64.py)
            total = (supervised + lam_cot * jsd_loss / n_model
                     + lam_adv * adv_loss)
            return total, {"sup_each": sup_each, "jsd": jsd_loss,
                           "adv": adv_loss, "batch_stats": bs,
                           "lab_logits": lab_logits,
                           "unlab_logits": unlab_logits}

        (_, aux), grads = jax.value_and_grad(total_loss, has_aux=True)(
            carry["params"])
        grads = jax.lax.pmean(grads, "data")       # classic DP all-reduce
        bs = jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, "data")
                                    if jnp.issubdtype(x.dtype, jnp.floating) else x,
                                    aux["batch_stats"])
        direction, new_opt = seg.tx.update(grads, carry["opt_state"],
                                           carry["params"])
        new_params = apply_direction(carry["params"], direction, lr)
        new_carry = {"params": new_params, "batch_stats": bs,
                     "opt_state": new_opt}
        from ..train.steps import _dice_rows
        lab_dice = jax.vmap(_dice_rows, in_axes=(0, 0, None))(
            aux["lab_logits"], lab_gt, C)           # (K_local, B_l, C)
        if train_jsd:
            unlab_dice = jax.vmap(_dice_rows, in_axes=(0, None, None))(
                aux["unlab_logits"], unlab_gt, C)   # (K_local, Bu_l, C)
        else:
            unlab_dice = jnp.zeros((K_local, unlab_gt.shape[0], C),
                                   lab_dice.dtype)
        # metrics carry a K_local model axis so out_specs can concatenate it
        # to K; jsd is identical across shards, adv is scaled so the host's
        # sum over the K axis reconstructs the per-iteration total
        metrics = {"sup_loss": jax.lax.pmean(aux["sup_each"], "data"),
                   "jsd_loss": jnp.broadcast_to(aux["jsd"], (K_local,)),
                   "adv_loss": jnp.broadcast_to(aux["adv"] / K_local, (K_local,)),
                   "lab_dice": jax.lax.pmean(lab_dice, "data"),
                   "unlab_dice": jax.lax.pmean(unlab_dice, "data")}
        return new_carry, metrics

    def shard_body(state_l, img_u8, gt_u8, idx_lab_l, idx_unlab_l, pairs, keys,
                   lr, lam_cot, lam_adv):
        def scan_step(c, xs):
            return local_step(c, xs, img_u8, gt_u8, lr, lam_cot, lam_adv)
        return jax.lax.scan(scan_step, state_l,
                            (idx_lab_l, idx_unlab_l, pairs, keys))

    metric_specs = {"sup_loss": P(None, "model"), "jsd_loss": P(None, "model"),
                    "adv_loss": P(None, "model"), "lab_dice": P(None, "model"),
                    "unlab_dice": P(None, "model")}
    sharded = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(state_specs, P(), P(),
                  P(None, "model", "data"),   # idx_lab (T,K,B)
                  P(None, "data"),            # idx_unlab (T,Bu)
                  P(), P(), P(), P(), P()),
        out_specs=(state_specs, metric_specs),
        check_vma=False)

    @partial(jax.jit, donate_argnums=(0,))
    def epoch(stacked_state, img_u8, gt_u8, idx_lab, idx_unlab, pairs, key,
              lr, lam_cot, lam_adv):
        keys = jax.random.split(key, idx_lab.shape[0])
        return sharded(stacked_state, img_u8, gt_u8, idx_lab, idx_unlab,
                       pairs, keys, lr, lam_cot, lam_adv)

    return epoch
