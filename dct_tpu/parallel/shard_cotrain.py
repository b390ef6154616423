"""Model-parallel co-training via shard_map.

The vmapped K-model step (dct_tpu.train.steps) lowers stacked convs to
``feature_group_count=K`` grouped convs, which GSPMD cannot partition along
the model axis. This module expresses the same semantics with ``shard_map``
over a ``('model','data')`` mesh so K co-trained models genuinely parallelize:

* each model shard owns K/n_model models' params/opt state and runs its own
  supervised forwards (zero cross-model traffic);
* the JSD consistency term all-gathers the K unlabeled probability maps over
  the ``model`` axis (ICI); its gradient scatters back via the all_gather
  transpose;
* the FGSM diversity term: EVERY shard generates an adversarial batch with
  its local model (equal work in parallel — same wall-clock as one shard
  doing it), the attacked model's adv image + clean probs are all-gathered,
  and only the updating model's owner contributes the KL term;
* gradients are ``pmean``-ed over ``data`` (classic DP), never over ``model``
  (each model's params live on one group).

BN note: inside shard_map each model's BatchNorm reduces over its LOCAL data
shard (per-device BN, the common DP practice); the GSPMD DP path reduces over
the global batch. Semantics equal at data=1.

Currently specialized to K_local = K/n_model = 1 (e.g. 2 models on a (2, N)
mesh) — the deployment shape that matters for 2-model co-training.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..data.augment import augment_batch
from ..data.pipeline import normalize_gather
from ..losses import jsd_2d, kl_div_2d
from ..models.segmentator import Segmentator
from ..optim import apply_direction


def make_shard_cotrain_epoch(seg: Segmentator, mesh: Mesh, K: int, C: int,
                             sup_loss: Callable, train_jsd: bool,
                             train_adv: bool, augment: bool,
                             eps_fgsm: float = 0.03,
                             state_template=None) -> Callable:
    n_model = mesh.shape["model"]
    assert K == n_model, "shard_map path currently requires one model per group"

    def _is_model_leaf(x) -> bool:
        return hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == K

    if state_template is None:
        # default template shape: params/batch_stats model-stacked, optax
        # scalar counts replicated — computed lazily on first call instead
        raise ValueError("pass state_template= (the stacked state) so per-leaf "
                         "shardings can be derived (optax step counts are "
                         "scalars and must replicate)")
    state_specs = jax.tree_util.tree_map(
        lambda x: P("model") if _is_model_leaf(x) else P(), state_template)
    is_model_leaf_tree = jax.tree_util.tree_map(_is_model_leaf, state_template)

    def local_step(carry, xs, img_u8, gt_u8, lr, lam_cot, lam_adv):
        """Runs per (model, data) shard. carry holds ONE model's state
        (no leading K axis)."""
        idx_lab_l, idx_unlab_l, pair, k = xs
        my = jax.lax.axis_index("model")

        img, gt = normalize_gather(img_u8, gt_u8, idx_lab_l)
        if augment:
            img, gt = augment_batch(img, gt, jax.random.fold_in(k, my))
        unlab_img, _ = normalize_gather(img_u8, gt_u8, idx_unlab_l)
        if augment:
            unlab_img, _ = augment_batch(
                unlab_img, jnp.zeros(unlab_img.shape[:3], jnp.int32),
                jax.random.fold_in(k, 101))

        def total_loss(params):
            bs = carry["batch_stats"]
            logits, bs = seg.apply_train(params, bs, img)
            supervised = sup_loss(logits, gt)          # this model's term

            jsd_loss = jnp.zeros((), logits.dtype)
            if train_jsd:
                u_logits, bs = seg.apply_train(params, bs, unlab_img)
                my_probs = jax.nn.softmax(u_logits, axis=-1)
                all_probs = jax.lax.all_gather(my_probs, "model")  # (K,B,H,W,C)
                jsd_loss = jnp.mean(jsd_2d(all_probs))
                jsd_loss = jax.lax.pmean(jsd_loss, "data")

            adv_loss = jnp.zeros((), logits.dtype)
            if train_adv:
                a, b = pair[0], pair[1]
                # every shard attacks with ITS model (parallel, equal work)
                img_cat = jnp.concatenate([img, unlab_img], axis=0)

                def gen_ce(x):
                    lg, gbs = seg.apply_train(jax.lax.stop_gradient(params),
                                              jax.lax.stop_gradient(bs), x)
                    pseudo = jnp.argmax(lg[gt.shape[0]:], axis=-1)
                    gt_full = jnp.concatenate(
                        [gt, jax.lax.stop_gradient(pseudo)], axis=0)
                    return sup_loss(lg, gt_full), (lg, gbs)

                g, (gen_logits, gen_bs) = jax.grad(gen_ce, has_aux=True)(img_cat)
                # the attacked model's BN stats advance through the
                # generation forward (reference train-mode attack semantics)
                bs = jax.tree_util.tree_map(
                    lambda old, new: jnp.where(my == b, new, old), bs, gen_bs)
                my_adv = jax.lax.stop_gradient(img_cat + eps_fgsm * jnp.sign(g))
                my_real = jax.lax.stop_gradient(
                    jax.nn.softmax(gen_logits, axis=-1))
                adv_all = jax.lax.all_gather(my_adv, "model")    # (K,B2,H,W,1)
                real_all = jax.lax.all_gather(my_real, "model")  # (K,B2,H,W,C)
                adv_img = jnp.take(adv_all, b, axis=0)
                real_probs = jnp.take(real_all, b, axis=0)
                # only model a's owner pays/backprops the KL term
                adv_logits, bs2 = seg.apply_train(params, bs, adv_img)
                kl = jnp.mean(kl_div_2d(jax.nn.softmax(adv_logits, -1),
                                        real_probs))
                is_a = (my == a).astype(kl.dtype)
                adv_loss = jax.lax.pmean(kl * is_a, "data")
                bs = jax.tree_util.tree_map(
                    lambda old, new: jnp.where(my == a, new, old), bs, bs2)

            total = supervised + lam_cot * jsd_loss + lam_adv * adv_loss
            return total, {"sup": supervised, "jsd": jsd_loss, "adv": adv_loss,
                           "batch_stats": bs, "lab_logits": logits}

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
        metrics = {"sup_loss": jax.lax.pmean(aux["sup"], "data"),
                   "jsd_loss": aux["jsd"], "adv_loss": aux["adv"],
                   "lab_dice": _dice_rows(aux["lab_logits"], gt, C)}
        return new_carry, metrics

    def shard_body(state_l, img_u8, gt_u8, idx_lab_l, idx_unlab_l, pairs, keys,
                   lr, lam_cot, lam_adv):
        idx_lab_l = idx_lab_l[:, 0]      # (T, 1, B_local) → (T, B_local)

        def scan_step(c, xs):
            return local_step(c, xs, img_u8, gt_u8, lr, lam_cot, lam_adv)
        return jax.lax.scan(scan_step, state_l,
                            (idx_lab_l, idx_unlab_l, pairs, keys))

    # state: model-stacked leaves carry a leading K axis sharded over 'model'
    # (each shard sees a size-1 leading dim → squeeze/restore around the
    # body); scalar leaves (optax step counts) replicate.
    def shard_body_sq(state_l, *args):
        state_sq = jax.tree_util.tree_map(
            lambda m, x: x[0] if m else x, is_model_leaf_tree, state_l)
        new_state, metrics = shard_body(state_sq, *args)
        new_state = jax.tree_util.tree_map(
            lambda m, x: x[None] if m else x, is_model_leaf_tree, new_state)
        return (new_state,
                jax.tree_util.tree_map(lambda x: x[None], metrics))

    sharded = jax.shard_map(
        shard_body_sq, mesh=mesh,
        in_specs=(state_specs, P(), P(),
                  P(None, "model", "data"),   # idx_lab (T,K,B)
                  P(None, "data"),            # idx_unlab (T,Bu)
                  P(), P(), P(), P(), P()),
        out_specs=(state_specs, P("model")),
        check_vma=False)

    @partial(jax.jit, donate_argnums=(0,))
    def epoch(stacked_state, img_u8, gt_u8, idx_lab, idx_unlab, pairs, key,
              lr, lam_cot, lam_adv):
        keys = jax.random.split(key, idx_lab.shape[0])
        return sharded(stacked_state, img_u8, gt_u8, idx_lab, idx_unlab,
                       pairs, keys, lr, lam_cot, lam_adv)

    return epoch
