"""Adversarial example generators: FGSM and VAT, as pure jax transforms.

Rebuild of ref:generalframework/utils/AEGenerator.py. The torch version
mutates ``img.requires_grad`` / ``net.zero_grad()``; here both are one-liners
over ``jax.grad`` w.r.t. the *input*. Outputs are stop-gradiented: neither
generator leaks parameter gradients (the reference zero_grads after its
backward, ref:AEGenerator.py:29).

VAT note: the reference's VATGenerator is broken as written (undefined
``self.axises``, 3-arg call to a 2-arg kl, ref:AEGenerator.py:107); this
implementation follows the cited paper (arXiv 1704.03976: power iteration on
an L2-normalized perturbation) — the *intended* semantics.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from .losses import kl_div_2d_logits


def fgsm(apply_fn: Callable, params, batch_stats, img: jnp.ndarray,
         gt: jnp.ndarray, loss_fn: Callable, epsilon: float = 0.05
         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """FGSM attack (ref:AEGenerator.py:9-51).

    ``apply_fn(params, batch_stats, x) -> (logits, new_batch_stats)`` runs in
    train mode (BN batch stats), matching the reference's in-training attack.
    When ``img`` has more rows than ``gt``, the extra rows are labeled with
    the model's own argmax pseudo-labels (ref:AEGenerator.py:24-25).

    Returns (adv_img, noise, softmax_probs, new_batch_stats) — all detached.
    """
    params = jax.lax.stop_gradient(params)
    batch_stats = jax.lax.stop_gradient(batch_stats)

    def ce_of_input(x):
        logits, new_bs = apply_fn(params, batch_stats, x)
        if gt.shape[0] < x.shape[0]:
            pseudo = jnp.argmax(logits[gt.shape[0]:], axis=-1)
            gt_full = jnp.concatenate([gt, jax.lax.stop_gradient(pseudo)], axis=0)
        else:
            gt_full = gt
        return loss_fn(logits, gt_full), (logits, new_bs)

    g, (logits, new_bs) = jax.grad(ce_of_input, has_aux=True)(img)
    noise = epsilon * jnp.sign(g)
    adv_img = jax.lax.stop_gradient(img + noise)
    probs = jax.lax.stop_gradient(jax.nn.softmax(logits, axis=-1))
    return adv_img, jax.lax.stop_gradient(noise), probs, new_bs


def _l2_normalize(d: jnp.ndarray) -> jnp.ndarray:
    """Per-sample L2 normalization (ref:AEGenerator.py:68-76)."""
    norms = jnp.sqrt(jnp.sum(d.reshape(d.shape[0], -1) ** 2, axis=1) + 1e-16)
    return d / norms.reshape((-1,) + (1,) * (d.ndim - 1))


def vat_perturbation(apply_fn: Callable, params, batch_stats, img: jnp.ndarray,
                     key: jax.Array, xi: float = 1e-6, epsilon: float = 10.0,
                     ip: int = 1, clamp: bool = True
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Virtual adversarial perturbation by power iteration
    (ref:AEGenerator.py:54-119; semantics per arXiv 1704.03976).

    Returns (adv_img, r_adv, new_batch_stats), adversarial image detached and
    clamped to [0,1] like the reference (ref:AEGenerator.py:117).
    """
    params = jax.lax.stop_gradient(params)
    batch_stats = jax.lax.stop_gradient(batch_stats)
    clean_logits, new_bs = apply_fn(params, batch_stats, img)
    clean_logits = jax.lax.stop_gradient(clean_logits)

    d = _l2_normalize(jax.random.normal(key, img.shape, img.dtype))

    def kl_of_d(dd):
        y_hat, _ = apply_fn(params, batch_stats, img + dd)
        # KL(clean ‖ perturbed), pixel map → mean (ref:AEGenerator.py:107-108)
        return jnp.mean(kl_div_2d_logits(y_hat, clean_logits))

    for _ in range(ip):
        d = jax.grad(kl_of_d)(xi * _l2_normalize(d))

    r_adv = epsilon * _l2_normalize(d)
    adv_img = img + jax.lax.stop_gradient(r_adv)
    if clamp:
        adv_img = jnp.clip(adv_img, 0.0, 1.0)
    return jax.lax.stop_gradient(adv_img), jax.lax.stop_gradient(r_adv), new_bs


class FSGMGenerator:
    """OO shim matching the reference surface (ref:AEGenerator.py:9)."""

    def __init__(self, apply_fn: Callable, eplision: float = 0.05) -> None:
        self.apply_fn = apply_fn
        self.eplision = eplision

    def __call__(self, params, batch_stats, img, gt, criterion):
        return fgsm(self.apply_fn, params, batch_stats, img, gt, criterion,
                    self.eplision)


class VATGenerator:
    """OO shim matching the reference surface (ref:AEGenerator.py:54)."""

    def __init__(self, apply_fn: Callable, xi: float = 1e-6,
                 eplision: float = 10.0, ip: int = 1) -> None:
        self.apply_fn = apply_fn
        self.xi = xi
        self.eps = eplision
        self.ip = ip

    def __call__(self, params, batch_stats, img, key):
        return vat_perturbation(self.apply_fn, params, batch_stats, img, key,
                                self.xi, self.eps, self.ip)
