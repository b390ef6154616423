"""Segmentation losses, class-last (B,H,W,C), pure-jnp and jit-safe.

Rebuild of ref:generalframework/loss/loss.py + loss/dice.py + loss/__init__.py.
All functions are differentiable pure functions (no nn.Module state); the
probability-space ones take *probs*, the ``*_logits`` ones take raw logits —
matching the reference's split between ``KL_Divergence_2D`` (probs) and
``KL_Divergence_2D_Logit`` (logits).

The reference's ubiquitous ``simplex()`` asserts become debug-gated host
checks (see dct_tpu.utils.general.set_debug) — inside jit they are free.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

EPS_KL = 1e-10    # ref:loss/loss.py:112 (KL eps)
EPS_ENT = 1e-16   # ref:loss/loss.py:64 (entropy eps)


# ---------------------------------------------------------------------------
# cross entropy (ref:loss/loss.py:12-36)
# ---------------------------------------------------------------------------

def cross_entropy2d(logits: jnp.ndarray, target: jnp.ndarray,
                    weight: Optional[Sequence[float]] = None,
                    ignore_index: int = 255) -> jnp.ndarray:
    """Weighted 2D cross-entropy, torch-NLLLoss semantics.

    logits: (..., H, W, C) raw scores; target: (..., H, W) int classes.
    Mean is the *weighted* mean sum(w[y]*nll)/sum(w[y]) over non-ignored pixels
    (torch.nn.NLLLoss(weight, size_average=True), ref:loss/loss.py:22-25).
    """
    C = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = (target != ignore_index)
    safe_target = jnp.where(valid, target, 0)
    # One-hot select instead of take_along_axis: the gather (and its
    # backward scatter) measured 34.5 ms/iter at 512^2 in the r5 profiler
    # trace (BASELINE.md "where the 323 ms goes"); the class-axis compare +
    # masked sum is pure elementwise, fuses into the surrounding ops, and is
    # value-exact (it selects the same single element; adding zeros is exact).
    onehot = safe_target[..., None] == jnp.arange(C, dtype=safe_target.dtype)
    nll = -jnp.sum(jnp.where(onehot, logp, 0), axis=-1)
    if weight is not None:
        w = jnp.asarray(weight, dtype=logits.dtype)
        pix_w = jnp.sum(jnp.where(onehot, w, 0), axis=-1) * valid
    else:
        pix_w = valid.astype(logits.dtype)
    return jnp.sum(nll * pix_w) / jnp.maximum(jnp.sum(pix_w), 1e-12)


def partial_cross_entropy2d(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """CE with class-0 masked out (ref:loss/loss.py:28-36, weight=[0,1])."""
    C = logits.shape[-1]
    w = [0.0] + [1.0] * (C - 1)
    return cross_entropy2d(logits, target, weight=w, ignore_index=-100)


# ---------------------------------------------------------------------------
# entropy / KL / JSD (ref:loss/loss.py:53-196)
# ---------------------------------------------------------------------------

def entropy_2d(probs: jnp.ndarray) -> jnp.ndarray:
    """Pixelwise entropy map: (..., C) probs → (...) (ref:loss/loss.py:70-84)."""
    return -jnp.sum(probs * jnp.log(probs + EPS_ENT), axis=-1)


def kl_div_2d(p_prob: jnp.ndarray, y_prob: jnp.ndarray,
              reduce: bool = False) -> jnp.ndarray:
    """KL(y ‖ p) pixelwise map in prob space (ref:loss/loss.py:110-134).

    Note the reference's argument order: ``p_prob`` is the distribution being
    pulled toward the target ``y_prob``; gradient flows through both unless
    the caller stop-gradients ``y_prob``.
    """
    logp = jnp.log(p_prob + EPS_KL)
    logy = jnp.log(y_prob + EPS_KL)
    ylogy = jnp.sum(y_prob * logy, axis=-1)
    ylogp = jnp.sum(y_prob * logp, axis=-1)
    out = ylogy - ylogp
    return jnp.mean(out) if reduce else out


def kl_div_2d_logits(p_logit: jnp.ndarray, y_logit: jnp.ndarray,
                     reduce: bool = False) -> jnp.ndarray:
    """KL(softmax(y) ‖ softmax(p)) from logits (ref:loss/loss.py:137-162).
    Numerically preferable to kl_div_2d; use inside jitted steps."""
    logp = jax.nn.log_softmax(p_logit, axis=-1)
    logy = jax.nn.log_softmax(y_logit, axis=-1)
    y_prob = jnp.exp(logy)
    out = jnp.sum(y_prob * (logy - logp), axis=-1)
    return jnp.mean(out) if reduce else out


def jsd_2d(probs: jnp.ndarray) -> jnp.ndarray:
    """Jensen-Shannon divergence map over K distributions.

    probs: (K, ..., C) stacked simplexes → (...) map:
    H(mean_k p_k) − mean_k H(p_k)   (ref:loss/loss.py:183-196).
    Accepts a list/tuple of (...,C) arrays too.
    """
    if isinstance(probs, (list, tuple)):
        probs = jnp.stack(probs, axis=0)
    mean_prob = jnp.mean(probs, axis=0)
    f_term = entropy_2d(mean_prob)
    mean_entropy = jnp.mean(entropy_2d(probs), axis=0)
    return f_term - mean_entropy


def mse_2d(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MSE on the class-1 probability (binary helper, ref:loss/loss.py:39-50)."""
    prob = jax.nn.softmax(logits, axis=-1)[..., 1]
    return jnp.mean((prob - target.astype(prob.dtype)) ** 2)


def mse_probs(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Plain MSE between two prob tensors (mean-teacher consistency,
    ref:mean_teacher_trainer.py:177)."""
    return jnp.mean((p - q) ** 2)


# ---------------------------------------------------------------------------
# soft dice loss (ref:loss/dice.py:9-106)
# ---------------------------------------------------------------------------

def dice_coefficient(logits: jnp.ndarray, target_onehot: jnp.ndarray,
                     smooth: float = 1.0) -> jnp.ndarray:
    """Soft multiclass dice (B,H,W,C)→(B,C) (ref:loss/dice.py:9-46)."""
    probs = jax.nn.softmax(logits, axis=-1)
    tgt = target_onehot.astype(probs.dtype)
    num = jnp.sum(probs * tgt, axis=(1, 2))
    den1 = jnp.sum(probs * probs, axis=(1, 2))
    den2 = jnp.sum(tgt * tgt, axis=(1, 2))
    return (2.0 * num + smooth) / (den1 + den2 + smooth)


def dice_loss(logits: jnp.ndarray, target_onehot: jnp.ndarray,
              optimize_bg: bool = False, weight: Optional[Sequence[float]] = None,
              smooth: float = 1.0, size_average: bool = True,
              reduce: bool = True) -> jnp.ndarray:
    """1 − mean foreground soft dice (ref:loss/dice.py:49-80)."""
    dice = dice_coefficient(logits, target_onehot, smooth)
    if not optimize_bg:
        dice = dice[:, 1:]
    if weight is not None:
        w = jnp.asarray(weight, dtype=dice.dtype)
        if not optimize_bg:
            w = w[1:]
        w = w.shape[0] * w / jnp.sum(w)
        dice = dice * w
    loss = 1.0 - jnp.mean(dice, axis=1)
    if not reduce:
        return loss
    return jnp.mean(loss) if size_average else jnp.sum(loss)


# ---------------------------------------------------------------------------
# class weighting (ref:loss/__init__.py:19-55)
# ---------------------------------------------------------------------------

def enet_weighing(labels, num_classes: int, c: float = 1.02):
    """w_class = 1/ln(c + p_class) over an iterable of int label arrays."""
    import numpy as np

    class_count = np.zeros(num_classes, dtype=np.int64)
    total = 0
    for label in labels:
        flat = np.asarray(label).flatten()
        flat = flat[(flat >= 0) & (flat < num_classes)]
        class_count += np.bincount(flat, minlength=num_classes)
        total += flat.size
    propensity = class_count / max(total, 1)
    return 1.0 / np.log(c + propensity)


# ---------------------------------------------------------------------------
# registry (ref:loss/__init__.py:6-16)
# ---------------------------------------------------------------------------

def get_loss_fn(name: str, **kwargs):
    """String → loss callable taking (logits, target)."""
    if name == "cross_entropy":
        return partial(cross_entropy2d, **kwargs)
    if name == "partial_ce":
        return partial_cross_entropy2d
    if name == "mse_2d":
        return mse_2d
    if name == "jsd":
        return jsd_2d
    if name == "dice_loss":
        return partial(dice_loss, **kwargs)
    raise ValueError(f"unknown loss {name!r}")
