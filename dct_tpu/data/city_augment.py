"""Cityscapes augmentation zoo — the reference's ``key2aug`` registry,
TPU-native (ref:generalframework/dataset/augment.py:42-243).

The reference composes PIL ops (RandomCrop / CenterCrop / Scale /
RandomSized / RandomSizedCrop / RandomRotate) per sample on host workers,
driven by a config dict ``Dataset.augmentations: {rotate: 10, rcrop: [h,w]}``
(ref:config/cityscapes_config.yml:18-20) through ``key2aug`` /
``get_composed_augmentations`` (ref:augment.py:223-243).

TPU design: every op is a *per-sample affine theta sampler*; the whole
composed chain collapses into ONE (2,3) matrix per sample and ONE fused
batched warp (dct_tpu.ops.warp.affine_warp_shear_batch). Static shapes are
non-negotiable under jit, so crops keep the canvas size and express the
crop as zoom+shift (the cropped window fills the canvas — same content
statistics, fixed resolution; divergence documented in PARITY.md). Labels
warped out of bounds take ``ignore_index`` via a warped validity channel
(the reference rotates masks with fillcolor=255, ref:augment.py:133).

theta convention matches ops/warp.py: ``src = theta[:, :2] @ dst_c + theta[:, 2]``
(centered coords). Composition: applying aug1 then aug2 gives
``A = A1 @ A2, t = A1 @ t2 + t1``.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.warp import affine_warp_shear_batch


def _identity(n: int) -> jnp.ndarray:
    return jnp.tile(jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]), (n, 1, 1))


def _diag_theta(zy, zx, ty, tx) -> jnp.ndarray:
    """(n,) scales/shifts → (n,2,3) thetas."""
    z = jnp.zeros_like(zy)
    return jnp.stack([jnp.stack([zy, z, ty], -1),
                      jnp.stack([z, zx, tx], -1)], -2)


def compose_thetas(first: jnp.ndarray, second: jnp.ndarray) -> jnp.ndarray:
    """Theta of (apply ``first``, then ``second``): A1@A2 | A1 t2 + t1."""
    a = first[:, :, :2] @ second[:, :, :2]
    t = (first[:, :, :2] @ second[:, :, 2:])[:, :, 0] + first[:, :, 2]
    return jnp.concatenate([a, t[:, :, None]], axis=2)


def _pair(size) -> Tuple[int, int]:
    if isinstance(size, (int, float)):
        return int(size), int(size)
    return int(size[0]), int(size[1])


# --- samplers: (key, n, h, w) -> (n,2,3) thetas ---------------------------

def random_crop(size):
    """ref:augment.py:63-92 — crop (th,tw) at a uniform position; here the
    window fills the canvas (zoom h/th) instead of shrinking the output."""
    th, tw = _pair(size)

    def sample(key, n, h, w):
        ky, kx = jax.random.split(key)
        zy, zx = min(th, h) / h, min(tw, w) / w
        oy = (jax.random.uniform(ky, (n,)) - 0.5) * (h - min(th, h))
        ox = (jax.random.uniform(kx, (n,)) - 0.5) * (w - min(tw, w))
        return _diag_theta(jnp.full((n,), zy), jnp.full((n,), zx), oy, ox)

    return sample


def center_crop(size):
    """ref:augment.py:95-110 — deterministic centered window."""
    th, tw = _pair(size)

    def sample(key, n, h, w):
        zy, zx = min(th, h) / h, min(tw, w) / w
        zero = jnp.zeros((n,))
        return _diag_theta(jnp.full((n,), zy), jnp.full((n,), zx), zero, zero)

    return sample


def scale(size):
    """ref:augment.py:137-166 — aspect-preserving resize to the target; the
    device pipeline already standardizes the canvas, so this is identity."""
    del size

    def sample(key, n, h, w):
        return _identity(n)

    return sample


def random_rotate(degree):
    """ref:augment.py:113-134 — U(-degree, degree) rotation."""
    degree = float(degree)

    def sample(key, n, h, w):
        ang = jnp.deg2rad(jax.random.uniform(key, (n,), minval=-degree,
                                             maxval=degree))
        c, s = jnp.cos(ang), jnp.sin(ang)
        zero = jnp.zeros((n,))
        return jnp.stack([jnp.stack([c, -s, zero], -1),
                          jnp.stack([s, c, zero], -1)], -2)

    return sample


def random_sized(size):
    """ref:augment.py:205-220 — resize by U(0.5,2), re-scale, random crop:
    net effect = random zoom 1/U(0.5,2) at a uniform valid position."""
    del size

    def sample(key, n, h, w):
        kz, ky, kx = jax.random.split(key, 3)
        # downscale draws (u<1) are undone by the Scale step in the
        # reference (resolution jitter only) → identity here; upscale draws
        # survive as a random crop of the enlarged image → zoom-in 1/u
        z = jnp.clip(1.0 / jax.random.uniform(kz, (n,), minval=0.5, maxval=2.0),
                     0.0, 1.0)
        oy = (jax.random.uniform(ky, (n,)) - 0.5) * (1.0 - z) * h
        ox = (jax.random.uniform(kx, (n,)) - 0.5) * (1.0 - z) * w
        return _diag_theta(z, z, oy, ox)

    return sample


def random_sized_crop(size):
    """ref:augment.py:168-202 — window of area U(0.45,1)·HW and aspect
    U(0.5,2) at a uniform position, resized to the canvas."""
    del size

    def sample(key, n, h, w):
        ka, kr, ks, ky, kx = jax.random.split(key, 5)
        area = jax.random.uniform(ka, (n,), minval=0.45, maxval=1.0)
        ar = jax.random.uniform(kr, (n,), minval=0.5, maxval=2.0)
        ar = jnp.where(jax.random.bernoulli(ks, 0.5, (n,)), ar, 1.0 / ar)
        zx = jnp.clip(jnp.sqrt(area * ar), 0.0, 1.0)
        zy = jnp.clip(jnp.sqrt(area / ar), 0.0, 1.0)
        oy = (jax.random.uniform(ky, (n,)) - 0.5) * (1.0 - zy) * h
        ox = (jax.random.uniform(kx, (n,)) - 0.5) * (1.0 - zx) * w
        return _diag_theta(zy, zx, oy, ox)

    return sample


# ref:augment.py:223-231 (incl. the reference's 'sale' typo-alias)
key2aug: Dict[str, Callable] = {
    "rcrop": random_crop,
    "scale": scale,
    "rsize": random_sized,
    "rsizecrop": random_sized_crop,
    "rotate": random_rotate,
    "ccrop": center_crop,
    "sale": scale,
}


def get_composed_augmentations(aug_dict: Optional[dict],
                               ignore_index: int = 250) -> Optional[Callable]:
    """Config dict → jit-able batched augmenter (ref:augment.py:234-243).

    Returns ``augment(img (B,H,W,C) float, gt (B,H,W) int, key)`` →
    (img_aug, gt_aug): all ops composed into one theta per sample, one fused
    warp; out-of-canvas label pixels become ``ignore_index``.
    """
    if aug_dict is None or not aug_dict:
        return None
    samplers = []
    for aug_key, aug_param in aug_dict.items():
        samplers.append(key2aug[aug_key](aug_param))
        print(f"Using {aug_key} aug with params {aug_param}")

    def augment(img: jnp.ndarray, gt: jnp.ndarray, key: jax.Array):
        b, h, w = img.shape[0], img.shape[1], img.shape[2]
        keys = jax.random.split(key, len(samplers))
        thetas = samplers[0](keys[0], b, h, w)
        for smp, k in zip(samplers[1:], keys[1:]):
            thetas = compose_thetas(thetas, smp(k, b, h, w))
        stacked = jnp.concatenate(
            [img, gt[..., None].astype(img.dtype),
             jnp.ones((b, h, w, 1), img.dtype)], axis=-1)
        out = affine_warp_shear_batch(stacked, thetas)
        img_a = out[..., :-2]
        valid = out[..., -1] > 0.5
        gt_a = jnp.where(valid, out[..., -2].astype(gt.dtype), ignore_index)
        return img_a, gt_a

    return augment
