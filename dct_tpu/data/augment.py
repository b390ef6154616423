"""On-device batched augmentation, PRNG-key driven.

TPU rebuild of the reference's host-side PILaugment
(ref:generalframework/dataset/augment.py:246-266): per sample, independently
with p=0.5 each — vertical flip, horizontal mirror, rotation U(-45°,45°),
and crop of scale U(0.85,0.95) at a uniform position (resized back).

All four compose into ONE affine matrix per sample (flips = sign flips,
crop+resize = zoom+shift), executed as a single fused gather per image
(dct_tpu.ops.warp). Images sample bilinearly, labels nearest. Mean-teacher's
"replay the same augmentation" trick (ref:augment.py:16-29 temporary_seed)
becomes: reuse the same PRNG key / thetas.

Divergence note: the reference rotates with NEAREST and then crop-resizes with
BILINEAR as two separate resamplings; composing them into one warp changes
interpolation details (not statistics). Documented intentional.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.warp import affine_warp


def sample_aug_thetas(key: jax.Array, n: int, height: int, width: int) -> jnp.ndarray:
    """Per-sample (n,2,3) affine matrices following PILaugment's distribution."""
    k_fud, k_flr, k_dorot, k_ang, k_docrop, k_crop, k_oy, k_ox = jax.random.split(key, 8)
    flip_ud = jax.random.bernoulli(k_fud, 0.5, (n,))
    flip_lr = jax.random.bernoulli(k_flr, 0.5, (n,))
    do_rot = jax.random.bernoulli(k_dorot, 0.5, (n,))
    angle = jnp.where(do_rot, jax.random.uniform(k_ang, (n,), minval=-45.0, maxval=45.0), 0.0)
    do_crop = jax.random.bernoulli(k_docrop, 0.5, (n,))
    crop = jnp.where(do_crop, jax.random.uniform(k_crop, (n,), minval=0.85, maxval=0.95), 1.0)
    # crop offset: x_pos ~ U(0, W - cropW) → centered offset (ref:augment.py:255-264)
    off_y = jnp.where(do_crop,
                      (jax.random.uniform(k_oy, (n,)) - 0.5) * (1.0 - crop) * height, 0.0)
    off_x = jnp.where(do_crop,
                      (jax.random.uniform(k_ox, (n,)) - 0.5) * (1.0 - crop) * width, 0.0)

    def build(fud, flr, ang, cr, oy, ox):
        rad = jnp.deg2rad(ang)
        c, s = jnp.cos(rad), jnp.sin(rad)
        rot = jnp.array([[1.0, 0.0], [0.0, 1.0]]) * 0.0
        rot = jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])
        flips = jnp.stack([
            jnp.stack([jnp.where(fud, -1.0, 1.0), jnp.zeros(())]),
            jnp.stack([jnp.zeros(()), jnp.where(flr, -1.0, 1.0)]),
        ])
        # composition: output→input = Flip ∘ Rotate ∘ CropZoom
        lin = flips @ rot * cr
        t = flips @ rot @ jnp.stack([oy, ox])
        return jnp.concatenate([lin, t[:, None]], axis=1)

    return jax.vmap(build)(flip_ud, flip_lr, angle, crop, off_y, off_x)


def augment_batch(img: jnp.ndarray, gt: jnp.ndarray, key: jax.Array,
                  fast: bool = True, impl: str = "gather"
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Jointly augment (B,H,W,C) float images and (B,H,W) int labels.

    ``fast=True`` (default) warps img and gt together nearest-neighbor in one
    pass — profiling showed the 5-gather bilinear path was ~40% of the whole
    co-train step. The reference itself resamples rotations with NEAREST
    (ref:augment.py:253); only its crop-resize was bilinear, so this changes
    interpolation detail, not augmentation statistics. ``impl`` picks the
    fast-path kernel: "gather" (default) = the exact per-pixel nearest
    gather; "shear" = the LDU shear decomposition (ops/warp.py). Measured on
    v5e at 12×256²: gather 8.9 ms, shear 13.7 ms, bilinear 43.7 ms — the
    gather wins despite its lane inefficiency because the shear's extra
    passes (2H×1.5W intermediates, transposes, one-hot matmuls) cost more
    than they save; see BASELINE.md. Set ``fast=False`` for the
    bilinear-image path.
    """
    squeeze_c = img.ndim == 4
    im = img[..., 0] if squeeze_c else img
    b, h, w = im.shape
    thetas = sample_aug_thetas(key, b, h, w)
    return augment_batch_with_thetas(img, gt, thetas, fast=fast, impl=impl)


def augment_u8_with_thetas(img_u8: jnp.ndarray, gt_u8: jnp.ndarray,
                           thetas: jnp.ndarray, dtype=jnp.float32
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-warp a gathered uint8 batch (img (B,H,W) u8, gt (B,H,W) u8)
    jointly, THEN normalize — the warp gather moves 2 bytes/pixel instead of
    the 8-byte f32 img+gt stack ``augment_batch_with_thetas`` builds.

    Bit-identical to ``normalize_gather`` → ``augment_batch_with_thetas
    (fast=True)``: a nearest warp is a per-pixel permutation-with-fill, so it
    commutes exactly with the per-pixel /255 normalize, and u8 values
    round-trip f32 casts exactly (pinned by
    tests/test_data.py::test_augment_u8_matches_f32_path).
    Returns ((B,H,W,1) ``dtype`` image in [0,1], (B,H,W) int32 labels).
    """
    stacked = jnp.stack([img_u8, gt_u8], axis=-1)            # (B,H,W,2) u8
    out = jax.vmap(affine_warp, in_axes=(0, 0, None, None))(
        stacked, thetas, "nearest", 0)
    img = (out[..., 0].astype(dtype) / 255.0)[..., None]
    return img, out[..., 1].astype(jnp.int32)


def warp_gathered_u8(img_u8: jnp.ndarray, gt_u8: jnp.ndarray,
                     thetas: jnp.ndarray, dtype=jnp.float32
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Default augmentation inner path for a gathered uint8 (B,H,W) img+gt
    pair: normalize to float FIRST, then nearest-warp the stacked pair
    (``augment_batch_with_thetas``). Bit-identical outputs to
    ``augment_u8_with_thetas`` (the warp-on-u8 variant); that variant moves
    2 B/px through the warp gather instead of 8, but measured ~2% SLOWER in
    the real co-train epoch (interleaved same-process A/B, bench_aug_ab.py,
    2026-08-18 v5e: f32 2.011 s/30-iter = 179.0 img/s vs u8 2.058 = 174.9
    across 4 reps each), so normalize-first stays the default. Monkeypatch
    this symbol to re-run the A/B."""
    img = img_u8.astype(dtype)[..., None] / 255.0
    gt = gt_u8.astype(jnp.int32)
    return augment_batch_with_thetas(img, gt, thetas)


def augment_batch_with_thetas(img: jnp.ndarray, gt: jnp.ndarray,
                              thetas: jnp.ndarray, fast: bool = True,
                              impl: str = "gather"
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``augment_batch`` with the per-sample (B,2,3) thetas supplied by the
    caller. Lets the co-training step warp all K labeled streams + the
    unlabeled stream in ONE call while keeping each stream's PRNG draw
    identical to separate ``augment_batch`` calls (each stream's thetas are
    still sampled from its own key)."""
    squeeze_c = img.ndim == 4
    im = img[..., 0] if squeeze_c else img
    b, h, w = im.shape
    if fast:
        stacked = jnp.stack([im, gt.astype(im.dtype)], axis=-1)   # (B,H,W,2)
        if impl == "shear":
            from ..ops.warp import affine_warp_shear_batch
            out = affine_warp_shear_batch(stacked, thetas)
        else:
            out = jax.vmap(affine_warp, in_axes=(0, 0, None, None))(
                stacked, thetas, "nearest", 0.0)
        im_a = out[..., 0]
        gt_a = out[..., 1].astype(gt.dtype)
    else:
        im_a = jax.vmap(affine_warp, in_axes=(0, 0, None, None))(
            im, thetas, "bilinear", 0.0)
        gt_a = jax.vmap(affine_warp, in_axes=(0, 0, None, None))(
            gt.astype(jnp.float32), thetas, "nearest", 0.0).astype(gt.dtype)
    if squeeze_c:
        im_a = im_a[..., None]
    return im_a, gt_a


def apply_thetas(x: jnp.ndarray, thetas: jnp.ndarray, method: str = "bilinear"
                 ) -> jnp.ndarray:
    """Warp (B,H,W,C) or (B,H,W) by given per-sample thetas — used to replay a
    student augmentation on teacher predictions (mean-teacher,
    ref:mean_teacher_trainer.py:168-173)."""
    if x.ndim == 4:
        return jax.vmap(affine_warp, in_axes=(0, 0, None, None))(x, thetas, method, 0.0)
    return jax.vmap(affine_warp, in_axes=(0, 0, None, None))(x, thetas, method, 0.0)
