"""Batched affine warps — the on-device augmentation primitive.

The reference augments per-sample on the host with PIL (flip / mirror /
rotate±45° / crop 0.85-0.95 + resize, ref:generalframework/dataset/augment.py:246-266),
which is host-bound and relies on process-global RNG. Here the whole family is
expressed as ONE affine warp per image (flips = sign flips, rotation = rotation
matrix, crop+resize = zoom+translation), executed on device as a single fused
gather, driven by explicit per-sample PRNG-derived parameters
(see dct_tpu.data.augment).

Coordinates: ``theta`` is a (2,3) matrix mapping *centered output* pixel
coords (y, x) to *centered input* coords: ``src = theta[:, :2] @ dst + theta[:, 2]``.
Out-of-bounds samples take ``fill`` (PIL rotate fills 0).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def make_affine(angle_deg=0.0, zoom_y=1.0, zoom_x=1.0, shift_y=0.0,
                shift_x=0.0, flip_ud=False, flip_lr=False) -> jnp.ndarray:
    """Compose flip/rotate/zoom/shift into a (2,3) output→input matrix.

    All arguments may be traced scalars; ``flip_*`` may be bool scalars
    (cast to ±1 signs). ``zoom > 1`` zooms *in* (crop effect). ``shift`` is in
    input pixels, applied after the linear part.
    """
    angle = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    sy = jnp.where(jnp.asarray(flip_ud), -1.0, 1.0) / jnp.asarray(zoom_y, jnp.float32)
    sx = jnp.where(jnp.asarray(flip_lr), -1.0, 1.0) / jnp.asarray(zoom_x, jnp.float32)
    # rotation in (y, x) convention, then per-axis scale/flip
    lin = jnp.array([[1.0, 0.0], [0.0, 1.0]], jnp.float32)
    rot = jnp.stack([jnp.stack([cos, -sin]), jnp.stack([sin, cos])])
    scale = jnp.stack([jnp.stack([sy, 0.0 * sy]), jnp.stack([0.0 * sx, sx])])
    lin = rot @ scale
    t = jnp.stack([jnp.asarray(shift_y, jnp.float32), jnp.asarray(shift_x, jnp.float32)])
    return jnp.concatenate([lin, t[:, None]], axis=1)


def _grid(h: int, w: int):
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - (h - 1) / 2.0
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - (w - 1) / 2.0
    return yy, xx


def affine_warp(img: jnp.ndarray, theta: jnp.ndarray, method: str = "bilinear",
                fill: float = 0.0) -> jnp.ndarray:
    """Warp one image (H,W) or (H,W,C) by ``theta``; single-gather sampling."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    yy, xx = _grid(h, w)
    sy = theta[0, 0] * yy + theta[0, 1] * xx + theta[0, 2] + (h - 1) / 2.0
    sx = theta[1, 0] * yy + theta[1, 1] * xx + theta[1, 2] + (w - 1) / 2.0

    flat = img.reshape(h * w, c)

    def gather(iy, ix):
        valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
        iyc = jnp.clip(iy, 0, h - 1)
        ixc = jnp.clip(ix, 0, w - 1)
        vals = jnp.take(flat, iyc * w + ixc, axis=0)
        return jnp.where(valid.reshape(h, w, 1), vals.reshape(h, w, c), fill)

    if method == "nearest":
        out = gather(jnp.round(sy).astype(jnp.int32), jnp.round(sx).astype(jnp.int32))
    elif method == "bilinear":
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        wy = (sy - y0)[..., None]
        wx = (sx - x0)[..., None]
        y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)
        v00 = gather(y0i, x0i)
        v01 = gather(y0i, x0i + 1)
        v10 = gather(y0i + 1, x0i)
        v11 = gather(y0i + 1, x0i + 1)
        out = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
               + v10 * wy * (1 - wx) + v11 * wy * wx)
    else:
        raise ValueError(f"unknown method {method!r}")
    return out[..., 0] if squeeze else out


# batched over (image, theta)
affine_warp_batch = jax.vmap(affine_warp, in_axes=(0, 0, None, None))
