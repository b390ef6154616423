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
        # cast fill to the image dtype so integer (e.g. uint8) warps stay
        # integer instead of being promoted to f32 by the where
        return jnp.where(valid.reshape(h, w, 1), vals.reshape(h, w, c),
                         jnp.asarray(fill, img.dtype))

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


# ---------------------------------------------------------------------------
# LDU shear-decomposed warp: the lane-efficient TPU path
# ---------------------------------------------------------------------------
# The single-gather warp above costs one per-pixel XLA gather with a tiny
# (C≤2) trailing dim — each gathered element uses 2 of 128 lanes, so it runs
# ~100x off memory speed-of-light (measured ~0.8 ms/image at 256²; see
# BASELINE.md). Decomposing the affine as M = L·D·U turns the warp into three
# lane-friendly passes, none of which scatter or per-pixel gather:
#
#   L (horizontal shear + translation): per-row contiguous (1,W,C) dynamic
#       slices from an x-padded image — a gather of whole rows;
#   D (per-axis scale, incl. flips/zoom): two one-hot batched matmuls (MXU);
#   U (vertical shear): the L pass on the transposed image.
#
# Each pass resamples with nearest rounding, so the composite can displace a
# pixel by ≤ ~1.5 px vs the exact nearest warp — immaterial for random
# augmentation (and self-consistent for the mean-teacher replay, which reuses
# the same thetas through the same code path). Valid for |m01/m00| ≤ 1 and
# |translation| ≤ H/4, which covers the PILaugment distribution
# (rotation ≤ 45°, crop ≥ 0.85 → |tan| ≤ 1, offsets ≤ 0.11·H).


def _ldu(theta: jnp.ndarray):
    """theta (2,3) → (l, d0, d1, u, t0, t1) with M = [[1,0],[l,1]] @
    diag(d0,d1) @ [[1,u],[0,1]].

    Debug-gated domain check: the shear decomposition is only exact for
    |m01/m00| ≤ 1, |m10/m00| ≤ 1 (see affine_warp_shear) — out-of-domain
    thetas (e.g. rotation > 45° composed with strong zoom) would silently
    corrupt the augmentation. Enable utils.general.set_debug(True) to fail
    loudly on concrete thetas outside the domain.
    """
    from ..utils.general import debug_enabled

    m00, m01, t0 = theta[0, 0], theta[0, 1], theta[0, 2]
    m10, m11, t1 = theta[1, 0], theta[1, 1], theta[1, 2]
    if debug_enabled() and not isinstance(theta, jax.core.Tracer):
        sh_u, sh_l = abs(float(m01 / m00)), abs(float(m10 / m00))
        assert sh_u <= 1.0 + 1e-6 and sh_l <= 1.0 + 1e-6, (
            f"shear warp domain violated: |m01/m00|={sh_u:.3f}, "
            f"|m10/m00|={sh_l:.3f} (both must be ≤ 1; use impl='gather')")
    u = m01 / m00
    l = m10 / m00
    d1 = m11 - m10 * m01 / m00
    return l, m00, d1, u, t0, t1


def _iota1(n: int) -> jnp.ndarray:
    return jax.lax.broadcasted_iota(jnp.float32, (n, 1), 0)[:, 0]


def _scale_matrix(n_out: int, n_in: int, scale: jnp.ndarray) -> jnp.ndarray:
    """(n_out, n_in) one-hot nearest-resample matrix between centered axes:
    out[v] = in[round(scale·(v - c_out) + c_in)] (zero row → fill 0).
    Negative scale = flip."""
    src = jnp.round(scale * (_iota1(n_out) - (n_out - 1) / 2.0)
                    + (n_in - 1) / 2.0).astype(jnp.int32)
    valid = (src >= 0) & (src < n_in)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 1)
    return ((cols == src[:, None]) & valid[:, None]).astype(jnp.float32)


def affine_warp_shear(img: jnp.ndarray, theta: jnp.ndarray,
                      fill: float = 0.0) -> jnp.ndarray:
    """Nearest-neighbor affine warp of one (H,W,C) image via L·D·U shears.

    Same coordinate convention as :func:`affine_warp` (theta maps centered
    output coords to centered input coords), restricted to fill=0,
    |m01/m00| ≤ 1, |m10/m00| ≤ 1 and |translation| ≤ H/2 — which covers the
    PILaugment distribution (|rotation| ≤ 45°, crop ≥ 0.85) and the
    Cityscapes key2aug ops at their config defaults.

    Stages (each nearest-rounded, so the composite may displace a pixel by
    ≤ ~1.5 px vs the exact warp — immaterial for random augmentation):
      L  (h,w) → (2h, 3w/2): per-row contiguous dynamic slices (shear+shift);
      D  → (2h, w): two one-hot matmuls (axis scales incl. flips) on the MXU;
      U  (2h, w) → (h, w): per-column slices on the transpose (shear).
    """
    assert fill == 0.0, "shear warp supports fill=0 only (one-hot zero rows)"
    # channels become batch entries: every pass then keeps W (not C) on the
    # TPU lane axis — a trailing C of 1-2 would waste 126/128 lanes in the
    # slices and transposes
    out = jax.vmap(_warp2d_shear, in_axes=(2, None), out_axes=2)(img, theta)
    return out


def _warp2d_shear(img: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """(H,W) single-channel LDU shear warp (see affine_warp_shear)."""
    h, w = img.shape
    l, d0, d1, u, t0, t1 = _ldu(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    h1, w1 = 2 * h, (3 * w) // 2
    c1y, c1x = (h1 - 1) / 2.0, (w1 - 1) / 2.0

    # ---- L: out[v, x] = img[v_c + t0 + cy, x_c + l·v_c + t1 + cx] ---------
    py, px = h, w
    padded = jnp.pad(img, ((py, py), (px, px)))
    v_c = _iota1(h1) - c1y
    y_idx = jnp.round(v_c + t0 + cy).astype(jnp.int32) + py
    # rows whose x-window would exceed the pad are entirely out-of-image
    # (|l·v_c| > w/2 + margin ⇒ |y_src| > h/2), so clamping is lossless
    x0 = jnp.clip(jnp.round(l * v_c + t1 + cx - c1x).astype(jnp.int32) + px,
                  0, w + 2 * px - w1)
    y_idx = jnp.clip(y_idx, 0, h + 2 * py - 1)

    def take_row(y, x):
        return jax.lax.dynamic_slice(padded, (y, x), (1, w1))[0]

    stage = jax.vmap(take_row)(y_idx, x0)                       # (h1, w1)

    # ---- D: rows scale d0 (h1→h1), cols scale d1 (w1→w) — MXU matmuls ----
    ry = _scale_matrix(h1, h1, d0).astype(stage.dtype)
    cm = _scale_matrix(w, w1, d1).astype(stage.dtype)
    stage = ry @ stage                                          # (h1, w1)
    stage = stage @ cm.T                                        # (h1, w)

    # ---- U: out[y, x] = stage[y_c + u·x_c + c1y, x] -----------------------
    stage_t = stage.T                                           # (w, h1)
    x_cs = _iota1(w) - cx
    y0 = jnp.clip(jnp.round(u * x_cs + (c1y - cy)).astype(jnp.int32),
                  0, h1 - h)

    def take_col(row, y):
        return jax.lax.dynamic_slice(row, (y,), (h,))

    out_t = jax.vmap(take_col)(stage_t, y0)                     # (w, h)
    return out_t.T


affine_warp_shear_batch = jax.vmap(affine_warp_shear, in_axes=(0, 0))
