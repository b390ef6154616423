"""Bilinear resize with align_corners=True semantics, as two MXU matmuls.

The reference upsamples skip connections and final logits with torch's
``F.upsample_bilinear`` (ref:generalframework/arch/network.py:231-240,290),
which is align_corners=True: output coordinate v maps to input coordinate
v·(in−1)/(out−1). ``jax.image.resize`` only offers half-pixel centers, so
this module implements the align-corners variant directly — and does it the
TPU way: a separable 1-D linear interpolation is a dense (out, in) matrix per
axis, so the whole resize is ``A_h @ x @ A_wᵀ`` — two batched matmuls that run
on the MXU instead of per-pixel gathers.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=128)
def _interp_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) align-corners linear interpolation matrix."""
    if n_in == 1 or n_out == 1:
        # align_corners with a single point: every output reads input[0]
        m = np.zeros((n_out, n_in), np.float32)
        m[:, 0] = 1.0
        return m
    # torch's CPU upsample computes source coords in scalar_t (float32);
    # replicating that (not float64) is what makes the parity tests exact
    scale = np.float32(n_in - 1) / np.float32(n_out - 1)
    src = scale * np.arange(n_out, dtype=np.float32)
    lo = np.clip(np.floor(src).astype(np.int64), 0, n_in - 2)
    frac = (src - lo).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    m[rows, lo] = 1.0 - frac
    m[rows, lo + 1] += frac
    return m


def resize_bilinear_align_corners(x: jnp.ndarray, hw) -> jnp.ndarray:
    """Resize (B,H,W,C) → (B,h,w,C) with align_corners=True bilinear —
    exact parity with torch ``F.upsample_bilinear`` / ``F.interpolate(...,
    mode='bilinear', align_corners=True)``."""
    b, h_in, w_in, c = x.shape
    h_out, w_out = int(hw[0]), int(hw[1])
    if (h_out, w_out) == (h_in, w_in):
        return x
    ah = jnp.asarray(_interp_matrix(h_out, h_in))
    aw = jnp.asarray(_interp_matrix(w_out, w_in))
    # (B,H,W,C): contract H then W; einsum keeps both on the MXU
    y = jnp.einsum("oh,bhwc->bowc", ah, x.astype(jnp.float32))
    y = jnp.einsum("pw,bowc->bopc", aw, y)
    return y.astype(x.dtype)
