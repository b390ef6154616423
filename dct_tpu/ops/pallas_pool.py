"""Pallas TPU kernel: fused 2x2 max-pool-with-argmax-mask (+ unpool).

The lax formulation (dct_tpu.ops.pooling) expresses the pool/mask pair as
strided slices + stack/reshape interleaves that XLA fuses; this kernel fuses
the whole thing into one VMEM pass per (batch, row-block) tile — pooled
values and the one-hot argmax mask are produced from a single read of the
input block. Grid: (batch, row-blocks); channels ride the lane dimension.

``dct_tpu.ops.pooling`` stays the default compute path (XLA's fusion of the
slice formulation is already good — benchmarks in bench_ops.py decide);
equivalence is tested in tests/test_pallas_pool.py. On non-TPU backends the
kernels run in interpreter mode automatically.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl



def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _pool_mask_kernel(x_ref, pooled_ref, mask_ref):
    # reshape-based windowing: strided slices (x[0::2]) lower to gathers that
    # mosaic rejects ("Only 2D gather is supported"); singleton-axis indexing
    # of a reshaped view lowers cleanly
    x = x_ref[0]                        # (2*BR, W, C) block
    h2, w2, ch = x.shape
    xr = x.reshape(h2 // 2, 2, w2 // 2, 2, ch)
    a = xr[:, 0, :, 0, :]
    b = xr[:, 0, :, 1, :]
    c = xr[:, 1, :, 0, :]
    d = xr[:, 1, :, 1, :]
    pooled = jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))
    m00 = (a == pooled)
    m01 = (b == pooled) & ~m00
    m10 = (c == pooled) & ~m00 & ~m01
    m11 = ~m00 & ~m01 & ~m10
    pooled_ref[0] = pooled
    h, w = pooled.shape[:2]
    dt = x.dtype
    top = jnp.stack([m00.astype(dt), m01.astype(dt)], axis=2)   # (h,w,2,C)
    bot = jnp.stack([m10.astype(dt), m11.astype(dt)], axis=2)
    mask_ref[0] = jnp.stack([top, bot], axis=1).reshape(2 * h, 2 * w, ch)


def max_pool_2x2_with_mask_pallas(x: jnp.ndarray, block_rows: int = 4
                                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B,H,W,C) → (pooled (B,H/2,W/2,C), argmax mask (B,H,W,C))."""
    B, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    br = min(block_rows, H // 2)
    while (H // 2) % br:
        br -= 1
    grid = (B, (H // 2) // br)
    return pl.pallas_call(
        _pool_mask_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, 2 * br, W, C), lambda i, j: (i, j, 0, 0))],
        out_specs=(pl.BlockSpec((1, br, W // 2, C), lambda i, j: (i, j, 0, 0)),
                   pl.BlockSpec((1, 2 * br, W, C), lambda i, j: (i, j, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((B, H // 2, W // 2, C), x.dtype),
                   jax.ShapeDtypeStruct((B, H, W, C), x.dtype)),
        interpret=_interpret(),
    )(x)


def _unpool_kernel(y_ref, mask_ref, out_ref):
    y = y_ref[0]                        # (BR, W2, C)
    m = mask_ref[0]                     # (2*BR, 2*W2, C)
    h, w, ch = y.shape
    up = jnp.broadcast_to(y[:, None, :, None, :],
                          (h, 2, w, 2, ch)).reshape(2 * h, 2 * w, ch)
    out_ref[0] = up * m


def mask_unpool_2x2_pallas(y: jnp.ndarray, mask: jnp.ndarray,
                           block_rows: int = 4) -> jnp.ndarray:
    B, h, w, C = y.shape
    br = min(block_rows, h)
    while h % br:
        br -= 1
    grid = (B, h // br)
    return pl.pallas_call(
        _unpool_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, br, w, C), lambda i, j: (i, j, 0, 0)),
                  pl.BlockSpec((1, 2 * br, 2 * w, C), lambda i, j: (i, j, 0, 0))],
        out_specs=pl.BlockSpec((1, 2 * br, 2 * w, C), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 2 * h, 2 * w, C), y.dtype),
        interpret=_interpret(),
    )(y, mask)
