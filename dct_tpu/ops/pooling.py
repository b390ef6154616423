"""2x2 max-pooling with argmax mask + mask-unpooling, NHWC, TPU-native.

The reference ENet uses ``nn.MaxPool2d(2, return_indices=True)`` +
``nn.MaxUnpool2d(2)`` (ref:generalframework/arch/enet.py:89-99,127-142).
JAX has no unpool primitive, and a scatter of flat indices would serialize on
TPU. Instead we exploit that the 2x2/stride-2 windows are disjoint:

* ``max_pool_2x2_with_mask``  → (pooled, mask) where ``mask`` is a full-res
  one-hot {0,1} map marking, inside each 2x2 window, the *first* (row-major)
  position attaining the max — the same element torch's flat indices select.
* ``mask_unpool_2x2``         → broadcast each pooled value back over its
  window and multiply by the mask. Pure elementwise + reshapes: XLA fuses the
  whole thing into the surrounding convolutions; nothing scatters.

Two formulations are kept, selected by the module global ``IMPL``
("slices" | "s2d"); both are value-exact with identical tie-breaks:

* "slices": strided slices + stack/reshape interleaves.
* "s2d": one (B,h,2,w,2,C)-reshape/transpose each way (the space-to-depth
  relayout the ENet fast paths already use) — fewer, larger layout ops.

The r5 512² profiler trace attributed ~48 ms/iter (15% of the co-train
step) to this file, most of it the strided W-slices (lane shuffles at 512
columns); the A/B between the two lives in bench_ops.py / scripts/probe512.
``mask_unpool_2x2`` never splits windows in either impl: it is a 2x2
nearest-neighbor broadcast of the pooled grid times the full-res mask.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# Module-level switch, read at trace time. "s2d" measured 295.4 vs 260.2
# img/s for "slices" on the full bench.py co-train step (interleaved A/B,
# scripts/bench_pool_ab.py, 2026-08-21) — the stride-2 lane shuffles were
# the single biggest non-conv cost in the r5 512² trace.
IMPL = "s2d"


def _split_windows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(B,H,W,C) → the four 2x2-window corners, each (B,H/2,W/2,C)."""
    if IMPL == "s2d":
        b, h, w, c = x.shape
        y = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        return y[:, :, :, 0, 0], y[:, :, :, 0, 1], y[:, :, :, 1, 0], y[:, :, :, 1, 1]
    return (x[:, 0::2, 0::2, :], x[:, 0::2, 1::2, :],
            x[:, 1::2, 0::2, :], x[:, 1::2, 1::2, :])


def _interleave(m00, m01, m10, m11) -> jnp.ndarray:
    """Inverse of _split_windows: four (B,h,w,C) corners → (B,2h,2w,C)."""
    b, h, w, c = m00.shape
    if IMPL == "s2d":
        y = jnp.stack([jnp.stack([m00, m01], axis=3),
                       jnp.stack([m10, m11], axis=3)], axis=3)  # (B,h,w,2,2,C)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)
    top = jnp.stack([m00, m01], axis=3)      # (B,h,w,2,C)
    bot = jnp.stack([m10, m11], axis=3)
    top = top.reshape(b, h, 2 * w, c)
    bot = bot.reshape(b, h, 2 * w, c)
    rows = jnp.stack([top, bot], axis=2)     # (B,h,2,2w,C)
    return rows.reshape(b, 2 * h, 2 * w, c)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Plain 2x2/stride-2 max pool, NHWC (H, W must be even)."""
    a, b, c, d = _split_windows(x)
    return jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))


def max_pool_2x2_with_mask(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2x2/stride-2 max pool returning (pooled, full-res argmax mask).

    The mask marks the first max in row-major window order — torch's
    ``return_indices=True`` tie-break (ref:enet.py:89,131).
    """
    a, b, c, d = _split_windows(x)
    pooled = jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))
    m00 = (a == pooled)
    m01 = (b == pooled) & ~m00
    m10 = (c == pooled) & ~m00 & ~m01
    m11 = ~m00 & ~m01 & ~m10
    mask = _interleave(m00, m01, m10, m11).astype(x.dtype)
    return pooled, mask


def mask_unpool_2x2(y: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Place each value of ``y`` (B,h,w,C) at its argmax position recorded in
    ``mask`` (B,2h,2w,C); zeros elsewhere — ``nn.MaxUnpool2d(2)`` semantics.

    2x2 nearest-neighbor broadcast of ``y`` times the mask: no window
    splits/interleaves at all (the broadcast-reshape is contiguous), so the
    only real work is one elementwise multiply at full resolution."""
    b, h, w, c = y.shape
    up = jnp.broadcast_to(y[:, :, None, :, None, :], (b, h, 2, w, 2, c)) \
            .reshape(b, 2 * h, 2 * w, c)
    return up * mask
