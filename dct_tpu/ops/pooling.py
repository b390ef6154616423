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

Everything is built from strided slices + stack/reshape interleaves (no 6-D
transposes), which lower to cheap layout ops on TPU.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _split_windows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(B,H,W,C) → the four 2x2-window corners, each (B,H/2,W/2,C)."""
    return (x[:, 0::2, 0::2, :], x[:, 0::2, 1::2, :],
            x[:, 1::2, 0::2, :], x[:, 1::2, 1::2, :])


def _interleave(m00, m01, m10, m11) -> jnp.ndarray:
    """Inverse of _split_windows: four (B,h,w,C) corners → (B,2h,2w,C)."""
    top = jnp.stack([m00, m01], axis=3)      # (B,h,w,2,C)
    bot = jnp.stack([m10, m11], axis=3)
    b, h, w, _, c = top.shape
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
    ``mask`` (B,2h,2w,C); zeros elsewhere — ``nn.MaxUnpool2d(2)`` semantics."""
    a, b, c, d = _split_windows(mask)
    return _interleave(y * a, y * b, y * c, y * d)
