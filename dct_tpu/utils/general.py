"""Shared functional helpers (TPU rebuild of ref:generalframework/utils/utils.py).

Layout convention: **class axis last** (NHWC / BHWC) everywhere on device —
the TPU-native choice (lane dimension = channels). The reference uses BCHW;
its einsum strings ``bcwh->bc`` / ``bcwh->c`` become ``bhwc->bc`` / ``bhwc->c``.

The reference guards every loss/metric with runtime simplex/one-hot asserts
(ref:generalframework/utils/utils.py:142-161). Those asserts force host syncs,
so here they are *debug-gated*: enable with ``dct_tpu.utils.general.set_debug(True)``
(used by the test-suite); in production they compile to nothing.
"""
from __future__ import annotations

import random
from pathlib import Path
from typing import Callable, Iterable, List, Sequence, TypeVar, Union

import jax
import jax.numpy as jnp
import numpy as np

A = TypeVar("A")
B = TypeVar("B")

_DEBUG = False


def set_debug(flag: bool) -> None:
    global _DEBUG
    _DEBUG = bool(flag)


def debug_enabled() -> bool:
    return _DEBUG


def map_(fn: Callable[[A], B], iter_: Iterable[A]) -> List[B]:
    return list(map(fn, iter_))


# ---------------------------------------------------------------------------
# simplex / one-hot predicates (ref:generalframework/utils/utils.py:142-161)
# ---------------------------------------------------------------------------

def simplex(t: jnp.ndarray, axis: int = -1) -> bool:
    """True iff ``t`` sums to one along ``axis`` (host-side check)."""
    s = jnp.sum(t.astype(jnp.float32), axis=axis)
    return bool(jnp.allclose(s, jnp.ones_like(s), atol=1e-4))


def sset(t: jnp.ndarray, values: Sequence[float]) -> bool:
    """True iff every element of ``t`` is in ``values``."""
    u = np.unique(np.asarray(t))
    return set(u.tolist()).issubset(set(values))


def one_hot(t: jnp.ndarray, axis: int = -1) -> bool:
    return simplex(t, axis) and sset(t, [0, 1])


def assert_simplex(t: jnp.ndarray, axis: int = -1, name: str = "tensor") -> None:
    """Debug-mode guard; compiles away unless set_debug(True) outside jit."""
    if _DEBUG and not isinstance(t, jax.core.Tracer):
        assert simplex(t, axis), f"{name} is not a simplex along axis {axis}"


# ---------------------------------------------------------------------------
# one-hot conversions (class-last; ref:generalframework/utils/utils.py:173-217)
# ---------------------------------------------------------------------------

def class2one_hot(seg: jnp.ndarray, C: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B,H,W) int map → (B,H,W,C) one-hot."""
    return jax.nn.one_hot(seg, C, dtype=dtype)


def probs2class(probs: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) probs → (B,H,W) argmax class."""
    return jnp.argmax(probs, axis=-1)


def pred2class(pred: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) logits or probs → (B,H,W) class (ref:utils.py:73-81)."""
    return jnp.argmax(pred, axis=-1)


def probs2one_hot(probs: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) probs → (B,H,W,C) hard one-hot."""
    C = probs.shape[-1]
    return class2one_hot(probs2class(probs), C, dtype=probs.dtype)


# ---------------------------------------------------------------------------
# dice (ref:generalframework/utils/utils.py:221-235)
# ---------------------------------------------------------------------------

def meta_dice(sum_axes: tuple, label: jnp.ndarray, pred: jnp.ndarray,
              smooth: float = 1e-8) -> jnp.ndarray:
    """Dice between one-hot ``label``/``pred`` (B,H,W,C), reduced over sum_axes.

    ``sum_axes=(1,2)`` → per-image per-class (2D dice, 'bcwh->bc');
    ``sum_axes=(0,1,2)`` → per-class over whole batch (3D dice, 'bcwh->c').
    """
    inter = jnp.sum(label * pred, axis=sum_axes).astype(jnp.float32)
    sums = (jnp.sum(label, axis=sum_axes) + jnp.sum(pred, axis=sum_axes)).astype(jnp.float32)
    return (2.0 * inter + smooth) / (sums + smooth)


def dice_coef(label: jnp.ndarray, pred: jnp.ndarray, smooth: float = 1e-8) -> jnp.ndarray:
    """2D (per-slice) dice: (B,H,W,C)→(B,C)."""
    return meta_dice((1, 2), label, pred, smooth)


def dice_batch(label: jnp.ndarray, pred: jnp.ndarray, smooth: float = 1e-8) -> jnp.ndarray:
    """3D (per-volume/batch) dice: (B,H,W,C)→(C,)."""
    return meta_dice((0, 1, 2), label, pred, smooth)


# ---------------------------------------------------------------------------
# misc host-side helpers
# ---------------------------------------------------------------------------

def fix_all_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return a root JAX key (ref:utils.py:397-404).

    JAX keys give per-call determinism; host RNGs only drive the split math.
    """
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def colormap(n: int) -> np.ndarray:
    """Pascal-style color map used by Colorize (ref:utils.py:48-70)."""
    cmap = np.zeros([n, 3]).astype(np.uint8)
    for i in np.arange(n, dtype=np.int64):
        r, g, b = 0, 0, 0
        for j in np.arange(8):
            r = r + (1 << (7 - j)) * ((i & (1 << (3 * j))) >> (3 * j))
            g = g + (1 << (7 - j)) * ((i & (1 << (3 * j + 1))) >> (3 * j + 1))
            b = b + (1 << (7 - j)) * ((i & (1 << (3 * j + 2))) >> (3 * j + 2))
        cmap[i, :] = np.array([r, g, b])
    return cmap


def colorize(seg: np.ndarray, n: int = 22) -> np.ndarray:
    """(H,W) class map → (H,W,3) uint8 RGB."""
    return colormap(n)[np.asarray(seg).astype(np.int64)]


def save_images(segs: Union[np.ndarray, jnp.ndarray], names: Iterable[str],
                root: Union[str, Path], mode: str, iter: int,
                seg_num: str | None = None) -> None:
    """Dump (B,H,W) class maps as PNGs: root/iter###/mode[/seg_num]/name.png
    (ref:generalframework/utils/utils.py:238-250)."""
    from PIL import Image

    segs = np.asarray(segs).astype(np.uint8)
    assert segs.ndim == 3, segs.shape
    for seg, name in zip(segs, names):
        if seg_num is None:
            save_path = Path(root, f"iter{iter:03d}", mode, name).with_suffix(".png")
        else:
            save_path = Path(root, f"iter{iter:03d}", mode, seg_num, name).with_suffix(".png")
        save_path.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(seg).save(str(save_path))


def check_finite_losses(losses: dict, epoch: int, policy: str = "warn") -> bool:
    """Per-epoch training-loss health guard (no reference equivalent).

    The TPU tunnel has produced NaN-from-iteration-0 binaries on fresh
    bf16-512² compiles (BASELINE.md, 2026-08-21) — a silently-NaN run wastes
    hours and its checkpoints poison downstream summaries. The loss metrics
    are already fetched to host once per epoch, so the check is free.

    ``policy``: "warn" (default) prints a loud line and keeps going,
    "abort" raises FloatingPointError, "ignore" disables. Returns True when
    every entry is finite.
    """
    bad = sorted(k for k, v in losses.items()
                 if not np.all(np.isfinite(np.asarray(v))))
    if not bad:
        return True
    msg = (f"!! non-finite training losses at epoch {epoch}: {bad} — "
           "if this is a fresh-compile NaN on the tunnel chip, re-launching "
           "usually clears it (see BASELINE.md 512² ladder triage)")
    if policy == "abort":
        raise FloatingPointError(msg)
    if policy != "ignore":
        print(msg, flush=True)
    return False
