"""Spatial partitioning (SP) — overlap-tile inference over the mesh.

The reference has no sequence/spatial parallelism (SURVEY §2.2); its largest
input is 512×1024 Cityscapes (ref:config/cityscapes_config.yml:17). This
module adds the TPU-native analogue for segmentation CNNs: split the WIDTH
axis across the mesh's ``data`` devices, each device runs the full network on
its tile plus a ``halo`` of context, and the valid centers are concatenated
back by the out-spec — the overlap-tile strategy of the original U-Net paper,
expressed as a ``shard_map``.

Exactness contract: the tiled output equals the full-image output wherever
``halo`` ≥ the network's half receptive field (fully-convolutional,
translation-invariant nets). Smaller halos trade edge accuracy for memory —
each device's activation footprint shrinks ~n_tiles× while weights stay
replicated, which is what makes >1k-wide inputs cheap to evaluate.

No collectives run during compute: the input is replicated, every device
slices its own window (reads are local), and only the concatenating out-spec
moves data.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def make_spatial_eval(apply_fn: Callable, mesh: Mesh, halo: int,
                      axis: str = "data") -> Callable:
    """Build ``step(params, batch_stats, img (B,H,W,C)) -> logits (B,H,W,K)``
    that tiles W over ``mesh.shape[axis]`` devices.

    ``apply_fn(params, batch_stats, img)`` must be shape-polymorphic in W
    (fully convolutional) and return same-spatial-size logits. W must be
    divisible by the axis size and ≥ tile+2·halo; for nets with internal
    downsampling of stride s, make halo and the tile width multiples of s
    (shift-invariance holds only for shifts divisible by s; ENet: s=8).
    """
    n = mesh.shape[axis]

    def body(params, batch_stats, img):
        i = jax.lax.axis_index(axis)
        b, h, w, c = img.shape
        assert w % n == 0, (
            f"spatial eval: W={w} not divisible by {axis} axis size {n} — "
            f"the concatenating out-spec would silently truncate the output")
        wt = w // n
        assert w >= wt + 2 * halo, (
            f"spatial eval: W={w} too small for tile {wt} + 2*halo {halo}")
        wwin = wt + 2 * halo
        # clamp the window INSIDE the image: edge tiles see the true image
        # border, so the net's own padding applies exactly as in the full
        # run (a zero-filled halo would differ wherever biases/BN make the
        # net non-zero on zero input)
        start = jnp.clip(i * wt - halo, 0, w - wwin)
        win = jax.lax.dynamic_slice(img, (0, 0, start, 0), (b, h, wwin, c))
        logits = apply_fn(params, batch_stats, win)
        off = i * wt - start
        return jax.lax.dynamic_slice(
            logits, (0, 0, off, 0), (b, h, wt, logits.shape[-1]))

    in_spec = P()  # replicate: each device slices its own window locally
    tiled = jax.shard_map(body, mesh=mesh,
                          in_specs=(in_spec, in_spec, in_spec),
                          out_specs=P(None, None, axis, None),
                          check_vma=False)
    return jax.jit(tiled)
