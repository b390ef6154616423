#!/usr/bin/env python
"""Micro-benchmarks: lax vs pallas pooling kernels, warp variants — on-chip.

Not the driver bench (that's bench.py); run manually when tuning:
    python bench_ops.py
"""
from __future__ import annotations

import time

import jax
import numpy as np


def timeit(fn, *args, iters=50):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])   # force completion
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    from dct_tpu.ops.pallas_pool import (mask_unpool_2x2_pallas,
                                         max_pool_2x2_with_mask_pallas)
    from dct_tpu.ops.pooling import mask_unpool_2x2, max_pool_2x2_with_mask
    from dct_tpu.data.augment import augment_batch

    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    rng = jax.random.PRNGKey(0)

    for shape in ((8, 128, 128, 16), (8, 64, 64, 64), (8, 32, 32, 128)):
        x = jax.random.normal(rng, shape)
        lax_pool = jax.jit(max_pool_2x2_with_mask)
        pl_pool = jax.jit(max_pool_2x2_with_mask_pallas)
        t_lax = timeit(lax_pool, x)
        t_pl = timeit(pl_pool, x)
        p, m = lax_pool(x)
        y = jax.random.normal(rng, p.shape)
        t_lax_up = timeit(jax.jit(mask_unpool_2x2), y, m)
        t_pl_up = timeit(jax.jit(mask_unpool_2x2_pallas), y, m)
        print(f"pool+mask {shape}: lax {t_lax*1e6:.0f}us  pallas {t_pl*1e6:.0f}us | "
              f"unpool: lax {t_lax_up*1e6:.0f}us  pallas {t_pl_up*1e6:.0f}us")

    img = jax.random.uniform(rng, (12, 256, 256, 1))
    gt = jax.random.randint(rng, (12, 256, 256), 0, 4)
    shear = jax.jit(lambda i, g, k: augment_batch(i, g, k, impl="shear"))
    fast = jax.jit(lambda i, g, k: augment_batch(i, g, k, impl="gather"))
    slow = jax.jit(lambda i, g, k: augment_batch(i, g, k, fast=False))
    print(f"augment 12x256²: shear(LDU) {timeit(shear, img, gt, rng)*1e3:.2f}ms  ", end="")
    print(f"augment 12x256²: fast(nearest,joint) {timeit(fast, img, gt, rng)*1e3:.2f}ms  "
          f"bilinear {timeit(slow, img, gt, rng)*1e3:.2f}ms")
