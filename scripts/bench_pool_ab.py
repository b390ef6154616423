#!/usr/bin/env python
"""Same-process A/B: pooling window-split formulations (VERDICT r4 item 7).

The r5 512² profiler trace (BASELINE.md "where the 323 ms goes") attributed
~48 ms/iter — 15% of the co-train step — to ops/pooling.py, most of it the
stride-2 W-slices (lane shuffles). Candidates, both value-exact with torch
tie-break parity (tests/test_ops.py + the exactness probe in this round's
notes):

  slices — strided slices + stack/reshape interleaves (the r1-r4 default)
  s2d    — one (B,h,2,w,2,C) reshape/transpose each way (the same relayout
           the ENet fast paths use); mask_unpool is broadcast*mask in BOTH
           variants now (it never splits windows anymore).

Both run the full bench.py workload (2-model co-train epoch, 256², bf16)
interleaved A/B/A/B in one process so tunnel/day variance cancels.

Usage: python scripts/bench_pool_ab.py [res=256] [reps=4]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_epoch(impl: str, img_u8, gt_u8, batch_idx, H: int):
    import jax

    from dct_tpu.losses import get_loss_fn
    from dct_tpu.models import Segmentator, stack_states
    from dct_tpu.ops import pooling as pool_mod
    from dct_tpu.train import steps as steps_mod

    K = 2
    segs = [Segmentator({"name": "enet", "num_classes": 4,
                         "compute_dtype": "bfloat16"},
                        {"name": "Adam", "lr": 1e-3, "weight_decay": 1e-4},
                        {"name": "StepLR", "step_size": 90, "gamma": 0.1},
                        jax.random.PRNGKey(i), input_shape=(1, H, H, 1))
            for i in range(K)]
    seg = segs[0]
    stacked = stack_states([{"params": s.state["params"],
                             "batch_stats": s.state["batch_stats"]}
                            for s in segs])
    state = {"params": stacked["params"], "batch_stats": stacked["batch_stats"],
             "opt_state": seg.tx.init(stacked["params"])}

    # IMPL is read inside _split_windows/_interleave at TRACE time — keep it
    # set through the warmup call; timed calls hit the jit cache.
    prev = pool_mod.IMPL
    pool_mod.IMPL = impl
    try:
        epoch_fn = steps_mod.make_cotrain_epoch(
            seg, K, 4, get_loss_fn("cross_entropy"),
            train_jsd=True, train_adv=True,
            augment_labeled=True, augment_unlabeled=True, eps_fgsm=0.03)
        state, m = epoch_fn(state, img_u8, gt_u8, *batch_idx(),
                            jax.random.PRNGKey(0), 1e-3, 0.5, 0.05)
        sup = np.asarray(m["sup_loss"])
        assert np.isfinite(sup).all(), (impl, sup)
    finally:
        pool_mod.IMPL = prev
    return state, epoch_fn


def main(argv) -> None:
    kv = dict(a.split("=", 1) for a in argv)
    H = int(kv.get("res", "256"))
    reps = int(kv.get("reps", "4"))

    import jax
    import jax.numpy as jnp

    K, B, Bu, T = 2, 4, 4, 30
    rs = np.random.RandomState(0)
    N = 1674
    img_u8 = jnp.asarray(rs.randint(0, 255, (N, H, H), dtype=np.uint8))
    gt_u8 = jnp.asarray(rs.randint(0, 4, (N, H, H)).astype(np.uint8))

    def batch_idx():
        idx_lab = rs.randint(0, N, (T, K, B)).astype(np.int32)
        idx_unlab = rs.randint(0, N, (T, Bu)).astype(np.int32)
        pairs = np.tile(np.array([0, 1], np.int32), (T, 1))
        return idx_lab, idx_unlab, pairs

    variants = {}
    for name in ("slices", "s2d"):
        variants[name] = build_epoch(name, img_u8, gt_u8, batch_idx, H)
        print(f"# compiled {name}", flush=True)

    times = {"slices": [], "s2d": []}
    key = jax.random.PRNGKey(1)
    for rep in range(reps):
        for name in ("slices", "s2d"):
            state, epoch_fn = variants[name]
            t0 = time.perf_counter()
            state, m = epoch_fn(state, img_u8, gt_u8, *batch_idx(),
                                jax.random.fold_in(key, rep), 1e-3, 0.5, 0.05)
            np.asarray(m["sup_loss"])
            dt = time.perf_counter() - t0
            times[name].append(dt)
            variants[name] = (state, epoch_fn)
            print(f"# rep {rep} {name}: {dt:.3f} s/{T}-iter", flush=True)

    images = (K * B + Bu) * T
    for name in ("slices", "s2d"):
        med = float(np.median(times[name]))
        print(f"{name}: median {med:.3f} s/{T}-iter = {images/med:.1f} img/s "
              f"(all: {[round(t, 3) for t in times[name]]})")


if __name__ == "__main__":
    main(sys.argv[1:])
