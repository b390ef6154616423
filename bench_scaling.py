#!/usr/bin/env python
"""Throughput-vs-batch study (VERDICT r2 item 3).

Same workload as bench.py — 2-ENet co-training step (sup CE + JSD + FGSM,
on-device aug, 256², bf16) as one jitted lax.scan — swept over per-chip
batch size. Separates the per-dispatch latency floor from real framework
cost: under DP the per-chip batch grows with the global batch, so the
large-batch rows predict multi-chip throughput.

    python -u bench_scaling.py [batches=4,8,16,32] [iters=30] [calls=2]

Prints one JSON line per batch size:
  {"batch_per_model": B, "images_per_sec": N, "ms_per_image": M, ...}
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def run_one(B: int, T: int, calls: int) -> dict:
    import jax
    import jax.numpy as jnp

    from dct_tpu.losses import get_loss_fn
    from dct_tpu.models import Segmentator, stack_states
    from dct_tpu.train.steps import make_cotrain_epoch

    K, H = 2, 256
    Bu = B

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
    state = {"params": stacked["params"],
             "batch_stats": stacked["batch_stats"],
             "opt_state": seg.tx.init(stacked["params"])}

    rs = np.random.RandomState(0)
    N = 1674
    img_u8 = jnp.asarray(rs.randint(0, 255, (N, H, H), dtype=np.uint8))
    gt_u8 = jnp.asarray(rs.randint(0, 4, (N, H, H)).astype(np.uint8))

    epoch_fn = make_cotrain_epoch(seg, K, 4, get_loss_fn("cross_entropy"),
                                  train_jsd=True, train_adv=True,
                                  augment_labeled=True,
                                  augment_unlabeled=True, eps_fgsm=0.03)

    def batch_idx():
        idx_lab = rs.randint(0, N, (T, K, B)).astype(np.int32)
        idx_unlab = rs.randint(0, N, (T, Bu)).astype(np.int32)
        pairs = np.tile(np.array([0, 1], np.int32), (T, 1))
        return idx_lab, idx_unlab, pairs

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state, m = epoch_fn(state, img_u8, gt_u8, *batch_idx(), key,
                        1e-3, 0.5, 0.05)
    np.asarray(m["sup_loss"])  # axon: block_until_ready returns early
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    for c in range(calls):
        state, m = epoch_fn(state, img_u8, gt_u8, *batch_idx(),
                            jax.random.fold_in(key, c), 1e-3, 0.5, 0.05)
    np.asarray(m["sup_loss"])
    np.asarray(jax.tree_util.tree_leaves(state["params"])[0])
    dt = time.perf_counter() - t0

    images = (K * B + Bu) * T * calls
    iters = T * calls
    return {"batch_per_model": B, "unlabeled_batch": Bu,
            "images_per_sec": round(images / dt, 2),
            "ms_per_iter": round(1e3 * dt / iters, 2),
            "compile_s": round(t_compile, 1)}


def main(argv):
    kv = dict(a.split("=", 1) for a in argv)
    batches = [int(b) for b in kv.get("batches", "4,8,16,32").split(",")]
    T = int(kv.get("iters", "30"))
    calls = int(kv.get("calls", "2"))
    for B in batches:
        row = run_one(B, T, calls)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
