#!/usr/bin/env python
"""Interleaved A/B of the flat-fused optimizer (optim.flatten_tx: Adam over
one concatenated vector per dtype) vs per-leaf Adam (~200 leaves x ~10 tiny
elementwise ops/step), on the real chip at the bench.py operating point
(2 ENets, batch 4+4, 256², bf16, jsd+adv, fused aug+forward). The update is
bit-identical (tests/test_optim_flat.py); this measures only the op-count /
small-buffer-latency effect. Both variants share the same process so tunnel
drift cancels; reps alternate A,B,A,B,...

Run: python scripts/bench_flat_optim_ab.py [reps=4]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(reps: int = 4) -> None:
    import jax
    import jax.numpy as jnp

    from dct_tpu.losses import get_loss_fn
    from dct_tpu.models import Segmentator, stack_states
    from dct_tpu.train.steps import make_cotrain_epoch

    K, B, Bu, H, T = 2, 4, 4, 256, 30

    def make_segs(fused: bool):
        return [Segmentator({"name": "enet", "num_classes": 4,
                             "compute_dtype": "bfloat16"},
                            {"name": "Adam", "lr": 1e-3, "weight_decay": 1e-4,
                             "fused": fused},
                            {"name": "StepLR", "step_size": 90, "gamma": 0.1},
                            jax.random.PRNGKey(i), input_shape=(1, H, H, 1))
                for i in range(K)]

    fns, states = {}, {}
    rs = np.random.RandomState(0)
    N = 1674
    img_u8 = jnp.asarray(rs.randint(0, 255, (N, H, H), dtype=np.uint8))
    gt_u8 = jnp.asarray(rs.randint(0, 4, (N, H, H)).astype(np.uint8))

    for name, fused in (("flat", True), ("per-leaf", False)):
        segs = make_segs(fused)
        seg = segs[0]
        stacked = stack_states([{"params": s.state["params"],
                                 "batch_stats": s.state["batch_stats"]}
                                for s in segs])
        states[name] = {"params": stacked["params"],
                        "batch_stats": stacked["batch_stats"],
                        "opt_state": seg.tx.init(stacked["params"])}
        fns[name] = make_cotrain_epoch(seg, K, 4, get_loss_fn("cross_entropy"),
                                       train_jsd=True, train_adv=True,
                                       augment_labeled=True,
                                       augment_unlabeled=True, eps_fgsm=0.03)

    def batch_idx():
        idx_lab = rs.randint(0, N, (T, K, B)).astype(np.int32)
        idx_unlab = rs.randint(0, N, (T, Bu)).astype(np.int32)
        pairs = np.tile(np.array([0, 1], np.int32), (T, 1))
        return idx_lab, idx_unlab, pairs

    key = jax.random.PRNGKey(0)
    for n, fn in fns.items():          # compile both first
        t0 = time.perf_counter()
        states[n], m = fn(states[n], img_u8, gt_u8, *batch_idx(), key,
                          1e-3, 0.5, 0.05)
        np.asarray(m["sup_loss"])
        print(f"{n}: compile+first call {time.perf_counter() - t0:.1f}s",
              flush=True)

    times: dict = {n: [] for n in fns}
    for r in range(reps):
        for n, fn in fns.items():
            t0 = time.perf_counter()
            states[n], m = fn(states[n], img_u8, gt_u8, *batch_idx(),
                              jax.random.fold_in(key, r), 1e-3, 0.5, 0.05)
            np.asarray(m["sup_loss"])
            dt = time.perf_counter() - t0
            times[n].append(dt)
            ips = (K * B + Bu) * T / dt
            print(f"rep {r} {n}: {dt:.3f}s = {ips:.1f} img/s", flush=True)

    for n in fns:
        med = float(np.median(times[n]))
        print(f"{n}: median {med:.3f}s = {(K*B+Bu)*T/med:.1f} img/s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
