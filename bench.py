#!/usr/bin/env python
"""Benchmark: 2-model co-training step throughput on the real chip.

Prints ONE JSON line:
  {"metric": "cotrain_images_per_sec_per_chip", "value": N, "unit": "images/sec",
   "vs_baseline": R}

Workload = BASELINE.json config 2/3: two ENets, batch 4 labeled each +
batch 4 unlabeled, 256x256, supervised CE + JSD + FGSM diversity, on-device
augmentation — i.e. the reference hot loop (ref:cotraining_totalloss.py:203-248)
as one jitted lax.scan.

Baseline: the reference publishes no numbers (BASELINE.md). The denominator is
the same hot-loop measured with the reference's torch ENet on this machine's
only torch device (CPU, 1 core): 2.727 images/sec (see BASELINE.md table) —
hardware-asymmetric, recorded for lack of any CUDA/published number.
"""
from __future__ import annotations

import json
import time

import numpy as np

TORCH_CPU_BASELINE_IPS = 2.727  # measured 2026-08-16, see BASELINE.md


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dct_tpu.losses import get_loss_fn
    from dct_tpu.models import Segmentator, stack_states
    from dct_tpu.train.steps import make_cotrain_epoch

    K, B, Bu, H = 2, 4, 4, 256
    T = 30  # iterations per timed call

    # production config: bfloat16 activations (fp32 params/optimizer/logits)
    # + single-gather nearest augmentation — see BASELINE.md for the ablation
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

    rs = np.random.RandomState(0)
    N = 1674  # ACDC train-slice count
    img_u8 = jnp.asarray(rs.randint(0, 255, (N, H, H), dtype=np.uint8))
    gt_u8 = jnp.asarray(rs.randint(0, 4, (N, H, H)).astype(np.uint8))

    epoch_fn = make_cotrain_epoch(seg, K, 4, get_loss_fn("cross_entropy"),
                                  train_jsd=True, train_adv=True,
                                  augment_labeled=True, augment_unlabeled=True,
                                  eps_fgsm=0.03)

    def batch_idx():
        idx_lab = rs.randint(0, N, (T, K, B)).astype(np.int32)
        idx_unlab = rs.randint(0, N, (T, Bu)).astype(np.int32)
        pairs = np.tile(np.array([0, 1], np.int32), (T, 1))
        return idx_lab, idx_unlab, pairs

    key = jax.random.PRNGKey(0)
    # warmup/compile (np.asarray forces completion — on the axon platform
    # block_until_ready returns before execution finishes)
    state, m = epoch_fn(state, img_u8, gt_u8, *batch_idx(), key, 1e-3, 0.5, 0.05)
    np.asarray(m["sup_loss"])

    calls = 3
    t0 = time.perf_counter()
    for c in range(calls):
        state, m = epoch_fn(state, img_u8, gt_u8, *batch_idx(),
                            jax.random.fold_in(key, c), 1e-3, 0.5, 0.05)
    sup_final = np.asarray(m["sup_loss"])
    np.asarray(jax.tree_util.tree_leaves(state["params"])[0])
    dt = time.perf_counter() - t0

    images = (K * B + Bu) * T * calls
    ips = images / dt
    # a NaN-poisoned step can be *faster* than a healthy one — never let the
    # headline number report a broken run
    assert np.isfinite(sup_final).all() and np.isfinite(np.asarray(m["jsd_loss"])).all() \
        and np.isfinite(np.asarray(m["adv_loss"])).all(), "non-finite losses in bench epoch"

    # ---- MFU: XLA-counted FLOPs of the compiled epoch vs the chip's bf16
    # peak (v5e: 197 TFLOP/s). ENet's 13/16/32-channel stages keep this low
    # by construction — the number quantifies how elementwise/HBM-bound the
    # step is (BASELINE.md ablation).
    mfu_pct = None
    try:
        idx_lab, idx_unlab, pairs = batch_idx()
        cost = epoch_fn.lower(state, img_u8, gt_u8, idx_lab, idx_unlab,
                              pairs, key, 1e-3, 0.5, 0.05) \
                       .compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_call = float(cost.get("flops", 0.0))
        if flops_per_call > 0:
            mfu_pct = 100.0 * flops_per_call * calls / dt / 197e12
            # this tunnel chip's own measured matmul ceiling is ~1.7 TFLOP/s
            # (BASELINE.md hardware calibration) — report MFU against the
            # hardware actually reachable too
            mfu_measured_pct = 100.0 * flops_per_call * calls / dt / 1.7e12
    except Exception as e:  # cost analysis is backend-dependent
        print(f"# cost_analysis unavailable: {e}")

    out = {"metric": "cotrain_images_per_sec_per_chip",
           "value": round(ips, 2), "unit": "images/sec",
           "vs_baseline": round(ips / TORCH_CPU_BASELINE_IPS, 2)}
    if mfu_pct is not None:
        out["mfu_bf16_pct"] = round(mfu_pct, 3)
        out["mfu_vs_measured_peak_pct"] = round(mfu_measured_pct, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
