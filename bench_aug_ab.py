#!/usr/bin/env python
"""Same-process A/B: uint8-warp vs float32-warp fused augmentation.

Both variants run the full 2-model co-training epoch (the bench.py workload)
in one process, interleaved A/B/A/B, so tunnel/day variance cancels. The only
difference between the two jitted epochs is the augmentation inner path:

  u8  — warp the gathered uint8 img+gt pair (2 B/px through the warp gather),
        normalize after (augment.augment_u8_with_thetas)
  f32 — normalize first, stack img+gt as f32, warp 8 B/px
        (augment.augment_batch_with_thetas — the default, warp_gathered_u8)

The two are bit-identical in output (tests/test_data.py::
test_augment_u8_matches_f32_path); this measures which moves less HBM traffic
in the real step.

VERDICT (2026-08-18, v5e via tunnel, 4 interleaved reps each): f32 wins —
median 2.011 s/30-iter (179.0 img/s) vs u8 2.058 (174.9); every f32 rep beat
every u8 rep. The 2 B/px gather saving does not pay: the u8 warp's extra
cast passes outweigh it at 256². Default stays normalize-first
(augment.warp_gathered_u8); recorded in BASELINE.md.
"""
from __future__ import annotations

import time

import numpy as np


def build_epoch(u8_path: bool, img_u8, gt_u8, batch_idx):
    """Build AND warm up (trace+compile) one variant. The aug-path
    monkeypatch must be live during the warmup call: the step body imports
    augment_u8_with_thetas at trace time, not at builder time."""
    import jax

    from dct_tpu.losses import get_loss_fn
    from dct_tpu.models import Segmentator, stack_states
    from dct_tpu.train import steps as steps_mod
    from dct_tpu.data import augment as aug_mod

    K, B, Bu, H = 2, 4, 4, 256
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

    # dispatch point: steps.py imports warp_gathered_u8 at trace time
    fn = aug_mod.augment_u8_with_thetas if u8_path else aug_mod.warp_gathered_u8

    # patch the aug path and keep it live through the warmup (trace) call;
    # later timed calls hit the jit cache and never re-trace
    orig = aug_mod.warp_gathered_u8
    aug_mod.warp_gathered_u8 = fn
    try:
        epoch_fn = steps_mod.make_cotrain_epoch(
            seg, K, 4, get_loss_fn("cross_entropy"),
            train_jsd=True, train_adv=True,
            augment_labeled=True, augment_unlabeled=True, eps_fgsm=0.03)
        state, m = epoch_fn(state, img_u8, gt_u8, *batch_idx(),
                            jax.random.PRNGKey(0), 1e-3, 0.5, 0.05)
        np.asarray(m["sup_loss"])  # force compile+run
    finally:
        aug_mod.warp_gathered_u8 = orig
    return state, epoch_fn


def main() -> None:
    import jax

    K, B, Bu, H, T = 2, 4, 4, 256, 30
    rs = np.random.RandomState(0)
    N = 1674
    import jax.numpy as jnp
    img_u8 = jnp.asarray(rs.randint(0, 255, (N, H, H), dtype=np.uint8))
    gt_u8 = jnp.asarray(rs.randint(0, 4, (N, H, H)).astype(np.uint8))

    def batch_idx():
        idx_lab = rs.randint(0, N, (T, K, B)).astype(np.int32)
        idx_unlab = rs.randint(0, N, (T, Bu)).astype(np.int32)
        pairs = np.tile(np.array([0, 1], np.int32), (T, 1))
        return idx_lab, idx_unlab, pairs

    variants = {}
    for name, u8 in (("u8", True), ("f32", False)):
        variants[name] = build_epoch(u8, img_u8, gt_u8, batch_idx)
        print(f"# compiled {name}")

    times = {"u8": [], "f32": []}
    key = jax.random.PRNGKey(1)
    for rep in range(4):
        for name in ("u8", "f32"):
            state, epoch_fn = variants[name]
            t0 = time.perf_counter()
            state, m = epoch_fn(state, img_u8, gt_u8, *batch_idx(),
                                jax.random.fold_in(key, rep), 1e-3, 0.5, 0.05)
            np.asarray(m["sup_loss"])
            dt = time.perf_counter() - t0
            times[name].append(dt)
            variants[name] = (state, epoch_fn)
            print(f"# rep {rep} {name}: {dt:.3f} s/30-iter")

    images = (K * B + Bu) * T
    for name in ("u8", "f32"):
        med = float(np.median(times[name]))
        print(f"{name}: median {med:.3f} s/30-iter = {images/med:.1f} img/s "
              f"(all: {[round(t, 3) for t in times[name]]})")


if __name__ == "__main__":
    main()
