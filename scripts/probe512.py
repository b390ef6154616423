#!/usr/bin/env python
"""512x512 tunnel probe (VERDICT r2 item 1 / 7).

Runs a T-iteration 2-model co-training epoch (sup CE + JSD + FGSM, the full
spleen-shaped step: ENet, 2 classes, 1 channel, 512x512) on the default
platform and prints per-iteration losses, so crashes / NaNs can be bisected
by remat and batch size:

    python -u scripts/probe512.py [remat=0|1] [batch=2] [iters=5] [res=512] \
        [fuse=0|1] [aug=0|1] [dtype=bfloat16|float32] [trace=/path]

Round-4 use: the 512² step-decomposition ladder (VERDICT r3 item 7) —
aug on/off × fuse_forward on/off × bf16/fp32 at batch 4, plus an optional
jax.profiler trace of the steady-state epoch.

History (BASELINE.md "512x512 on the tunnel chip", 2026-08-17): two full-run
worker crashes, one compile-helper SIGKILL, and an iteration-0 adv-term NaN
that CPU does NOT reproduce at identical code/shapes/dtype. Arch.remat was
built as the memory lever but never A/B'd here — this script is that A/B.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv):
    kv = dict(a.split("=", 1) for a in argv)
    remat = bool(int(kv.get("remat", "1")))
    fuse = bool(int(kv.get("fuse", "1")))
    aug = bool(int(kv.get("aug", "1")))
    dtype = kv.get("dtype", "bfloat16")
    adv_dtype = kv.get("adv_dtype")  # e.g. float32: FGSM segment only
    trace_dir = kv.get("trace")
    B = int(kv.get("batch", "2"))
    T = int(kv.get("iters", "5"))
    H = W = int(kv.get("res", "512"))

    import jax
    import jax.numpy as jnp

    from dct_tpu.losses import get_loss_fn
    from dct_tpu.models import Segmentator, stack_states
    from dct_tpu.train.steps import make_cotrain_epoch

    print(f"devices={jax.devices()} remat={remat} batch={B} iters={T} "
          f"res={H} fuse={fuse} aug={aug} dtype={dtype} adv_dtype={adv_dtype}",
          flush=True)

    K, C = 2, 2  # spleen: background + spleen
    segs = [Segmentator({"name": "enet", "num_classes": C, "remat": remat,
                         "compute_dtype": dtype},
                        {"name": "Adam", "lr": 1e-3, "weight_decay": 1e-4},
                        {"name": "StepLR", "step_size": 90, "gamma": 0.1},
                        jax.random.PRNGKey(i), input_shape=(1, H, W, 1))
            for i in range(K)]
    seg = segs[0]
    stacked = stack_states([{"params": s.state["params"],
                             "batch_stats": s.state["batch_stats"]}
                            for s in segs])
    state = {"params": stacked["params"], "batch_stats": stacked["batch_stats"],
             "opt_state": seg.tx.init(stacked["params"])}

    rs = np.random.RandomState(0)
    N = 16
    # Spleen-like content: smooth anatomy-ish intensity + small fg blobs.
    img_u8 = jnp.asarray(rs.randint(0, 255, (N, H, W), dtype=np.uint8))
    gt = np.zeros((N, H, W), np.uint8)
    for n in range(N):
        y0, x0 = rs.randint(100, H - 140, 2)
        gt[n, y0:y0 + 80, x0:x0 + 120] = 1
    gt_u8 = jnp.asarray(gt)
    idx_lab = rs.randint(0, N, (T, K, B)).astype(np.int32)
    idx_unlab = rs.randint(0, N, (T, B)).astype(np.int32)
    pairs = np.tile(np.array([0, 1], np.int32), (T, 1))

    epoch_fn = make_cotrain_epoch(seg, K, C, get_loss_fn("cross_entropy"),
                                  train_jsd=True, train_adv=True,
                                  augment_labeled=aug, augment_unlabeled=aug,
                                  eps_fgsm=0.03, fuse_aug="merged" if aug else False,
                                  fuse_forward=fuse, adv_dtype=adv_dtype)
    t0 = time.time()
    new_state, metrics = epoch_fn(state, img_u8, gt_u8, idx_lab, idx_unlab,
                                  pairs, jax.random.PRNGKey(0),
                                  1e-3, 0.5, 0.05)
    sup = np.asarray(metrics["sup_loss"], dtype=np.float64)
    jsd = np.asarray(metrics["jsd_loss"], dtype=np.float64)
    adv = np.asarray(metrics["adv_loss"], dtype=np.float64)
    dt = time.time() - t0
    print(f"compile+run: {dt:.1f}s", flush=True)

    # steady-state timing (second call hits the compile cache)
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    t0 = time.time()
    new_state, metrics = epoch_fn(new_state, img_u8, gt_u8, idx_lab,
                                  idx_unlab, pairs, jax.random.PRNGKey(1),
                                  1e-3, 0.5, 0.05)
    np.asarray(metrics["sup_loss"])
    dt = time.time() - t0
    if trace_dir:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {trace_dir}", flush=True)
    images = (K * B + B) * T
    print(f"steady: {dt:.2f}s = {1e3 * dt / T:.0f} ms/iter, "
          f"{images / dt:.1f} img/s", flush=True)
    for t in range(T):
        print(f"iter {t}: sup={np.ravel(sup[t])} jsd={np.ravel(jsd[t])} "
              f"adv={np.ravel(adv[t])}", flush=True)
    ok = np.isfinite(sup).all() and np.isfinite(jsd).all() and np.isfinite(adv).all()
    print(f"RESULT remat={remat} batch={B} res={H} fuse={fuse} aug={aug} "
          f"dtype={dtype} adv_dtype={adv_dtype}: {'CLEAN' if ok else 'NAN'}",
          flush=True)
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
