#!/usr/bin/env python
"""Cityscapes-shape TPU probe (VERDICT r2 item 4).

Compiles + times the city co-training epoch (make_city_cotrain_epoch: sup CE
+ JSD + two-direction FGSM/VAT mix, key2aug augmentation) at the reference's
real operating point — deeplabenet (3-channel ENet), 19 classes, 512×1024
(ref:config/cityscapes_config.yml:17) — on synthetic data, since the real
Cityscapes archive is not bundled (shapes are free, data isn't).

    python -u scripts/probe_city.py [batch=2] [iters=4] [h=512] [w=1024] \
        [remat=1] [adv=1]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv):
    kv = dict(a.split("=", 1) for a in argv)
    B = int(kv.get("batch", "2"))
    T = int(kv.get("iters", "4"))
    H = int(kv.get("h", "512"))
    W = int(kv.get("w", "1024"))
    remat = bool(int(kv.get("remat", "1")))
    adv = bool(int(kv.get("adv", "1")))

    import jax
    if int(kv.get("cpu", "0")):  # axon sitecustomize ignores JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dct_tpu.data.city_augment import get_composed_augmentations
    from dct_tpu.losses import get_loss_fn
    from dct_tpu.models import Segmentator, stack_states
    from dct_tpu.train.city import make_city_cotrain_epoch

    print(f"devices={jax.devices()} {H}x{W} batch={B} iters={T} "
          f"remat={remat} adv={adv}", flush=True)

    K, C = 2, 19
    segs = [Segmentator({"name": "deeplabenet", "num_classes": C,
                         "remat": remat, "compute_dtype": "bfloat16"},
                        {"name": "Adam", "lr": 5e-4, "weight_decay": 2e-4},
                        {"name": "StepLR", "step_size": 100, "gamma": 0.1},
                        jax.random.PRNGKey(i), input_shape=(1, H, W, 3))
            for i in range(K)]
    seg = segs[0]
    stacked = stack_states([{"params": s.state["params"],
                             "batch_stats": s.state["batch_stats"]}
                            for s in segs])
    state = {"params": stacked["params"],
             "batch_stats": stacked["batch_stats"],
             "opt_state": seg.tx.init(stacked["params"])}

    rs = np.random.RandomState(0)
    N = 8
    img_u8 = jnp.asarray(rs.randint(0, 255, (N, H, W, 3), dtype=np.uint8))
    gt = rs.randint(0, C, (N, H, W)).astype(np.uint8)
    gt[:, :8] = 250  # ignore_index band, as the real remap produces
    gt_u8 = jnp.asarray(gt)

    # the reference config's aug dict (ref:config/cityscapes_config.yml:18-20)
    aug = get_composed_augmentations({"rotate": 10, "rcrop": [H, W]})
    epoch_fn = make_city_cotrain_epoch(
        seg, K, C, get_loss_fn("cross_entropy", ignore_index=250),
        train_jsd=True, train_adv=adv, eps_fgsm=0.03, eps_vat=10.0,
        augment_fn=aug)

    idx_lab = rs.randint(0, N, (T, K, B)).astype(np.int32)
    idx_unlab = rs.randint(0, N, (T, B)).astype(np.int32)
    idx_adv_lab = rs.randint(0, N, (T, 2, B)).astype(np.int32)
    idx_adv_unlab = rs.randint(0, N, (T, 2, B)).astype(np.int32)
    flags = rs.rand(T, 2) < 0.5

    t0 = time.time()
    state, m = epoch_fn(state, img_u8, gt_u8, idx_lab, idx_unlab,
                        idx_adv_lab, idx_adv_unlab, flags,
                        jax.random.PRNGKey(0), 5e-4, 0.5, 0.05)
    sup = np.asarray(m["sup_loss"], dtype=np.float64)
    jsd = np.asarray(m["jsd_loss"], dtype=np.float64)
    advl = np.asarray(m["adv_loss"], dtype=np.float64)
    t_compile = time.time() - t0
    print(f"compile+first-epoch: {t_compile:.1f}s", flush=True)

    t0 = time.time()
    state, m = epoch_fn(state, img_u8, gt_u8, idx_lab, idx_unlab,
                        idx_adv_lab, idx_adv_unlab, flags,
                        jax.random.PRNGKey(1), 5e-4, 0.5, 0.05)
    np.asarray(m["sup_loss"])
    dt = time.time() - t0
    images = (K * B + B) * T  # labeled streams + unlabeled (adv re-gathers excluded)
    print(f"steady epoch: {dt:.2f}s = {1e3 * dt / T:.0f} ms/iter, "
          f"{images / dt:.1f} img/s", flush=True)

    ok = (np.isfinite(sup).all() and np.isfinite(jsd).all()
          and np.isfinite(advl).all())
    for t in range(T):
        print(f"iter {t}: sup={np.ravel(sup[t])} jsd={np.ravel(jsd[t])} "
              f"adv={np.ravel(advl[t])}", flush=True)
    print(f"RESULT {H}x{W} batch={B}: {'CLEAN' if ok else 'NAN'}", flush=True)
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
