#!/usr/bin/env python
"""Channel-padding / space-to-depth micro-experiments (VERDICT r1 item 3).

Question: ENet's 13/16/32-channel stages starve the MXU — does padding
channels to TPU-friendly sizes (or space-to-depth on the high-res
low-channel stages) buy wall-clock speed, at fixed spatial footprint?

Measurements (bf16, on-chip):
1. conv 3x3 CxC fwd wall time vs C at fixed spatial size — if time is flat
   in C up to ~64, the small-channel convs are latency/bandwidth-bound and
   padding is "free" capacity (worth restructuring); if time scales ~C²,
   padding only wastes FLOPs.
2. elementwise chain (BN-ish normalize + PReLU) at C=14 vs C=112 at equal
   element count — lane-efficiency probe for the NHWC low-C stages.
3. InitialBlock as-is vs space-to-depth formulation (exact same math:
   conv(1->13, 3x3, s2) == conv(s2d(x), 2x2 kernel with scattered taps).

Run manually: python bench_channel.py ; record results in BASELINE.md.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit_scanned(op, x, *consts, iters=200, chain=None):
    """Time ``op`` INSIDE one jit by scanning it ``iters`` times with a data
    dependency between steps. Per-dispatch tunnel latency on this platform
    is ~ms — larger than the ops under test — so per-call timing measures
    the RPC, not the chip; one scan call amortizes it away.

    ``chain(next_input, out)`` folds the output back into the next input
    when shapes differ (default: out IS the next input)."""
    chain = chain or (lambda x, out: out)

    def body(c, _):
        return chain(c, op(c, *consts)), None

    fn = jax.jit(lambda x: jax.lax.scan(body, x, None, length=iters)[0])
    out = fn(x)
    np.asarray(out)                     # compile + complete
    t0 = time.perf_counter()
    out = fn(x)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    B = 12

    # ---- 1. conv 3x3 CxC time vs C (64² and 32² spatial, bf16) ----------
    print("\n== conv 3x3 CxC fwd (bf16) ==")
    for hw in (64, 32):
        for C in (13, 16, 32, 64, 128, 256):
            x = jax.random.normal(key, (B, hw, hw, C), jnp.bfloat16)
            w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.05
            def conv(x, w):
                return jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # output shape == input shape: chain directly (0.05-scaled
            # weights keep the chained activations from overflowing bf16)
            t = timeit_scanned(conv, x, w)
            gflop = 2 * B * hw * hw * C * C * 9 / 1e9
            print(f"  {hw}²xC={C:4d}: {t*1e6:8.1f} µs  "
                  f"({gflop / t / 1e3:6.2f} TFLOP/s)")

    # ---- 2. elementwise lane probe --------------------------------------
    print("\n== elementwise chain at equal element count (bf16) ==")
    def ew_chain(x, scale, bias, alpha):
        h = x * scale + bias
        return jnp.where(h >= 0, h, alpha * h)
    for (hw, C) in ((128, 14), (64, 56), (32, 224)):
        x = jax.random.normal(key, (B, hw, hw, C), jnp.bfloat16)
        s = jnp.ones((C,), jnp.bfloat16)
        t = timeit_scanned(ew_chain, x, s, s, s)
        gb = 2 * x.size * 2 / 1e9
        print(f"  ({hw}², C={C:3d}): {t*1e6:8.1f} µs  ({gb / t:6.1f} GB/s eff)")

    # ---- 3. InitialBlock vs space-to-depth (exact) ----------------------
    print("\n== InitialBlock conv(1->13, 3x3, s2) at 256², batch 12 ==")
    x = jax.random.normal(key, (B, 256, 256, 1), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 1, 13), jnp.bfloat16)

    def direct(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # space-to-depth: x (B,2m,2n,1) → (B,m,n,4) blocks [[tl,tr],[bl,br]];
    # the 3x3 s2 conv with pad 1 reads, for output (i,j), input rows
    # 2i-1..2i+1 × cols 2j-1..2j+1 — expressible as a 2x2 conv over the
    # s2d image with a 2x2x4xO kernel carrying the 9 taps (7 zeros).
    def s2d(x):
        b, h, w_, c = x.shape
        x = x.reshape(b, h // 2, 2, w_ // 2, 2, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w_ // 2, 4 * c)

    def make_s2d_kernel(w):
        # w (3,3,1,O) taps at offsets dy,dx ∈ {-1,0,1} relative to (2i,2j).
        # s2d pixel (p,q,s) with s=(sy,sx) holds original (2p+sy, 2q+sx).
        # tap (dy,dx) = original (2i+dy, 2j+dx) = s2d block (i + (dy<0 ? -1
        # : 0)... enumerated directly below.
        O = w.shape[-1]
        k = np.zeros((2, 2, 4, O), np.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                y, x_ = dy + 1, dx + 1          # index into the 3x3 kernel
                # original row r=2i+dy → block row i+(r//2 - i) ...
                br, sy = (0, dy) if dy >= 0 else (-1, 2 + dy) if False else \
                    ((dy + 2) // 2 + (0 if dy >= 0 else -1), (dy + 2) % 2)
                br = 0 if dy >= 0 else -1
                sy = dy if dy >= 0 else 2 + dy
                bc = 0 if dx >= 0 else -1
                sx = dx if dx >= 0 else 2 + dx
                # conv kernel position: output (i,j) = sum over kernel pos
                # (ky,kx) of in[i+ky-pad_y, j+kx-pad_x]; choose pad=1 so
                # ky = br+1 ∈ {0,1}
                k[br + 1, bc + 1, sy * 2 + sx, :] += np.asarray(
                    w[y, x_, 0, :], np.float32)
        return jnp.asarray(k, w.dtype)

    ws = make_s2d_kernel(w)

    def via_s2d(x, ws):
        return jax.lax.conv_general_dilated(
            s2d(x), ws, (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    d = jax.jit(direct)
    s = jax.jit(via_s2d)
    ref = np.asarray(d(x, w), np.float32)
    got = np.asarray(s(x, ws), np.float32)
    print(f"  s2d equivalence: shapes {ref.shape} vs {got.shape}, "
          f"max|Δ| = {np.abs(ref - got).max():.2e}")
    # output shape differs from input: chain by perturbing the ORIGINAL
    # input with one scalar tap of the output (same 1.5MB add for both
    # variants, so the A/B comparison stays fair)
    chain = lambda c, out: x + out[0, 0, 0, 0].astype(x.dtype) * 1e-3
    print(f"  direct: {timeit_scanned(direct, x, w,  chain=chain)*1e6:8.1f} µs")
    print(f"  s2d:    {timeit_scanned(via_s2d, x, ws, chain=chain)*1e6:8.1f} µs")


if __name__ == "__main__":
    main()
