"""ENet in flax/NHWC — the primary architecture (ref:generalframework/arch/enet.py).

Feature-parity notes vs the reference (which is a 1-channel-input medical ENet):

* InitialBlock: conv(in→13, 3x3, s2, p1) + BN + PReLU, concatenated with a
  2x2 max-pool of the input → 13+in channels (ref:enet.py:8-30).
* BottleNeck variants: regular / downsampling (max-pool with saved argmax) /
  upsampling (unpool at the saved argmax) / dilated(2,4,8,16) / asymmetric
  5x1+1x5; PReLU in the encoder, ReLU in the decoder (ref:enet.py:33-152).
* The reference constructs ``nn.Dropout2d`` but never calls it in ``forward``
  (ref:enet.py:122,127-152) — so no dropout here either.
* Pooling indices: torch's flat-index ``return_indices``/``MaxUnpool2d`` pair
  is replaced by the TPU-native one-hot window mask (dct_tpu.ops.pooling) —
  elementwise, scatter-free, XLA-fuseable.

Downsampling tally for a 256x256 input: initial→128, bottleneck1_0→64,
bottleneck2_0→32; decoder unpools 32→64→128 and a final 2x transposed conv
restores 256. H and W must be divisible by 8.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pooling import max_pool_2x2, max_pool_2x2_with_mask, mask_unpool_2x2
from .layers import PReLU, batch_norm, conv_kernel_init


def _act(use_relu: bool, x: jnp.ndarray, module: nn.Module, name: str) -> jnp.ndarray:
    if use_relu:
        return nn.relu(x)
    return PReLU(name=name)(x)


def space_to_depth_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """(B,2m,2n,C) → (B,m,n,4C); block layout (sy,sx,c) so channel group
    ``sy*2+sx`` holds the original pixel at in-block offset (sy,sx)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


class _S2DConv(nn.Module):
    """conv(C→F, 3x3, stride 2, pad 1) computed as a 2x2 conv over the
    space-to-depth input — exact same math and the SAME (3,3,C,F) kernel
    parameter, but 3.4x faster on-chip at 256x256 (bench_channel.py): the
    direct form runs the MXU at 1-of-128 lane occupancy on C=1 medical
    images; the s2d form quarters the spatial extent and packs the taps
    into channels. The scattered 2x2 kernel is rebuilt from the canonical
    3x3 parameter every call (36*F elements — free next to the conv)."""

    features: int

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        """xs is the ALREADY space-to-depth'd input, (B,m,n,4C)."""
        cin = xs.shape[-1] // 4
        kernel = self.param("kernel", conv_kernel_init,
                            (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        kernel = kernel.astype(xs.dtype)
        # tap (dy,dx) ∈ {-1,0,1}² relative to output pixel (2i,2j) lives at
        # s2d block (i + (dy<0 ? -1 : 0), ...) channel group sy*2+sx where
        # sy = dy mod 2 of the original row — enumerate all 9 taps into a
        # (2,2,4C,F) kernel (7*C of the 16C taps stay zero)
        k = jnp.zeros((2, 2, 4 * cin, self.features), xs.dtype)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                br, sy = (0, dy) if dy >= 0 else (-1, 2 + dy)
                bc, sx = (0, dx) if dx >= 0 else (-1, 2 + dx)
                g = sy * 2 + sx
                k = k.at[br + 1, bc + 1, g * cin:(g + 1) * cin, :].set(
                    kernel[dy + 1, dx + 1])
        out = jax.lax.conv_general_dilated(
            xs, k, (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + bias.astype(xs.dtype)


class _D2SConvTranspose3(nn.Module):
    """ConvTranspose(k=3, s=2, torch pad=1/output_pad=1) as a 2x2 conv +
    depth-to-space — exact same math and the SAME (3,3,C,F) kernel
    parameter as the nn.ConvTranspose(padding=((1,2),(1,2))) it replaces.
    Probe-verified mapping: out[2i+1-ky, 2j+1-kx] += x[i,j]·K[ky,kx], so
    output subposition (sy,sx) reads x blocks (i+{0,1}, j+{0,1}) with the
    9 taps scattered into a (2,2,C,4F) kernel."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        F = self.features
        kernel = self.param("kernel", conv_kernel_init, (3, 3, cin, F))
        bias = self.param("bias", nn.initializers.zeros_init(), (F,))
        K = kernel.astype(x.dtype)
        kk = jnp.zeros((2, 2, cin, 4 * F), x.dtype)

        def sub(sy, sx):
            return slice((sy * 2 + sx) * F, (sy * 2 + sx + 1) * F)

        # sy=0 rows take only ky=1 (block row 0); sy=1 takes ky=0 (row 0)
        # and ky=2 (row 1); mirrored for columns
        kk = kk.at[0, 0, :, sub(0, 0)].set(K[1, 1])
        kk = kk.at[0, 0, :, sub(0, 1)].set(K[1, 0])
        kk = kk.at[0, 1, :, sub(0, 1)].set(K[1, 2])
        kk = kk.at[0, 0, :, sub(1, 0)].set(K[0, 1])
        kk = kk.at[1, 0, :, sub(1, 0)].set(K[2, 1])
        kk = kk.at[0, 0, :, sub(1, 1)].set(K[0, 0])
        kk = kk.at[0, 1, :, sub(1, 1)].set(K[0, 2])
        kk = kk.at[1, 0, :, sub(1, 1)].set(K[2, 0])
        kk = kk.at[1, 1, :, sub(1, 1)].set(K[2, 2])
        y = jax.lax.conv_general_dilated(
            x, kk, (1, 1), [(0, 1), (0, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, m, n, _ = y.shape
        y = y.reshape(b, m, n, 2, 2, F).transpose(0, 1, 3, 2, 4, 5) \
             .reshape(b, 2 * m, 2 * n, F)
        return y + bias.astype(x.dtype)


class InitialBlock(nn.Module):
    conv_features: int = 13
    fast_paths: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if self.fast_paths:
            xs = space_to_depth_2x2(x)
            conv = _S2DConv(self.conv_features, name="Conv_0")(xs)
            # 2x2 max pool == max over the 4 s2d in-block positions
            b, m, n, c4 = xs.shape
            pool = xs.reshape(b, m, n, 4, c4 // 4).max(axis=3)
        else:
            conv = nn.Conv(self.conv_features, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)),
                           kernel_init=conv_kernel_init, name="Conv_0")(x)
            pool = max_pool_2x2(x)
        conv = batch_norm(train)(conv)
        conv = PReLU()(conv)
        return jnp.concatenate([conv, pool], axis=-1)


class BottleNeck(nn.Module):
    """One ENet bottleneck (ref:enet.py:33-152). ``variant`` selects the
    middle conv; ``downsampling`` additionally returns the pool mask and
    ``upsampling`` consumes one."""

    output_channels: int
    variant: str = "regular"          # regular | down | up | dilated | asym
    dilation_rate: int = 1
    use_relu: bool = False
    fast_paths: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, pool_mask: Optional[jnp.ndarray] = None,
                 train: bool = True):
        in_ch = x.shape[-1]
        out_ch = self.output_channels
        internal = out_ch // 4
        down = self.variant == "down"
        up = self.variant == "up"

        # --- bottleneck branch -------------------------------------------
        # (an s2d-matmul rewrite of the down proj_in was measured SLOWER,
        # 175.2 vs 180.3 img/s on the bench config — the strided 2x2 conv
        # already lowers well; negative result recorded in BASELINE.md)
        stride = 2 if down else 1
        h = nn.Conv(internal, (stride, stride), strides=(stride, stride),
                    padding="VALID", use_bias=False,
                    kernel_init=conv_kernel_init, name="proj_in")(x)
        h = batch_norm(train, name="bn_in")(h)
        h = _act(self.use_relu, h, self, "act_in")

        if down:
            h = nn.Conv(internal, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_init=conv_kernel_init, name="mid_conv")(h)
        elif up:
            # torch ConvTranspose2d(k=3, s=2, padding=1, output_padding=1)
            # pads the stride-dilated input (1, 2) per axis; lax's "SAME"
            # would pad (2, 1) — a one-pixel shift (ref:enet.py:98-99)
            if self.fast_paths:
                h = _D2SConvTranspose3(internal, name="mid_deconv")(h)
            else:
                h = nn.ConvTranspose(internal, (3, 3), strides=(2, 2),
                                     padding=((1, 2), (1, 2)),
                                     kernel_init=conv_kernel_init,
                                     name="mid_deconv")(h)
        elif self.variant == "dilated":
            d = self.dilation_rate
            h = nn.Conv(internal, (3, 3), padding=((d, d), (d, d)),
                        kernel_dilation=(d, d), kernel_init=conv_kernel_init,
                        name="mid_conv")(h)
        elif self.variant == "asym":
            h = nn.Conv(internal, (5, 1), padding=((2, 2), (0, 0)), use_bias=False,
                        kernel_init=conv_kernel_init, name="mid_conv_a")(h)
            h = nn.Conv(internal, (1, 5), padding=((0, 0), (2, 2)),
                        kernel_init=conv_kernel_init, name="mid_conv_b")(h)
        else:
            h = nn.Conv(internal, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_init=conv_kernel_init, name="mid_conv")(h)
        h = batch_norm(train, name="bn_mid")(h)
        h = _act(self.use_relu, h, self, "act_mid")

        h = nn.Conv(out_ch, (1, 1), use_bias=False,
                    kernel_init=conv_kernel_init, name="proj_out")(h)
        h = batch_norm(train, name="bn_out")(h)
        h = _act(self.use_relu, h, self, "act_out")

        # --- main branch ---------------------------------------------------
        mask_out = None
        if down:
            main, mask_out = max_pool_2x2_with_mask(x)
            if out_ch != in_ch:   # zero-pad new channels (ref:enet.py:132-140)
                pad = jnp.zeros(main.shape[:-1] + (out_ch - in_ch,), main.dtype)
                main = jnp.concatenate([main, pad], axis=-1)
        elif up:
            assert pool_mask is not None, "upsampling bottleneck needs a pool mask"
            main = nn.Conv(out_ch, (1, 1), use_bias=False,
                           kernel_init=conv_kernel_init, name="unpool_proj")(x)
            main = batch_norm(train, name="bn_unpool")(main)
            main = mask_unpool_2x2(main, pool_mask)
        else:
            main = x

        out = nn.relu(main + h)
        if down:
            return out, mask_out
        return out


class _D2SConvTranspose(nn.Module):
    """ConvTranspose(k=2, s=2, VALID) computed as a 1x1 matmul + depth-to-
    space — exact same math and the SAME (2,2,C,F) kernel parameter as
    flax's nn.ConvTranspose, but it never materializes a stride-dilated
    256x256 conv input (the single most expensive op in the direct ENet
    forward; bench_channel.py). Each output 2x2 block is just
    x[i,j,:] @ K[dy,dx] + bias, so the 2x2/s2 transpose IS a reshape."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param("kernel", conv_kernel_init,
                            (2, 2, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        b, m, n, _ = x.shape
        # lax.conv_transpose applies the kernel spatially FLIPPED relative
        # to the per-output-block matmul view (verified vs nn.ConvTranspose
        # in tests/test_enet_fast_paths.py)
        k = kernel.astype(x.dtype)[::-1, ::-1].transpose(2, 0, 1, 3) \
            .reshape(cin, 4 * self.features)
        y = (x.reshape(-1, cin) @ k).reshape(b, m, n, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * m, 2 * n,
                                                  self.features)
        return y + bias.astype(x.dtype)


class Enet(nn.Module):
    """Encoder-decoder ENet (ref:enet.py:234-243); returns (B,H,W,C) logits.

    ``fast_paths`` (default on) swaps the InitialBlock and the final
    transposed conv for mathematically-exact space-to-depth / depth-to-
    space formulations (same parameter tree, measurably faster on TPU —
    see bench_channel.py and tests/test_enet_fast_paths.py).

    ``remat`` (default off, ``Arch.remat=True`` in configs) wraps every
    bottleneck in ``jax.checkpoint``: activations are recomputed in the
    backward pass instead of stored, trading ~1 extra forward of FLOPs for
    an O(depth) cut in live activation memory. Identical parameter tree,
    outputs, and gradients (tests/test_enet_fast_paths.py::test_remat_
    matches). Intended for large-resolution configs (512²+) where the
    default step's activation footprint is the binding constraint."""

    num_classes: int
    in_channels: int = 1   # kept for config self-description; inferred from x
    fast_paths: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if x.shape[1] % 8 or x.shape[2] % 8:
            raise ValueError(
                f"Enet needs H,W divisible by 8 (3 downsampling stages), got {x.shape[1:3]}")
        # static_argnums=(3,): the ``train`` flag (0 is the module itself)
        Block = (nn.remat(BottleNeck, static_argnums=(3,)) if self.remat
                 else BottleNeck)
        # ---------------- encoder (ref:enet.py:167-204, train=False) -------
        h = InitialBlock(fast_paths=self.fast_paths, name="initial")(x, train)
        h, mask1 = Block(64, "down", name="bottleneck_1_0")(h, None, train)
        for i in range(4):
            h = Block(64, "regular", fast_paths=self.fast_paths, name=f"bottleneck_1_{i+1}")(h, None, train)
        h, mask2 = Block(128, "down", name="bottleneck_2_0")(h, None, train)
        idx = 1
        for _section in range(2):
            for variant, d in (("regular", 1), ("dilated", 2), ("asym", 1),
                               ("dilated", 4), ("regular", 1), ("dilated", 8),
                               ("asym", 1), ("dilated", 16)):
                h = Block(128, variant, dilation_rate=d, fast_paths=self.fast_paths,
                          name=f"bottleneck_2_{idx}")(h, None, train)
                idx += 1

        # ---------------- decoder (ref:enet.py:207-231) --------------------
        h = Block(64, "up", use_relu=True, fast_paths=self.fast_paths, name="bottleneck_4_0")(
            h, mask2, train)
        h = Block(64, "regular", use_relu=True, fast_paths=self.fast_paths, name="bottleneck_4_1")(h, None, train)
        h = Block(64, "regular", use_relu=True, fast_paths=self.fast_paths, name="bottleneck_4_2")(h, None, train)
        h = Block(13 + x.shape[-1], "up", use_relu=True, fast_paths=self.fast_paths, name="bottleneck_5_0")(
            h, mask1, train)
        h = Block(13 + x.shape[-1], "regular", use_relu=True, fast_paths=self.fast_paths,
                  name="bottleneck_5_1")(h, None, train)
        if self.fast_paths:
            logits = _D2SConvTranspose(self.num_classes, name="fullconv")(h)
        else:
            logits = nn.ConvTranspose(self.num_classes, (2, 2), strides=(2, 2),
                                      padding="VALID",
                                      kernel_init=conv_kernel_init,
                                      name="fullconv")(h)
        return logits
