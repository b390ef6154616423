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

import jax.numpy as jnp
from flax import linen as nn

from ..ops.pooling import max_pool_2x2, max_pool_2x2_with_mask, mask_unpool_2x2
from .layers import PReLU, batch_norm, conv_kernel_init


def _act(use_relu: bool, x: jnp.ndarray, module: nn.Module, name: str) -> jnp.ndarray:
    if use_relu:
        return nn.relu(x)
    return PReLU(name=name)(x)


class InitialBlock(nn.Module):
    conv_features: int = 13

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        conv = nn.Conv(self.conv_features, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), kernel_init=conv_kernel_init)(x)
        conv = batch_norm(train)(conv)
        conv = PReLU()(conv)
        pool = max_pool_2x2(x)
        return jnp.concatenate([conv, pool], axis=-1)


class BottleNeck(nn.Module):
    """One ENet bottleneck (ref:enet.py:33-152). ``variant`` selects the
    middle conv; ``downsampling`` additionally returns the pool mask and
    ``upsampling`` consumes one."""

    output_channels: int
    variant: str = "regular"          # regular | down | up | dilated | asym
    dilation_rate: int = 1
    use_relu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, pool_mask: Optional[jnp.ndarray] = None,
                 train: bool = True):
        in_ch = x.shape[-1]
        out_ch = self.output_channels
        internal = out_ch // 4
        down = self.variant == "down"
        up = self.variant == "up"

        # --- bottleneck branch -------------------------------------------
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
            h = nn.ConvTranspose(internal, (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)),
                                 kernel_init=conv_kernel_init, name="mid_deconv")(h)
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


class Enet(nn.Module):
    """Encoder-decoder ENet (ref:enet.py:234-243); returns (B,H,W,C) logits."""

    num_classes: int
    in_channels: int = 1   # kept for config self-description; inferred from x

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if x.shape[1] % 8 or x.shape[2] % 8:
            raise ValueError(
                f"Enet needs H,W divisible by 8 (3 downsampling stages), got {x.shape[1:3]}")
        # ---------------- encoder (ref:enet.py:167-204, train=False) -------
        h = InitialBlock(name="initial")(x, train)
        h, mask1 = BottleNeck(64, "down", name="bottleneck_1_0")(h, train=train)
        for i in range(4):
            h = BottleNeck(64, "regular", name=f"bottleneck_1_{i+1}")(h, train=train)
        h, mask2 = BottleNeck(128, "down", name="bottleneck_2_0")(h, train=train)
        idx = 1
        for _section in range(2):
            for variant, d in (("regular", 1), ("dilated", 2), ("asym", 1),
                               ("dilated", 4), ("regular", 1), ("dilated", 8),
                               ("asym", 1), ("dilated", 16)):
                h = BottleNeck(128, variant, dilation_rate=d,
                               name=f"bottleneck_2_{idx}")(h, train=train)
                idx += 1

        # ---------------- decoder (ref:enet.py:207-231) --------------------
        h = BottleNeck(64, "up", use_relu=True, name="bottleneck_4_0")(
            h, pool_mask=mask2, train=train)
        h = BottleNeck(64, "regular", use_relu=True, name="bottleneck_4_1")(h, train=train)
        h = BottleNeck(64, "regular", use_relu=True, name="bottleneck_4_2")(h, train=train)
        h = BottleNeck(13 + x.shape[-1], "up", use_relu=True, name="bottleneck_5_0")(
            h, pool_mask=mask1, train=train)
        h = BottleNeck(13 + x.shape[-1], "regular", use_relu=True,
                       name="bottleneck_5_1")(h, train=train)
        logits = nn.ConvTranspose(self.num_classes, (2, 2), strides=(2, 2),
                                  padding="VALID", kernel_init=conv_kernel_init,
                                  name="fullconv")(h)
        return logits
