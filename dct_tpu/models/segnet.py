"""SegNet (bilinear-upsample variant) on the VGG16 backbone
(ref:generalframework/arch/network.py:293-365), flax/NHWC.

The reference's comment notes it is "not the right implementation of using
index of maxpooling" — it upsamples bilinearly and concatenates encoder
features; reproduced as-is (the true max-unpool machinery exists in
dct_tpu.ops.pooling if a faithful-SegNet variant is ever wanted).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .backbones import VGG16Features
from .layers import batch_norm, conv_kernel_init


def _up2x(x: jnp.ndarray) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2,
                                x.shape[-1]), "bilinear")


class SegNetEnc(nn.Module):
    out_channels: int
    num_layers: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        half = x.shape[-1] // 2
        x = _up2x(x)
        x = nn.Conv(half, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=conv_kernel_init)(x)
        x = nn.relu(batch_norm(train)(x))
        for _ in range(self.num_layers):
            x = nn.Conv(half, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_init=conv_kernel_init)(x)
            x = nn.relu(batch_norm(train)(x))
        x = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=conv_kernel_init)(x)
        return nn.relu(batch_norm(train)(x))


class SegNet(nn.Module):
    num_classes: int
    in_channels: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        d1, d2, d3, d4, d5 = VGG16Features(name="vgg")(x)
        # torch slicing pools INSIDE each dec block (ref:network.py:329-333):
        # dec_k output is after the k-th pool.
        d1p = nn.max_pool(d1, (2, 2), strides=(2, 2))
        d2p = nn.max_pool(d2, (2, 2), strides=(2, 2))
        d3p = nn.max_pool(d3, (2, 2), strides=(2, 2))
        d4p = nn.max_pool(d4, (2, 2), strides=(2, 2))
        d5p = nn.max_pool(d5, (2, 2), strides=(2, 2))
        # VGG stages already consume the pools for stages 2..5, so map:
        # dec1=pool(s1), dec2=pool(s2), ..., dec5=pool(s5)
        e5 = SegNetEnc(512, 1, name="enc5")(d5p, train)
        e4 = SegNetEnc(256, 1, name="enc4")(jnp.concatenate([d4p, e5], -1), train)
        e3 = SegNetEnc(128, 1, name="enc3")(jnp.concatenate([d3p, e4], -1), train)
        e2 = SegNetEnc(64, 0, name="enc2")(jnp.concatenate([d2p, e3], -1), train)
        e1 = _up2x(jnp.concatenate([d1p, e2], -1))
        e1 = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)),
                     kernel_init=conv_kernel_init, name="enc1_conv")(e1)
        e1 = nn.relu(batch_norm(train, name="enc1_bn")(e1))
        logits = nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                         kernel_init=conv_kernel_init, name="final")(e1)
        return jax.image.resize(logits, (x.shape[0], x.shape[1], x.shape[2],
                                         self.num_classes), "bilinear")
