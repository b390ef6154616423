"""VGG16 feature backbone in flax/NHWC.

The reference's FCN/SegNet/PSP heads sit on torchvision's ImageNet-pretrained
VGG16 features (ref:generalframework/arch/network.py:14,62,328). This
environment has no torchvision and zero egress, so the backbone is randomly
initialized; pretrained weights can be loaded post-hoc through the
self-describing checkpoint format (a converted torch state maps 1:1 onto
these stage names).

Stage split mirrors the torch ``features.children()`` slicing used by FCN8
(ref:network.py:16-19): stage outputs after each pool — 64, 128, 256, 512,
512 channels.
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
from flax import linen as nn

from .layers import conv_kernel_init

# VGG16 config: (convs per stage, channels)
VGG16_STAGES = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]


class VGGStage(nn.Module):
    n_convs: int
    features: int
    pool_first: bool = False   # stages 2..5 start with the previous pool

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.pool_first:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i in range(self.n_convs):
            x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_init=conv_kernel_init, name=f"conv{i}")(x)
            x = nn.relu(x)
        return x


class VGG16Features(nn.Module):
    """Returns the five stage outputs (before each subsequent pool)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        outs = []
        for s, (n, c) in enumerate(VGG16_STAGES):
            x = VGGStage(n, c, pool_first=(s > 0), name=f"stage{s + 1}")(x)
            outs.append(x)
        return outs
