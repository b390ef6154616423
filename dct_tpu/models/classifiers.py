"""Small classifier heads: vgg_11 / resnet_18 with input-channel + head
surgery (rebuild of ref:generalframework/arch/pretrain_torchvision.py:5-31,
used for the reference's non-segmentation side experiments).

No pretrained weights are downloadable here; architectures match so converted
torch weights load via the checkpoint format.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import conv_kernel_init

VGG11_CFG = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"]


class VGG11(nn.Module):
    num_classes: int = 2
    in_channels: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        for v in VGG11_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=((1, 1), (1, 1)),
                            kernel_init=conv_kernel_init)(x)
                x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))            # adaptive pool → (B, 512)
        x = nn.Dense(4096)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(4096)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    kernel_init=conv_kernel_init)(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=conv_kernel_init)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, kernel_init=conv_kernel_init)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(h + x)


class ResNet18(nn.Module):
    num_classes: int = 2
    in_channels: int = 1
    stage_sizes: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=conv_kernel_init)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (n, feats) in enumerate(zip(self.stage_sizes, (64, 128, 256, 512))):
            for b in range(n):
                stride = 2 if (i > 0 and b == 0) else 1
                x = _BasicBlock(feats, stride)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)
