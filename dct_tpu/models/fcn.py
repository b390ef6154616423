"""FCN-8s/16s/32s heads on the VGG16 backbone
(ref:generalframework/arch/network.py:9-112), flax/NHWC.

Spatial-shape note: the reference applies a VALID 7x7 ``fconn`` conv on the
1/32 feature map and bilinearly realigns score maps — reproduced exactly, so
inputs must be ≥ 224px on each side (same constraint as the torch code).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .backbones import VGG16Features
from .layers import conv_kernel_init


def _resize(x: jnp.ndarray, hw) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]), "bilinear")


class _FConn(nn.Module):
    """VALID 7x7 4096-conv + 1x1 4096-conv with dropout (ref:network.py:25-32)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = nn.Conv(4096, (7, 7), padding="VALID", kernel_init=conv_kernel_init)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Conv(4096, (1, 1), kernel_init=conv_kernel_init)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return x


class FCN(nn.Module):
    num_classes: int
    skips: int = 2        # 2 → FCN8, 1 → FCN16, 0 → FCN32
    in_channels: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        feats = VGG16Features(name="vgg")(x)
        feat3, feat4, feat5 = feats[2], feats[3], feats[4]
        pooled5 = nn.max_pool(feat5, (2, 2), strides=(2, 2))
        fconn = _FConn(name="fconn")(pooled5, train)
        score = nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                        name="score_fconn")(fconn)
        if self.skips >= 1:
            s4 = nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                         name="score_feat4")(feat4)
            score = _resize(score, s4.shape[1:3]) + s4
        if self.skips >= 2:
            s3 = nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                         name="score_feat3")(feat3)
            score = _resize(score, s3.shape[1:3]) + s3
        return _resize(score, x.shape[1:3])


def FCN8(num_classes: int, **kw) -> FCN:
    return FCN(num_classes=num_classes, skips=2, **kw)


def FCN16(num_classes: int, **kw) -> FCN:
    return FCN(num_classes=num_classes, skips=1, **kw)


def FCN32(num_classes: int, **kw) -> FCN:
    return FCN(num_classes=num_classes, skips=0, **kw)
