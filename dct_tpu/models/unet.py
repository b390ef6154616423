"""Classic valid-conv UNet / UNet_bn in flax/NHWC
(ref:generalframework/arch/network.py:114-290).

Structure parity: encoder stages of two valid 3x3 convs (+optional BN) + ReLU
with 2x2 ceil-mode max-pool; center with dropout; decoder stages of two valid
3x3 convs + 2x-transposed-conv; skip connections bilinearly resized to the
running feature size; final 1x1 conv bilinearly resized back to the input
size. Resizes use align_corners=True bilinear (torch F.upsample_bilinear
semantics) via ops.resize — exact forward parity, verified by
tests/test_forward_parity.py against weight-converted reference nets.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear_align_corners as _resize_bilinear
from .layers import batch_norm, conv_kernel_init


def _ceil_maxpool(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(2,2, ceil_mode=True): pad bottom/right only."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")


class _DoubleConv(nn.Module):
    features: int
    use_bn: bool = False
    bn_second: bool = True   # UNetDec_bn omits BN on the 2nd conv (ref:network.py:178-182)

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (3, 3), padding="VALID",
                    kernel_init=conv_kernel_init)(x)
        if self.use_bn:
            x = batch_norm(train)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding="VALID",
                    kernel_init=conv_kernel_init)(x)
        if self.use_bn and self.bn_second:
            x = batch_norm(train)(x)
        x = nn.relu(x)
        return x


class _Enc(nn.Module):
    """Decoder-side stage: double conv + 2x transposed conv (ref UNetEnc)."""

    features: int
    out_channels: int
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = _DoubleConv(self.features, self.use_bn)(x, train)
        x = nn.ConvTranspose(self.out_channels, (2, 2), strides=(2, 2),
                             padding="VALID", kernel_init=conv_kernel_init)(x)
        return nn.relu(x)


class UNet(nn.Module):
    """``remat`` (``Arch.remat=True``) wraps each double-conv / decoder
    stage in ``jax.checkpoint`` — same params/outputs/grads, stage
    activations recomputed in the backward pass instead of stored (the
    memory lever for large-resolution training; see models/enet.py)."""

    num_classes: int = 2
    in_channels: int = 1
    use_bn: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        bn = self.use_bn
        # static_argnums=(2,): the ``train`` flag (0 is the module itself)
        _DC = (nn.remat(_DoubleConv, static_argnums=(2,)) if self.remat
               else _DoubleConv)
        _EncB = (nn.remat(_Enc, static_argnums=(2,)) if self.remat else _Enc)
        dec1 = _DC(64, bn, bn_second=not bn, name="dec1")(x, train)
        d1 = _ceil_maxpool(dec1)
        dec2 = _DC(128, bn, bn_second=not bn, name="dec2")(d1, train)
        d2 = _ceil_maxpool(dec2)
        dec3 = _DC(256, bn, bn_second=not bn, name="dec3")(d2, train)
        d3 = _ceil_maxpool(dec3)
        dec4 = _DC(512, bn, bn_second=not bn, name="dec4")(d3, train)
        dec4 = nn.Dropout(0.5, deterministic=not train)(dec4)
        d4 = _ceil_maxpool(dec4)

        center = _DC(1024, bn, name="center")(d4, train)
        center = nn.Dropout(0.5, deterministic=not train)(center)
        center = nn.ConvTranspose(512, (2, 2), strides=(2, 2), padding="VALID",
                                  kernel_init=conv_kernel_init, name="center_up")(center)
        center = nn.relu(center)

        # the reference's skip connections are the POST-pool stage outputs —
        # UNetDec's Sequential ends in the max-pool, and forward feeds dec4/
        # dec3/… (ref:network.py:160-168,226-236) — not the classic pre-pool
        # features (pinned by tests/test_forward_parity.py)
        h = _EncB(512, 256, bn, name="enc4")(
            jnp.concatenate([center, _resize_bilinear(d4, center.shape[1:3])], -1), train)
        h = _EncB(256, 128, bn, name="enc3")(
            jnp.concatenate([h, _resize_bilinear(d3, h.shape[1:3])], -1), train)
        h = _EncB(128, 64, bn, name="enc2")(
            jnp.concatenate([h, _resize_bilinear(d2, h.shape[1:3])], -1), train)
        h = _DC(64, bn, bn_second=not bn, name="enc1")(
            jnp.concatenate([h, _resize_bilinear(d1, h.shape[1:3])], -1), train)
        logits = nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                         name="final")(h)
        return _resize_bilinear(logits, x.shape[1:3])
