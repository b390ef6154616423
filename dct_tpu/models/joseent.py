"""'joseent' alternative ENet (skip-concat unpool path) and CorstemNet,
flax/NHWC. Rebuild of ref:generalframework/arch/joseent/{layers,networks}.py.

Differences from the primary ENet (dct_tpu.models.enet): 16-kernel initial
stage (15 conv + 1 pool channel), residual "bottleneck" blocks with plain
(non-spatial) dropout that IS applied in forward, a dilated third group that
ends by projecting back to 64 channels, and a decoder that CONCATENATES
encoder features after each unpool (ref:networks.py:379-398). Registered as
``jenet`` / ``cnet`` (ref:arch/__init__.py:46-47).

Dropout note: these blocks apply nn.Dropout in forward, so train-mode apply
needs a 'dropout' PRNG (Segmentator.apply_train(dropout_rng=...) — supplied by
the supervised/mean-teacher steps; the co-training step targets the dropout-
free primary ENet).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pooling import max_pool_2x2_with_mask, mask_unpool_2x2
from .layers import PReLU, batch_norm, conv_kernel_init


class ConvBNPReLU(nn.Module):
    features: int
    kernel: tuple = (3, 3)
    stride: int = 1
    padding: tuple = ((1, 1), (1, 1))
    use_bias: bool = True
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.dilation
        padding = self.padding
        if d > 1 and padding == ((1, 1), (1, 1)):
            padding = ((d, d), (d, d))   # torch pads by the dilation (ref:networks.py:94)
        x = nn.Conv(self.features, self.kernel, strides=(self.stride, self.stride),
                    padding=padding, use_bias=self.use_bias,
                    kernel_dilation=(d, d), kernel_init=conv_kernel_init)(x)
        x = batch_norm(train)(x)
        return PReLU()(x)


class _Bottleneck(nn.Module):
    """Shared residual bottleneck: 1x1 proj → middle → 1x1 expand → dropout →
    + input (or 1x1-projected input) → PReLU (ref:networks.py:163-230)."""

    out_dim: int
    projection_factor: int = 4
    dropout: float = 0.1
    middle: str = "3x3"      # 3x3 | asym | dilated
    dilation: int = 1
    residual_conv: str = "auto"   # auto: 1x1 block when in>out; '3x3': plain conv

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_dim = x.shape[-1]
        mid = in_dim // self.projection_factor
        h = ConvBNPReLU(mid, (1, 1), padding="VALID", name="block0")(x, train)
        if self.middle == "asym":
            h = nn.Conv(mid, (5, 1), padding=((2, 2), (0, 0)),
                        kernel_init=conv_kernel_init, name="asym_a")(h)
            h = nn.Conv(mid, (1, 5), padding=((0, 0), (2, 2)),
                        kernel_init=conv_kernel_init, name="asym_b")(h)
            h = batch_norm(train, name="asym_bn")(h)
            h = PReLU(name="asym_act")(h)
        else:
            h = ConvBNPReLU(mid, (3, 3), dilation=self.dilation, name="block1")(h, train)
        h = ConvBNPReLU(self.out_dim, (1, 1), padding="VALID", name="block2")(h, train)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        if self.residual_conv == "3x3":
            res = nn.Conv(self.out_dim, (3, 3), padding=((1, 1), (1, 1)),
                          kernel_init=conv_kernel_init, name="conv_out")(x)
        elif in_dim > self.out_dim:
            res = ConvBNPReLU(self.out_dim, (1, 1), padding="VALID",
                              name="conv_out")(x, train)
        else:
            res = x
        return PReLU(name="act_out")(res + h)


class _BottleneckDown(nn.Module):
    """Downsampling bottleneck with saved pool mask (ref:networks.py:36-88)."""

    out_dim: int
    projection_factor: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_dim = x.shape[-1]
        mid = in_dim // self.projection_factor
        pooled, mask = max_pool_2x2_with_mask(x)
        h = ConvBNPReLU(mid, (2, 2), stride=2, padding="VALID", name="conv0")(x, train)
        h = ConvBNPReLU(mid, (3, 3), name="conv1")(h, train)
        h = ConvBNPReLU(self.out_dim, (1, 1), padding="VALID", name="block2")(h, train)
        h = nn.Dropout(0.01, deterministic=not train)(h)
        pad = jnp.zeros(pooled.shape[:-1] + (self.out_dim - in_dim,), pooled.dtype)
        main = jnp.concatenate([pooled, pad], axis=-1)
        return PReLU(name="act_out")(main + h), mask


class _BottleneckUp(nn.Module):
    """Up-path bottleneck consuming concat(unpool, skip) (ref:networks.py:233-260)."""

    out_dim: int
    projection_factor: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        mid = x.shape[-1] // self.projection_factor
        h = ConvBNPReLU(mid, (3, 3), name="conv0")(x, train)
        h = ConvBNPReLU(mid, (3, 3), name="conv1")(h, train)
        h = ConvBNPReLU(self.out_dim, (1, 1), padding="VALID", name="block2")(h, train)
        return nn.Dropout(0.01, deterministic=not train)(h)


class JEnet(nn.Module):
    """joseent ENet (ref:networks.py:265-398). nk=16 base kernels."""

    num_classes: int = 2
    in_channels: int = 1
    nk: int = 16

    @nn.compact
    def __call__(self, x, train: bool = True):
        nk = self.nk
        conv0 = nn.Conv(nk - x.shape[-1], (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), kernel_init=conv_kernel_init,
                        name="conv0")(x)
        pool0, _ = max_pool_2x2_with_mask(x)
        initial = jnp.concatenate([conv0, pool0], axis=-1)           # nk ch

        h, mask1 = _BottleneckDown(nk * 4, name="bn1_0")(initial, train)
        for i in range(1, 5):
            h = _Bottleneck(nk * 4, dropout=0.01, name=f"bn1_{i}")(h, train)
        bn1_4 = h

        h, mask2 = _BottleneckDown(nk * 8, name="bn2_0")(h, train)
        for grp in (2, 3):
            specs = [("3x3", 1), ("dilated", 2), ("asym", 1), ("dilated", 4),
                     ("3x3", 1), ("dilated", 8), ("asym", 1), ("dilated", 16)]
            start = 1
            for i, (middle, d) in enumerate(specs, start):
                last = grp == 3 and i == 8
                h = _Bottleneck(nk * 4 if last else nk * 8,
                                middle="dilated" if middle == "dilated" else middle,
                                dilation=d, dropout=0.01 if middle == "dilated" else 0.1,
                                residual_conv="3x3" if last else "auto",
                                name=f"bn{grp}_{i}")(h, train)

        # decoder: unpool + skip-concat (ref:networks.py:379-398)
        up0 = mask_unpool_2x2(h, mask2)                               # nk*4 ch
        b = _BottleneckUp(nk * 4, name="up1_0")(
            jnp.concatenate([up0, bn1_4], axis=-1), train)
        h = PReLU(name="up1_act")(up0 + b)
        h = _Bottleneck(nk * 4, dropout=0.1, name="up1_1")(h, train)
        h = _Bottleneck(nk, dropout=0.1, name="up1_2")(h, train)

        up1 = mask_unpool_2x2(h, mask1)                               # nk ch
        b = _BottleneckUp(nk, name="up2_1")(
            jnp.concatenate([up1, initial], axis=-1), train)
        b = _Bottleneck(nk, dropout=0.1, name="up2_2")(b, train)
        h = PReLU(name="up2_act")(up1 + b)

        # final 2x nearest-upsample + two conv-bn-prelu (ref:layers.py:20-25)
        h = jax.image.resize(h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2,
                                 h.shape[-1]), "nearest")
        h = ConvBNPReLU(nk, (3, 3), use_bias=False, name="deconv3_a")(h, train)
        h = ConvBNPReLU(nk, (3, 3), use_bias=False, name="deconv3_b")(h, train)
        return nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                       name="final")(h)


class _ConvResidualConv(nn.Module):
    """conv → (conv,conv,conv+BN) residual → conv (ref:networks.py:404-419)."""

    features: int
    negative_slope: float = 0.2   # encoder LeakyReLU(0.2); decoder ReLU (0.0)

    @nn.compact
    def __call__(self, x, train: bool = True):
        def act(v):
            return nn.leaky_relu(v, self.negative_slope) if self.negative_slope \
                else nn.relu(v)

        def conv_bn(v, name):
            v = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_init=conv_kernel_init, name=name)(v)
            return batch_norm(train, name=name + "_bn")(v)

        c1 = act(conv_bn(x, "conv1"))
        h = act(conv_bn(c1, "conv2a"))
        h = act(conv_bn(h, "conv2b"))
        h = conv_bn(h, "conv2c")            # no act (ref:layers.py:67-74)
        res = c1 + h
        return act(conv_bn(res, "conv3"))


class CorstemNet(nn.Module):
    """Residual conv UNet-like net (ref:networks.py:421-493)."""

    num_classes: int = 2
    in_channels: int = 1
    ngf: int = 32

    @nn.compact
    def __call__(self, x, train: bool = True):
        g = self.ngf
        d1 = _ConvResidualConv(g, 0.2, name="down_1")(x, train)
        d2 = _ConvResidualConv(g * 2, 0.2, name="down_2")(
            nn.max_pool(d1, (2, 2), strides=(2, 2)), train)
        d3 = _ConvResidualConv(g * 4, 0.2, name="down_3")(
            nn.max_pool(d2, (2, 2), strides=(2, 2)), train)
        d4 = _ConvResidualConv(g * 8, 0.2, name="down_4")(
            nn.max_pool(d3, (2, 2), strides=(2, 2)), train)
        bridge = _ConvResidualConv(g * 16, 0.2, name="bridge")(
            nn.max_pool(d4, (2, 2), strides=(2, 2)), train)

        def deconv(v, feats, name):
            v = nn.ConvTranspose(feats, (3, 3), strides=(2, 2), padding="SAME",
                                 kernel_init=conv_kernel_init, name=name)(v)
            v = batch_norm(train, name=name + "_bn")(v)
            return nn.relu(v)

        h = _ConvResidualConv(g * 8, 0.0, name="up_1")(
            (deconv(bridge, g * 8, "deconv_1") + d4) / 2, train)
        h = _ConvResidualConv(g * 4, 0.0, name="up_2")(
            (deconv(h, g * 4, "deconv_2") + d3) / 2, train)
        h = _ConvResidualConv(g * 2, 0.0, name="up_3")(
            (deconv(h, g * 2, "deconv_3") + d2) / 2, train)
        h = _ConvResidualConv(g, 0.0, name="up_4")(
            (deconv(h, g, "deconv_4") + d1) / 2, train)
        return nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                       kernel_init=conv_kernel_init, name="out")(h)
