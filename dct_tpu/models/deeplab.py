"""DeepLab family (V2 / V3 / V3+ on a dilated ResNet-101) + MSC wrapper,
flax/NHWC. Rebuild of ref:generalframework/arch/deeplab/{resnet,deeplabv2,
deeplabv3,deeplabv3plus,msc}.py.

Parity notes:
* BN uses the reference's eps=1e-5, momentum=0.999 (torch) → flax momentum
  0.001 (ref:resnet.py:40-44) — effectively frozen stats, matching the COCO
  -init fine-tuning recipe the reference uses (trainer_city freezes BN).
* ASPP-v2 sums 4 parallel dilated class-score convs (ref:deeplabv2.py:17-45);
  ASPP-v3 concatenates 1x1 + dilated 3x3 branches + a global image pool
  (ref:deeplabv3.py:17-47).
* MSC runs the net at scales {1, 0.5, 0.75}, pixelwise-maxes the upsampled
  logits, and in train mode returns [full, *pyramid, max] (ref:msc.py:13-41).
* Pretrained ResNet-101/COCO weights are not downloadable in this
  environment; weights load via the checkpoint format instead
  (ref:trainer_city.py:56-66 does the torch equivalent).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import conv_kernel_init


def _resize(x: jnp.ndarray, hw) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]), "bilinear")


class ConvBNReLU(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        p = self.padding
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, kernel_init=conv_kernel_init)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.001,
                         epsilon=1e-5)(x)
        return nn.relu(x) if self.relu else x


class Bottleneck(nn.Module):
    mid: int
    out: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h = ConvBNReLU(self.mid, 1, self.stride, 0, 1, name="reduce")(x, train)
        h = ConvBNReLU(self.mid, 3, 1, self.dilation, self.dilation,
                       name="conv3x3")(h, train)
        h = ConvBNReLU(self.out, 1, 1, 0, 1, relu=False, name="increase")(h, train)
        if self.downsample:
            x = ConvBNReLU(self.out, 1, self.stride, 0, 1, relu=False,
                           name="proj")(x, train)
        return nn.relu(h + x)


class ResBlock(nn.Module):
    n_layers: int
    mid: int
    out: int
    stride: int
    dilation: int
    mg: Sequence[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        mg = self.mg if self.mg is not None else [1] * self.n_layers
        assert len(mg) == self.n_layers
        x = Bottleneck(self.mid, self.out, self.stride, self.dilation * mg[0],
                       downsample=True, name="block1")(x, train)
        for i, g in zip(range(2, self.n_layers + 1), mg[1:]):
            x = Bottleneck(self.mid, self.out, 1, self.dilation * g,
                           name=f"block{i}")(x, train)
        return x


def _stem_pool(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool2d(3, 2, pad 1, ceil_mode=True) (ref:deeplabv2.py:60)."""
    h, w = x.shape[1], x.shape[2]
    eh = 1 if (h + 2 - 3) % 2 else 0
    ew = 1 if (w + 2 - 3) % 2 else 0
    x = jnp.pad(x, ((0, 0), (1, 1 + eh), (1, 1 + ew), (0, 0)),
                constant_values=-jnp.inf)
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


class _ResNetTrunk(nn.Module):
    n_blocks: Sequence[int]
    strides: Sequence[int]
    dilations: Sequence[int]
    grids: Sequence[int] = None

    @nn.compact
    def __call__(self, x, train: bool = True, return_low=False):
        h = ConvBNReLU(64, 7, 2, 3, 1, name="layer1_conv1")(x, train)
        h = _stem_pool(h)
        h = ResBlock(self.n_blocks[0], 64, 256, self.strides[0],
                     self.dilations[0], name="layer2")(h, train)
        low = h
        h = ResBlock(self.n_blocks[1], 128, 512, self.strides[1],
                     self.dilations[1], name="layer3")(h, train)
        h = ResBlock(self.n_blocks[2], 256, 1024, self.strides[2],
                     self.dilations[2], name="layer4")(h, train)
        h = ResBlock(self.n_blocks[3], 512, 2048, self.strides[3],
                     self.dilations[3], mg=self.grids, name="layer5")(h, train)
        return (h, low) if return_low else h


class ASPPv2(nn.Module):
    """Sum of parallel dilated class-score convs (ref:deeplabv2.py:17-45)."""

    num_classes: int
    pyramids: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = 0
        for i, d in enumerate(self.pyramids):
            out = out + nn.Conv(
                self.num_classes, (3, 3), padding=((d, d), (d, d)),
                kernel_dilation=(d, d),
                kernel_init=nn.initializers.normal(0.01),
                name=f"c{i}")(x)
        return out


class ASPPv3(nn.Module):
    """1x1 + dilated 3x3 branches + image pool, concatenated
    (ref:deeplabv3.py:17-47)."""

    out_channels: int
    pyramids: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        pool = jnp.mean(x, axis=(1, 2), keepdims=True)
        pool = ConvBNReLU(self.out_channels, 1, 1, 0, 1, name="imagepool")(pool, train)
        pool = jnp.broadcast_to(pool, (x.shape[0], x.shape[1], x.shape[2],
                                       self.out_channels))
        branches = [pool,
                    ConvBNReLU(self.out_channels, 1, 1, 0, 1, name="c0")(x, train)]
        for i, d in enumerate(self.pyramids):
            branches.append(ConvBNReLU(self.out_channels, 3, 1, d, d,
                                       name=f"c{i + 1}")(x, train))
        return jnp.concatenate(branches, axis=-1)


class DeepLabV2(nn.Module):
    num_classes: int
    n_blocks: Sequence[int] = (3, 4, 23, 3)
    pyramids: Sequence[int] = (6, 12, 18, 24)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h = _ResNetTrunk(self.n_blocks, (1, 2, 1, 1), (1, 1, 2, 4),
                         name="trunk")(x, train)
        return ASPPv2(self.num_classes, self.pyramids, name="aspp")(h)


def _os_config(output_stride: int):
    if output_stride == 8:
        return (1, 2, 1, 1), (1, 1, 2, 2)
    if output_stride == 16:
        return (1, 2, 2, 1), (1, 1, 1, 2)
    raise NotImplementedError(output_stride)


class DeepLabV3(nn.Module):
    num_classes: int
    n_blocks: Sequence[int] = (3, 4, 23, 3)
    pyramids: Sequence[int] = (6, 12, 18)
    grids: Sequence[int] = (1, 2, 4)
    output_stride: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        strides, dils = _os_config(self.output_stride)
        h = _ResNetTrunk(self.n_blocks, strides, dils, self.grids,
                         name="trunk")(x, train)
        h = ASPPv3(256, self.pyramids, name="aspp")(h, train)
        h = ConvBNReLU(256, 1, 1, 0, 1, name="fc1")(h, train)
        h = nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                    name="fc2")(h)
        return _resize(h, x.shape[1:3])


class DeepLabV3Plus(nn.Module):
    num_classes: int
    n_blocks: Sequence[int] = (3, 4, 23, 3)
    pyramids: Sequence[int] = (6, 12, 18)
    grids: Sequence[int] = (1, 2, 4)
    output_stride: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        strides, dils = _os_config(self.output_stride)
        h, low = _ResNetTrunk(self.n_blocks, strides, dils, self.grids,
                              name="trunk")(x, train, return_low=True)
        low = ConvBNReLU(48, 1, 1, 0, 1, name="reduce")(low, train)
        h = ASPPv3(256, self.pyramids, name="aspp")(h, train)
        h = ConvBNReLU(256, 1, 1, 0, 1, name="fc1")(h, train)
        h = _resize(h, low.shape[1:3])
        h = jnp.concatenate([h, low], axis=-1)
        h = ConvBNReLU(256, 3, 1, 1, 1, name="fc2_conv1")(h, train)
        h = ConvBNReLU(256, 3, 1, 1, 1, name="fc2_conv2")(h, train)
        h = nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                    name="fc2_conv3")(h)
        return _resize(h, x.shape[1:3])


class MSC(nn.Module):
    """Multi-scale wrapper: pixelwise max over {1, 0.5, 0.75} logits
    (ref:msc.py:13-41). Train mode returns [full, *pyramid, max]."""

    scale: nn.Module
    pyramids: Sequence[float] = (0.5, 0.75)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        logits = self.scale(x, train)
        out_hw = logits.shape[1:3]
        logits_pyramid = []
        for p in self.pyramids:
            hw = (int(x.shape[1] * p), int(x.shape[2] * p))
            logits_pyramid.append(self.scale(_resize(x, hw), train))
        logits_all = [logits] + [_resize(l, out_hw) for l in logits_pyramid]
        logits_max = jnp.max(jnp.stack(logits_all), axis=0)
        if train:
            return [logits] + logits_pyramid + [logits_max]
        return logits_max


def DeepLabV2_ResNet101_MSC(num_classes: int, **kw) -> MSC:
    return MSC(scale=DeepLabV2(num_classes=num_classes,
                               pyramids=(6, 12, 18, 24), **kw))


def DeepLabV3_ResNet101_MSC(num_classes: int, output_stride: int = 16, **kw) -> MSC:
    pyramids = (6, 12, 18) if output_stride == 16 else (12, 24, 36)
    return MSC(scale=DeepLabV3(num_classes=num_classes, pyramids=pyramids,
                               output_stride=output_stride, **kw))


def DeepLabV3Plus_ResNet101_MSC(num_classes: int, output_stride: int = 16, **kw) -> MSC:
    pyramids = (6, 12, 18) if output_stride == 16 else (12, 24, 36)
    return MSC(scale=DeepLabV3Plus(num_classes=num_classes, pyramids=pyramids,
                                   output_stride=output_stride, **kw))
