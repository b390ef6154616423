"""Architecture registry (ref:generalframework/arch/__init__.py:39-81).

String → flax module constructor. All 14 reference registry entries
(ref:arch/__init__.py:39-53) are present, plus ``pspnet`` (the reference
ships the class as dead code and never registers it — see models/pspnet.py).
``get_arch`` returns a *module definition*; parameters are
created by ``Segmentator`` (init is where the reference applies weights_init —
here init parity is baked into each module's kernel/scale initializers).
"""
from __future__ import annotations

from typing import Any, Dict

from flax import linen as nn

from .deeplab import DeepLabV2, DeepLabV3, DeepLabV3Plus
from .enet import Enet
from .joseent import CorstemNet, JEnet
from .fcn import FCN8, FCN16, FCN32
from .pspnet import PSPNet
from .segnet import SegNet
from .unet import UNet

ARCH_CALLABLES: Dict[str, Any] = {}


def _register_arch(name: str, callable_, alias=None) -> None:
    if name in ARCH_CALLABLES:
        raise ValueError(f"{name} already exists!")
    ARCH_CALLABLES[name] = callable_
    if alias:
        for other in ([alias] if isinstance(alias, str) else alias):
            if other in ARCH_CALLABLES:
                raise ValueError(f"alias {other} for {name} already exists!")
            ARCH_CALLABLES[other] = callable_


_register_arch("enet", Enet)
_register_arch("unet", lambda **kw: UNet(use_bn=False, **kw))
_register_arch("unet_bn", lambda **kw: UNet(use_bn=True, **kw))
_register_arch("fcn8", FCN8)
_register_arch("fcn16", FCN16)
_register_arch("fcn32", FCN32)
_register_arch("segnet", SegNet)
_register_arch("pspnet", PSPNet)
_register_arch("deeplabv2", DeepLabV2)
_register_arch("deeplabv3", DeepLabV3)
_register_arch("deeplabv3plus", DeepLabV3Plus)
_register_arch("jenet", JEnet)
_register_arch("cnet", CorstemNet)
# reference's 3-channel Cityscapes ENet (ref:arch/__init__.py:51,
# arch/deeplab/enet.py) — the TPU Enet is channel-parametric, so the
# registry entry just pins the RGB default
_register_arch("deeplabenet", lambda **kw: Enet(**{"in_channels": 3, **kw}))
from .classifiers import ResNet18, VGG11  # noqa: E402
_register_arch("vgg11", VGG11)
_register_arch("resnet18", ResNet18)


# Per-arch BatchNorm momentum (flax convention: new = m*old + (1-m)*batch).
# Used by the fused labeled+unlabeled co-train forward (train/steps.py) to
# compose two sequential running-stat updates exactly from one two-group
# apply: r2 = m*ra_lab + ra_unlab - m*r0. Only valid when every BN layer in
# the arch shares one momentum — true for each entry below; archs without BN
# carry an empty batch_stats tree, so the value is unused there.
BN_MOMENTUM: Dict[str, float] = {
    "enet": 0.9, "unet": 0.9, "unet_bn": 0.9,           # layers.batch_norm
    "segnet": 0.9, "jenet": 0.9, "cnet": 0.9,
    "deeplabenet": 0.9,
    "fcn8": 0.9, "fcn16": 0.9, "fcn32": 0.9,            # no BN (empty tree)
    "pspnet": 0.9,                                      # no BN (empty tree)
    "deeplabv2": 0.001, "deeplabv3": 0.001, "deeplabv3plus": 0.001,
    "vgg11": 0.99, "resnet18": 0.99,                    # flax default
}


def get_arch(arch: str, kwargs: Dict[str, Any]) -> nn.Module:
    """Build a module definition from a config dict (ref:arch/__init__.py:68-81)."""
    kwargs = {k: v for k, v in kwargs.items() if k != "arch"}
    ctor = ARCH_CALLABLES.get(arch)
    assert ctor, f"Architecture {arch} is not found! Available: {sorted(ARCH_CALLABLES)}"
    return ctor(**kwargs)


from .segmentator import Segmentator, SegState, stack_states, unstack_states  # noqa: E402,F401

# the reference exports a byte-duplicate 'Model' alongside Segmentator
# (ref:generalframework/models/general.py:17-116); alias for API parity
Model = Segmentator
