"""dct_tpu — a TPU-native (JAX/XLA/Pallas) deep co-training framework for
semi-supervised image segmentation.

Re-designed from scratch with the capabilities of
``jizongFox/Deep-Co-Training-for-Semi-Supervised-Image-Segmentation``
(reference mounted at /root/reference; cited below as ``ref:<path>:<line>``).

The reference is a single-GPU PyTorch research framework; this package is a
TPU-first rebuild: flax models in NHWC, one fused jitted train step per
trainer (K co-trained models vmapped inside a single step), device-resident
datasets, on-device augmentation driven by explicit PRNG keys, and a
``jax.sharding.Mesh`` data-parallel path.

Public surface mirrors the reference's layer map (ref:generalframework/__init__.py):
  * ``dct_tpu.config``     — YAML + dotted-CLI config system
  * ``dct_tpu.data``       — datasets, patient samplers, semi-supervised splits
  * ``dct_tpu.models``     — arch registry (enet/unet/...)
  * ``dct_tpu.losses``     — CE2d / JSD / KL / Entropy / Dice
  * ``dct_tpu.adversarial``— FGSM / VAT generators (pure jax.grad)
  * ``dct_tpu.schedules``  — loss-weight ramps + LR schedules
  * ``dct_tpu.metrics``    — dice meters, IoU, kappa diversity
  * ``dct_tpu.train``      — Trainer / CoTrainer / MeanTeacherTrainer / VatTrainer
  * ``dct_tpu.parallel``   — mesh + sharding helpers
"""
from enum import Enum

__version__ = "0.1.0"


class ModelMode(Enum):
    """Mode shared by datasets and models (ref:generalframework/__init__.py:12-30)."""

    TRAIN = "TRAIN"
    EVAL = "EVAL"
    PRED = "PRED"

    @staticmethod
    def from_str(mode_str: str) -> "ModelMode":
        if mode_str.lower() in ("train", "training"):
            return ModelMode.TRAIN
        if mode_str.lower() in ("eval", "testing", "val", "test"):
            return ModelMode.EVAL
        if mode_str.lower() in ("predict", "pred"):
            return ModelMode.PRED
        raise ValueError(f"unknown mode {mode_str!r}")
