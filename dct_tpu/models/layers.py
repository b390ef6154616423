"""Shared flax building blocks (init parity with ref:generalframework/arch/__init__.py:60-65)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# weights_init parity: xavier_normal conv kernels, N(1, 0.02) BN scales, zero BN bias
conv_kernel_init = nn.initializers.xavier_normal()


def bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class PReLU(nn.Module):
    """Per-channel PReLU, init 0.25 (torch nn.PReLU(C) default)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha",
                           lambda k, s: jnp.full(s, 0.25, jnp.float32),
                           (x.shape[-1],))
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


def batch_norm(train: bool, name: str | None = None) -> nn.BatchNorm:
    """torch BatchNorm2d(eps=1e-3, momentum=0.1) ≡ flax momentum 0.9
    (ref:generalframework/arch/enet.py:22,83)."""
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-3, scale_init=bn_scale_init, name=name)
