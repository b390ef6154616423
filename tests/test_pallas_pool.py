"""Pallas pooling kernels ≡ the lax formulation (interpreter mode on CPU)."""
import jax
import numpy as np

from dct_tpu.ops.pallas_pool import (
    mask_unpool_2x2_pallas,
    max_pool_2x2_with_mask_pallas,
)
from dct_tpu.ops.pooling import mask_unpool_2x2, max_pool_2x2_with_mask


def test_pool_mask_equivalence(rng):
    x = jax.random.normal(rng, (2, 32, 32, 8))
    p_ref, m_ref = max_pool_2x2_with_mask(x)
    p_pl, m_pl = max_pool_2x2_with_mask_pallas(x)
    assert np.allclose(np.asarray(p_pl), np.asarray(p_ref))
    assert np.allclose(np.asarray(m_pl), np.asarray(m_ref))


def test_unpool_equivalence(rng):
    x = jax.random.normal(rng, (2, 16, 16, 4))
    p, m = max_pool_2x2_with_mask(x)
    y = jax.random.normal(jax.random.fold_in(rng, 1), p.shape)
    assert np.allclose(np.asarray(mask_unpool_2x2_pallas(y, m)),
                       np.asarray(mask_unpool_2x2(y, m)))


def test_odd_blockrows(rng):
    # H/2 = 6 not divisible by default block 16 → falls back to divisor
    x = jax.random.normal(rng, (1, 12, 12, 3))
    p_ref, m_ref = max_pool_2x2_with_mask(x)
    p_pl, m_pl = max_pool_2x2_with_mask_pallas(x)
    assert np.allclose(np.asarray(p_pl), np.asarray(p_ref))
    assert np.allclose(np.asarray(m_pl), np.asarray(m_ref))
