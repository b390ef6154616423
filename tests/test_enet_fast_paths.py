"""ENet fast paths (s2d InitialBlock, d2s fullconv) are EXACT rewrites.

The fast formulations (models/enet.py:_S2DConv/_D2SConvTranspose) keep the
parameter tree byte-identical to the direct flax modules and only change the
compute schedule — so one set of params must produce the same logits through
both paths, and checkpoints/converted torch weights stay valid either way.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from dct_tpu.models.enet import (Enet, InitialBlock, _D2SConvTranspose,
                                 space_to_depth_2x2)


def test_param_trees_identical():
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    va = Enet(num_classes=4, fast_paths=False).init(jax.random.PRNGKey(0), x)
    vb = Enet(num_classes=4, fast_paths=True).init(jax.random.PRNGKey(0), x)
    la = jax.tree_util.tree_structure(va)
    lb = jax.tree_util.tree_structure(vb)
    assert la == lb
    for a, b in zip(jax.tree_util.tree_leaves(va), jax.tree_util.tree_leaves(vb)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_initial_block_equivalent():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3), jnp.float32)
    slow = InitialBlock(fast_paths=False)
    fast = InitialBlock(fast_paths=True)
    v = slow.init(jax.random.PRNGKey(1), x, train=False)
    out_a = slow.apply(v, x, train=False)
    out_b = fast.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=2e-6)


def test_d2s_fullconv_equivalent():
    cin, F = 14, 4
    x = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, cin), jnp.float32)
    ref_mod = nn.ConvTranspose(F, (2, 2), strides=(2, 2), padding="VALID")
    v = ref_mod.init(jax.random.PRNGKey(2), x)
    ref = ref_mod.apply(v, x)
    got = _D2SConvTranspose(F).apply(v, x)
    assert got.shape == ref.shape == (2, 16, 16, F)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-6)


def test_d2s_mid_deconv_equivalent():
    from dct_tpu.models.enet import _D2SConvTranspose3
    cin, F = 16, 16
    x = jnp.asarray(np.random.RandomState(3).rand(2, 8, 8, cin), jnp.float32)
    ref_mod = nn.ConvTranspose(F, (3, 3), strides=(2, 2),
                               padding=((1, 2), (1, 2)))
    v = ref_mod.init(jax.random.PRNGKey(4), x)
    ref = ref_mod.apply(v, x)
    got = _D2SConvTranspose3(F).apply(v, x)
    assert got.shape == ref.shape == (2, 16, 16, F)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               atol=2e-6)


def test_s2d_layout():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    s = space_to_depth_2x2(x)
    assert s.shape == (1, 2, 2, 4)
    # block (0,0) holds pixels (0,0),(0,1),(1,0),(1,1) in (sy,sx) order
    np.testing.assert_array_equal(np.asarray(s[0, 0, 0]), [0, 1, 4, 5])
    np.testing.assert_array_equal(np.asarray(s[0, 1, 1]), [10, 11, 14, 15])


@pytest.mark.parametrize("train", [False, True])
def test_full_enet_logits_equivalent(train):
    x = jnp.asarray(np.random.RandomState(2).rand(2, 32, 32, 1), jnp.float32)
    slow = Enet(num_classes=4, fast_paths=False)
    fast = Enet(num_classes=4, fast_paths=True)
    v = slow.init(jax.random.PRNGKey(3), x, train=True)
    if train:
        out_a, mut_a = slow.apply(v, x, train=True, mutable=["batch_stats"])
        out_b, mut_b = fast.apply(v, x, train=True, mutable=["batch_stats"])
        for a, b in zip(jax.tree_util.tree_leaves(mut_a),
                        jax.tree_util.tree_leaves(mut_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
    else:
        out_a = slow.apply(v, x, train=False)
        out_b = fast.apply(v, x, train=False)
    # train mode accumulates an extra BN round-trip of reassociation noise
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=5e-4 if train else 1e-4)


def test_remat_matches():
    """Arch.remat=True (jax.checkpoint on every bottleneck) must be
    invisible semantically: same param tree, same train-mode logits and
    batch_stats, same parameter gradients — only the backward-pass
    activation schedule changes."""
    x = jnp.asarray(np.random.RandomState(3).rand(2, 16, 16, 1), jnp.float32)
    gt = jnp.asarray(np.random.RandomState(4).randint(0, 4, (2, 16, 16)))
    plain = Enet(num_classes=4)
    remat = Enet(num_classes=4, remat=True)
    v = plain.init(jax.random.PRNGKey(5), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(remat.init(jax.random.PRNGKey(5), x)))

    def loss(mod, params):
        logits, upd = mod.apply({"params": params,
                                 "batch_stats": v["batch_stats"]},
                                x, train=True, mutable=["batch_stats"])
        one_hot = jax.nn.one_hot(gt, 4)
        return -jnp.mean(jnp.sum(one_hot * jax.nn.log_softmax(logits), -1)), upd

    (la, upd_a), ga = jax.value_and_grad(lambda p: loss(plain, p),
                                         has_aux=True)(v["params"])
    (lb, upd_b), gb = jax.value_and_grad(lambda p: loss(remat, p),
                                         has_aux=True)(v["params"])
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(upd_a), jax.tree_util.tree_leaves(upd_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_unet_remat_matches():
    """UNet Arch.remat parity: same param tree, same train-mode loss and
    grads with a fixed dropout rng.

    Grad tolerances are loose: the rematted backward re-runs forward convs
    through a different oneDNN schedule on this CPU (bf16-fastmath AMX
    kernels), which puts ~2e-3 abs noise on the early-stage kernels —
    comparable to their largest grad entries. The same comparison under
    jax_enable_x64 measures 2.9e-11 worst-leaf abs diff (exact semantics;
    recorded 2026-08-18), so this f32 run is a structural regression
    guard, not the precision pin."""
    from dct_tpu.models.unet import UNet

    x = jnp.asarray(np.random.RandomState(6).rand(1, 192, 192, 1), jnp.float32)
    gt = jnp.asarray(np.random.RandomState(7).randint(0, 2, (1, 192, 192)))
    plain = UNet(num_classes=2, use_bn=True)
    remat = UNet(num_classes=2, use_bn=True, remat=True)
    rngs = {"params": jax.random.PRNGKey(8), "dropout": jax.random.PRNGKey(9)}
    v = plain.init(rngs, x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(remat.init(rngs, x, train=False)))

    def loss(mod, params):
        logits, upd = mod.apply({"params": params,
                                 "batch_stats": v["batch_stats"]},
                                x, train=True, mutable=["batch_stats"],
                                rngs={"dropout": jax.random.PRNGKey(10)})
        one_hot = jax.nn.one_hot(gt, 2)
        return -jnp.mean(jnp.sum(one_hot * jax.nn.log_softmax(logits), -1)), upd

    (la, _), ga = jax.value_and_grad(lambda p: loss(plain, p),
                                     has_aux=True)(v["params"])
    (lb, _), gb = jax.value_and_grad(lambda p: loss(remat, p),
                                     has_aux=True)(v["params"])
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=5e-3)
