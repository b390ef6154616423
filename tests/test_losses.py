"""Closed-form unit tests for dct_tpu.losses (parity with ref loss/loss.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dct_tpu import losses


def softmax_np(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


class TestCrossEntropy:
    def test_matches_manual_nll(self):
        rs = np.random.RandomState(0)
        logits = jnp.asarray(rs.randn(2, 4, 4, 3).astype(np.float32))
        target = jnp.asarray(rs.randint(0, 3, (2, 4, 4)))
        loss = losses.cross_entropy2d(logits, target)
        logp = np.log(softmax_np(np.asarray(logits)))
        nll = -np.take_along_axis(logp, np.asarray(target)[..., None], axis=-1)
        assert np.allclose(float(loss), nll.mean(), atol=1e-6)

    def test_weighted_mean_is_torch_semantics(self):
        # weighted mean = sum(w_y * nll) / sum(w_y)
        logits = jnp.zeros((1, 1, 2, 2))  # uniform → nll = log(2)
        target = jnp.asarray([[[0, 1]]])
        w = [1.0, 3.0]
        loss = losses.cross_entropy2d(logits, target, weight=w)
        assert np.allclose(float(loss), np.log(2.0), atol=1e-6)

    def test_ignore_index(self):
        rs = np.random.RandomState(1)
        logits = jnp.asarray(rs.randn(1, 2, 2, 3).astype(np.float32))
        target = jnp.asarray([[[0, 255], [255, 2]]])
        loss = losses.cross_entropy2d(logits, target, ignore_index=255)
        logp = np.log(softmax_np(np.asarray(logits)))[0]
        manual = (-logp[0, 0, 0] - logp[1, 1, 2]) / 2
        assert np.allclose(float(loss), manual, atol=1e-6)

    def test_grad_finite(self):
        g = jax.grad(lambda l: losses.cross_entropy2d(l, jnp.zeros((1, 2, 2), jnp.int32)))(
            jnp.ones((1, 2, 2, 3)))
        assert np.all(np.isfinite(np.asarray(g)))


class TestEntropyKLJSD:
    def test_entropy_uniform_is_logC(self):
        p = jnp.full((1, 2, 2, 4), 0.25)
        e = losses.entropy_2d(p)
        assert np.allclose(np.asarray(e), np.log(4.0), atol=1e-5)

    def test_entropy_onehot_is_zero(self):
        p = jnp.asarray([[[[1.0, 0.0, 0.0, 0.0]]]])
        assert np.allclose(np.asarray(losses.entropy_2d(p)), 0.0, atol=1e-5)

    def test_kl_self_is_zero(self):
        rs = np.random.RandomState(2)
        p = jax.nn.softmax(jnp.asarray(rs.randn(2, 3, 3, 4)), axis=-1)
        assert np.allclose(np.asarray(losses.kl_div_2d(p, p)), 0.0, atol=1e-5)

    def test_kl_closed_form(self):
        p = jnp.asarray([[[[0.5, 0.5]]]])
        y = jnp.asarray([[[[0.9, 0.1]]]])
        # KL(y||p) = 0.9 ln(0.9/0.5) + 0.1 ln(0.1/0.5)
        expect = 0.9 * np.log(0.9 / 0.5) + 0.1 * np.log(0.1 / 0.5)
        assert np.allclose(float(losses.kl_div_2d(p, y)[0, 0, 0]), expect, atol=1e-4)

    def test_kl_logits_matches_probs(self):
        rs = np.random.RandomState(3)
        pl = jnp.asarray(rs.randn(2, 3, 3, 4).astype(np.float32))
        yl = jnp.asarray(rs.randn(2, 3, 3, 4).astype(np.float32))
        a = losses.kl_div_2d(jax.nn.softmax(pl, -1), jax.nn.softmax(yl, -1))
        b = losses.kl_div_2d_logits(pl, yl)
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_jsd_identical_is_zero(self):
        rs = np.random.RandomState(4)
        p = jax.nn.softmax(jnp.asarray(rs.randn(2, 3, 3, 4)), axis=-1)
        jsd = losses.jsd_2d(jnp.stack([p, p], 0))
        assert np.allclose(np.asarray(jsd), 0.0, atol=1e-5)

    def test_jsd_bounds(self):
        # two disjoint one-hots → JSD = ln 2
        p1 = jnp.asarray([[[[1.0, 0.0]]]])
        p2 = jnp.asarray([[[[0.0, 1.0]]]])
        jsd = losses.jsd_2d([p1, p2])
        assert np.allclose(float(jsd[0, 0, 0]), np.log(2.0), atol=1e-3)

    def test_jsd_list_equals_stack(self):
        rs = np.random.RandomState(5)
        ps = [jax.nn.softmax(jnp.asarray(rs.randn(1, 2, 2, 3)), -1) for _ in range(3)]
        assert np.allclose(np.asarray(losses.jsd_2d(ps)),
                           np.asarray(losses.jsd_2d(jnp.stack(ps, 0))))


class TestDice:
    def test_perfect_prediction(self):
        # huge logits at the right class → dice ≈ 1
        target = jnp.asarray([[[0, 1], [1, 0]]])
        onehot = jax.nn.one_hot(target, 2)
        logits = 100.0 * onehot
        d = losses.dice_coefficient(logits, onehot, smooth=1e-8)
        assert np.allclose(np.asarray(d), 1.0, atol=1e-4)

    def test_dice_loss_reduces(self):
        rs = np.random.RandomState(6)
        logits = jnp.asarray(rs.randn(2, 4, 4, 3).astype(np.float32))
        onehot = jax.nn.one_hot(jnp.asarray(rs.randint(0, 3, (2, 4, 4))), 3)
        loss = losses.dice_loss(logits, onehot)
        assert loss.shape == ()
        assert 0.0 <= float(loss) <= 1.0

    def test_weight_normalisation(self):
        rs = np.random.RandomState(7)
        logits = jnp.asarray(rs.randn(2, 4, 4, 3).astype(np.float32))
        onehot = jax.nn.one_hot(jnp.asarray(rs.randint(0, 3, (2, 4, 4))), 3)
        a = losses.dice_loss(logits, onehot, weight=[1.0, 1.0, 1.0])
        b = losses.dice_loss(logits, onehot)
        assert np.allclose(float(a), float(b), atol=1e-6)


class TestMisc:
    def test_mse_2d(self):
        logits = jnp.zeros((1, 2, 2, 2))
        target = jnp.ones((1, 2, 2))
        assert np.allclose(float(losses.mse_2d(logits, target)), 0.25, atol=1e-6)

    def test_enet_weighing(self):
        labels = [np.zeros((4, 4), np.int64), np.ones((4, 4), np.int64)]
        w = losses.enet_weighing(labels, num_classes=2)
        assert np.allclose(w[0], w[1])
        assert np.allclose(w[0], 1 / np.log(1.02 + 0.5))

    def test_registry(self):
        fn = losses.get_loss_fn("cross_entropy", weight=[1, 1, 1, 1])
        out = fn(jnp.zeros((1, 2, 2, 4)), jnp.zeros((1, 2, 2), jnp.int32))
        assert np.isfinite(float(out))
        with pytest.raises(ValueError):
            losses.get_loss_fn("nope")
