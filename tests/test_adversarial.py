"""Tests for FGSM/VAT generators (ref AEGenerator parity + VAT paper semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dct_tpu.adversarial import _l2_normalize, fgsm, vat_perturbation
from dct_tpu.losses import cross_entropy2d
from dct_tpu.models import Segmentator

ADAM = {"name": "Adam", "lr": 1e-3}
STEP = {"name": "StepLR", "step_size": 90, "gamma": 0.1}


@pytest.fixture(scope="module")
def seg():
    return Segmentator({"name": "enet", "num_classes": 4}, ADAM, STEP,
                       jax.random.PRNGKey(0), input_shape=(1, 32, 32, 1))


class TestFGSM:
    def test_perturbation_magnitude(self, seg, rng):
        img = jax.random.uniform(rng, (2, 32, 32, 1))
        gt = jax.random.randint(rng, (2, 32, 32), 0, 4)
        adv, noise, probs, _ = fgsm(seg.apply_train, seg.state["params"],
                                    seg.state["batch_stats"], img, gt,
                                    cross_entropy2d, epsilon=0.03)
        delta = np.abs(np.asarray(adv - img))
        # FGSM moves every pixel by exactly ±eps (sign of grad)
        assert np.allclose(np.unique(np.round(delta, 5)), [0.0, 0.03], atol=1e-4) \
            or delta.max() <= 0.03 + 1e-6
        assert probs.shape == (2, 32, 32, 4)

    def test_pseudo_label_extension(self, seg, rng):
        # img batch larger than gt: extra rows use pseudo-labels (ref:AEGenerator.py:24-25)
        img = jax.random.uniform(rng, (4, 32, 32, 1))
        gt = jax.random.randint(rng, (2, 32, 32), 0, 4)
        adv, _, probs, _ = fgsm(seg.apply_train, seg.state["params"],
                                seg.state["batch_stats"], img, gt,
                                cross_entropy2d, epsilon=0.05)
        assert adv.shape == img.shape and probs.shape[0] == 4

    def test_increases_loss(self, seg, rng):
        """On a fixed-BN surface an FGSM step must not decrease CE against the
        attacked labels (with train-mode BN the surface itself shifts with the
        perturbed batch stats, so monotonicity is only guaranteed frozen)."""
        img = jax.random.uniform(rng, (2, 32, 32, 1))
        gt = jax.random.randint(rng, (2, 32, 32), 0, 4)
        params, bs = seg.state["params"], seg.state["batch_stats"]

        def apply_frozen(p, b, x):
            return seg.apply_eval(p, b, x), b

        adv, _, _, _ = fgsm(apply_frozen, params, bs, img, gt,
                            cross_entropy2d, epsilon=0.03)
        logits_clean = seg.apply_eval(params, bs, img)
        logits_adv = seg.apply_eval(params, bs, adv)
        # at random init the surface is nearly flat — allow linearization noise
        assert float(cross_entropy2d(logits_adv, gt)) >= \
            float(cross_entropy2d(logits_clean, gt)) - 2e-3

    def test_no_param_grads_leak(self, seg, rng):
        img = jax.random.uniform(rng, (2, 32, 32, 1))
        gt = jax.random.randint(rng, (2, 32, 32), 0, 4)

        def f(params):
            adv, _, probs, _ = fgsm(seg.apply_train, params,
                                    seg.state["batch_stats"], img, gt,
                                    cross_entropy2d, 0.03)
            return jnp.sum(adv) + jnp.sum(probs)
        grads = jax.grad(f)(seg.state["params"])
        assert all(np.allclose(np.asarray(g), 0.0)
                   for g in jax.tree_util.tree_leaves(grads))


class TestVAT:
    def test_l2_normalize(self, rng):
        d = jax.random.normal(rng, (3, 8, 8, 1))
        n = _l2_normalize(d)
        norms = np.linalg.norm(np.asarray(n).reshape(3, -1), axis=1)
        assert np.allclose(norms, 1.0, atol=1e-4)

    def test_perturbation_properties(self, seg, rng):
        img = jax.random.uniform(rng, (2, 32, 32, 1))
        adv, r_adv, _ = vat_perturbation(seg.apply_train, seg.state["params"],
                                         seg.state["batch_stats"], img, rng,
                                         xi=1e-6, epsilon=2.0, ip=1)
        # r_adv has per-sample L2 norm == epsilon
        norms = np.linalg.norm(np.asarray(r_adv).reshape(2, -1), axis=1)
        assert np.allclose(norms, 2.0, atol=1e-3)
        # adv image clamped to [0,1] (ref:AEGenerator.py:117)
        assert float(adv.min()) >= 0.0 and float(adv.max()) <= 1.0

    def test_deterministic_given_key(self, seg, rng):
        img = jax.random.uniform(rng, (1, 32, 32, 1))
        a1, _, _ = vat_perturbation(seg.apply_train, seg.state["params"],
                                    seg.state["batch_stats"], img, rng)
        a2, _, _ = vat_perturbation(seg.apply_train, seg.state["params"],
                                    seg.state["batch_stats"], img, rng)
        assert np.allclose(np.asarray(a1), np.asarray(a2))
