"""Model architecture tests: shape/param-count parity with the torch reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dct_tpu.models import Segmentator, get_arch, stack_states, unstack_states

ADAM = {"name": "Adam", "lr": 1e-3, "weight_decay": 1e-4}
STEP = {"name": "StepLR", "step_size": 90, "gamma": 0.1}


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


class TestEnet:
    def test_param_count_parity(self, rng):
        """Reference torch Enet(num_classes=4) has exactly 362,527 params
        (ref:generalframework/arch/enet.py:234-243, measured)."""
        seg = Segmentator({"name": "enet", "num_classes": 4}, ADAM, STEP, rng,
                          input_shape=(1, 64, 64, 1))
        assert n_params(seg.state["params"]) == 362527

    def test_output_shape(self, rng):
        seg = Segmentator({"name": "enet", "num_classes": 4}, ADAM, STEP, rng,
                          input_shape=(1, 64, 64, 1))
        x = jnp.zeros((2, 64, 64, 1))
        out = seg.apply_eval(seg.state["params"], seg.state["batch_stats"], x)
        assert out.shape == (2, 64, 64, 4)

    def test_train_updates_batch_stats(self, rng):
        seg = Segmentator({"name": "enet", "num_classes": 2}, ADAM, STEP, rng,
                          input_shape=(1, 32, 32, 1))
        x = jax.random.normal(rng, (2, 32, 32, 1))
        _, new_bs = seg.apply_train(seg.state["params"], seg.state["batch_stats"], x)
        old = jax.tree_util.tree_leaves(seg.state["batch_stats"])
        new = jax.tree_util.tree_leaves(new_bs)
        assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new))

    def test_registry_unknown(self):
        with pytest.raises(AssertionError):
            get_arch("nope", {})


class TestUNet:
    @pytest.mark.parametrize("arch", ["unet", "unet_bn"])
    def test_output_shape(self, rng, arch):
        # valid 3x3 convs bound the minimum input (~192px), same as the
        # torch reference (ref:generalframework/arch/network.py:196-240)
        seg = Segmentator({"name": arch, "num_classes": 2}, ADAM, STEP, rng,
                          input_shape=(1, 192, 192, 1))
        x = jnp.zeros((1, 192, 192, 1))
        out = seg.apply_eval(seg.state["params"], seg.state["batch_stats"], x)
        assert out.shape == (1, 192, 192, 2)


class TestSegmentator:
    def test_state_dict_roundtrip(self, rng):
        seg = Segmentator({"name": "enet", "num_classes": 2}, ADAM, STEP, rng,
                          input_shape=(1, 32, 32, 1))
        seg.epoch = 5
        sd = seg.state_dict
        seg2 = Segmentator.from_state_dict(sd, rng, input_shape=(1, 32, 32, 1))
        assert seg2.epoch == 5
        for a, b in zip(jax.tree_util.tree_leaves(seg.state["params"]),
                        jax.tree_util.tree_leaves(seg2.state["params"])):
            assert np.allclose(np.asarray(a), np.asarray(b))

    def test_stack_unstack(self, rng):
        segs = [Segmentator({"name": "enet", "num_classes": 2}, ADAM, STEP,
                            jax.random.fold_in(rng, i), input_shape=(1, 32, 32, 1))
                for i in range(2)]
        stacked = stack_states([s.state for s in segs])
        leaf = jax.tree_util.tree_leaves(stacked["params"])[0]
        assert leaf.shape[0] == 2
        back = unstack_states(stacked, 2)
        for orig, rec in zip(segs, back):
            for a, b in zip(jax.tree_util.tree_leaves(orig.state["params"]),
                            jax.tree_util.tree_leaves(rec["params"])):
                assert np.allclose(np.asarray(a), np.asarray(b))

    def test_different_seeds_different_params(self, rng):
        s1 = Segmentator({"name": "enet", "num_classes": 2}, ADAM, STEP,
                         jax.random.PRNGKey(1), input_shape=(1, 32, 32, 1))
        s2 = Segmentator({"name": "enet", "num_classes": 2}, ADAM, STEP,
                         jax.random.PRNGKey(2), input_shape=(1, 32, 32, 1))
        diffs = [not np.allclose(np.asarray(a), np.asarray(b))
                 for a, b in zip(jax.tree_util.tree_leaves(s1.state["params"]),
                                 jax.tree_util.tree_leaves(s2.state["params"]))]
        assert any(diffs)
