"""Shape tests for the remaining arch families (deeplab, joseent, classifiers)."""
import jax
import jax.numpy as jnp
import pytest

from dct_tpu.models import Segmentator

ADAM = {"name": "Adam", "lr": 1e-3}
STEP = {"name": "StepLR", "step_size": 90, "gamma": 0.1}


class TestDeepLab:
    def test_v2_output_stride8(self, rng):
        # DeepLabV2 emits raw ~1/8-res score maps (no upsample,
        # ref:deeplabv2.py:70-72); torch's ceil-mode stem makes 64 → 9
        seg = Segmentator({"name": "deeplabv2", "num_classes": 19,
                           "n_blocks": [1, 1, 1, 1]}, ADAM, STEP, rng,
                          input_shape=(1, 64, 64, 3))
        out = seg.apply_eval(seg.state["params"], seg.state["batch_stats"],
                             jnp.zeros((1, 64, 64, 3)))
        assert out.shape == (1, 9, 9, 19)

    @pytest.mark.parametrize("arch", ["deeplabv3", "deeplabv3plus"])
    def test_v3_full_res(self, rng, arch):
        seg = Segmentator({"name": arch, "num_classes": 7,
                           "n_blocks": [1, 1, 1, 3]}, ADAM, STEP, rng,
                          input_shape=(1, 64, 64, 3))
        out = seg.apply_eval(seg.state["params"], seg.state["batch_stats"],
                             jnp.zeros((1, 64, 64, 3)))
        assert out.shape == (1, 64, 64, 7)

    def test_msc_wrapper(self, rng):
        from dct_tpu.models.deeplab import DeepLabV2, MSC
        model = MSC(scale=DeepLabV2(num_classes=4, n_blocks=[1, 1, 1, 1]))
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out_eval = model.apply(variables, x, train=False)
        assert out_eval.shape == (1, 9, 9, 4)
        outs_train, _ = model.apply(variables, x, train=True,
                                    mutable=["batch_stats"])
        assert isinstance(outs_train, list) and len(outs_train) == 4


class TestPSPNet:
    def test_full_res_and_adaptive_pool(self, rng):
        import numpy as np
        from dct_tpu.models.pspnet import adaptive_avg_pool
        # adaptive pool matches torch AdaptiveAvgPool2d cell boundaries on a
        # non-divisible size (H=7, bins=3 → overlapping cells [0,3) [2,5) [4,7))
        x = jnp.arange(7 * 7, dtype=jnp.float32).reshape(1, 7, 7, 1)
        got = np.asarray(adaptive_avg_pool(x, 3))
        lo = [(i * 7) // 3 for i in range(3)]
        hi = [-(-((i + 1) * 7) // 3) for i in range(3)]
        want = np.array([[x[0, lo[i]:hi[i], lo[j]:hi[j], 0].mean()
                          for j in range(3)] for i in range(3)])
        assert np.allclose(got[0, :, :, 0], want)

        seg = Segmentator({"name": "pspnet", "num_classes": 4,
                           "n_blocks": [1, 1, 1, 1], "psp_channels": 16},
                          ADAM, STEP, rng, input_shape=(1, 64, 64, 1))
        out = seg.apply_eval(seg.state["params"], seg.state["batch_stats"],
                             jnp.zeros((1, 64, 64, 1)))
        assert out.shape == (1, 64, 64, 4)

    def test_deeplabenet_registered(self, rng):
        # ref:arch/__init__.py:51 registers the 3-channel Cityscapes ENet
        seg = Segmentator({"name": "deeplabenet", "num_classes": 19},
                          ADAM, STEP, rng, input_shape=(1, 32, 32, 3))
        out = seg.apply_eval(seg.state["params"], seg.state["batch_stats"],
                             jnp.zeros((1, 32, 32, 3)))
        assert out.shape == (1, 32, 32, 19)


class TestJoseent:
    def test_jenet_shape(self, rng):
        seg = Segmentator({"name": "jenet", "num_classes": 2}, ADAM, STEP, rng,
                          input_shape=(1, 32, 32, 1))
        out = seg.apply_eval(seg.state["params"], seg.state["batch_stats"],
                             jnp.zeros((2, 32, 32, 1)))
        assert out.shape == (2, 32, 32, 2)

    def test_cnet_shape(self, rng):
        seg = Segmentator({"name": "cnet", "num_classes": 2, "ngf": 8},
                          ADAM, STEP, rng, input_shape=(1, 32, 32, 1))
        out = seg.apply_eval(seg.state["params"], seg.state["batch_stats"],
                             jnp.zeros((1, 32, 32, 1)))
        assert out.shape == (1, 32, 32, 2)


class TestClassifiers:
    @pytest.mark.parametrize("arch", ["vgg11", "resnet18"])
    def test_logits(self, rng, arch):
        seg = Segmentator({"name": arch, "num_classes": 3}, ADAM, STEP, rng,
                          input_shape=(1, 64, 64, 1))
        out = seg.apply_eval(seg.state["params"], seg.state["batch_stats"],
                             jnp.zeros((2, 64, 64, 1)))
        assert out.shape == (2, 3)
