"""Tests for logging, decorators, metainfo, general utils, checkpointing."""
import json

import jax.numpy as jnp
import numpy as np
import pytest

from dct_tpu.checkpoint import load_checkpoint, save_checkpoint
from dct_tpu.data.metainfo import classSizeCalulator, get_metainfo_generator, getImage_GT
from dct_tpu.utils.decorators import accepts, onehot
from dct_tpu.utils.general import (
    class2one_hot,
    colorize,
    colormap,
    dice_batch,
    probs2class,
    probs2one_hot,
    save_images,
    simplex,
    sset,
)
from dct_tpu.utils.logging import RateMeter, ScalarWriter


class TestScalarWriter:
    def test_jsonl_and_tb(self, tmp_path):
        w = ScalarWriter(tmp_path)
        w.add_scalar("loss", 0.5, 0)
        w.add_scalars("val", {"dsc1": 0.7, "dsc2": 0.8}, 1)
        w.close()
        lines = [json.loads(l) for l in
                 open(tmp_path / "scalars.jsonl").read().splitlines()]
        assert lines[0] == {"tag": "loss", "value": 0.5, "step": 0}
        assert {l["tag"] for l in lines[1:]} == {"val/dsc1", "val/dsc2"}
        assert list(tmp_path.glob("events.out.tfevents.*"))  # torch TB present


class TestRateMeter:
    def test_rate(self):
        m = RateMeter()
        m.start()
        inst = m.stop(100)
        assert inst > 0 and m.rate == inst


class TestDecorators:
    def test_accepts_passes_and_fails(self):
        @accepts
        def f(a: int, b: str = "x"):
            return a

        assert f(1) == 1
        with pytest.raises(AssertionError):
            f("not an int")

    def test_onehot_guard(self):
        @onehot("t")
        def g(t):
            return t

        ok = np.eye(3)[np.array([0, 1, 2])]
        g(ok)
        with pytest.raises(AssertionError):
            g(np.array([[0.5, 0.5]]))


class TestMetainfo:
    def test_class_size(self):
        gen = classSizeCalulator(C=3)
        counts = gen(np.array([[0, 1], [1, 2]]))
        assert counts.tolist() == [1, 2, 1]

    def test_identity(self):
        gen = getImage_GT()
        assert gen(("a", "b")) == ("a", "b")

    def test_registry(self):
        assert isinstance(get_metainfo_generator("classSizeCalulator", C=2),
                          classSizeCalulator)


class TestGeneralUtils:
    def test_simplex_sset(self):
        p = jnp.asarray([[0.2, 0.8], [0.5, 0.5]])
        assert simplex(p)
        assert sset(jnp.asarray([0, 1, 1]), [0, 1])
        assert not sset(jnp.asarray([0, 2]), [0, 1])

    def test_onehot_roundtrip(self):
        seg = jnp.asarray([[[0, 1], [2, 1]]])
        oh = class2one_hot(seg, 3)
        assert np.array_equal(np.asarray(probs2class(oh)), np.asarray(seg))
        assert np.allclose(np.asarray(probs2one_hot(oh)), np.asarray(oh))

    def test_dice_batch_shape(self):
        oh = class2one_hot(jnp.zeros((2, 4, 4), jnp.int32), 3)
        d = dice_batch(oh, oh)
        assert d.shape == (3,) and np.allclose(np.asarray(d)[0], 1.0)

    def test_colorize(self):
        cm = colormap(4)
        assert cm.shape == (4, 3)
        out = colorize(np.array([[0, 1], [2, 3]]))
        assert out.shape == (2, 2, 3)

    def test_save_images(self, tmp_path):
        segs = np.random.randint(0, 4, (2, 8, 8))
        save_images(segs, ["a", "b"], tmp_path, "eval", iter=3, seg_num="0")
        assert (tmp_path / "iter003" / "eval" / "0" / "a.png").exists()


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        payload = {"x": jnp.arange(4.0), "meta": {"epoch": 3},
                   "nested": [jnp.ones((2, 2))]}
        save_checkpoint(tmp_path / "c.ckpt", payload)
        out = load_checkpoint(tmp_path / "c.ckpt")
        assert out["meta"]["epoch"] == 3
        assert np.allclose(out["x"], [0, 1, 2, 3])
        assert isinstance(out["x"], np.ndarray)
