"""Cityscapes dataset + city co-trainer tests on a tiny synthetic tree."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from dct_tpu.data.cityscapes import (
    NUM_CLASSES,
    CityscapesDataset,
    decode_segmap,
    encode_segmap,
    get_cityscapes_split,
)

ADAM = {"name": "Adam", "lr": 1e-3}
STEP = {"name": "StepLR", "step_size": 90, "gamma": 0.1}


def make_synthetic_city(root: Path, n_per_city: int = 6, size: int = 64) -> Path:
    rs = np.random.RandomState(0)
    for mode in ("train", "val"):
        for city in ("aachen", "bochum"):
            img_dir = root / "leftImg8bit" / mode / city
            gt_dir = root / "gtFine" / mode / city
            img_dir.mkdir(parents=True, exist_ok=True)
            gt_dir.mkdir(parents=True, exist_ok=True)
            for i in range(n_per_city):
                stem = f"{city}_{i:06d}_000019"
                Image.fromarray(rs.randint(0, 255, (size, size, 3),
                                           dtype=np.uint8)).save(
                    img_dir / f"{stem}_leftImg8bit.png")
                raw = rs.choice([0, 7, 8, 11, 26, 33], (size, size)).astype(np.uint8)
                Image.fromarray(raw).save(gt_dir / f"{stem}_gtFine_labelIds.png")
    return root


@pytest.fixture(scope="module")
def city_root(tmp_path_factory):
    return make_synthetic_city(tmp_path_factory.mktemp("city"))


class TestEncode:
    def test_remap(self):
        raw = np.array([[7, 8, 0], [26, 33, 29]], np.uint8)
        enc = encode_segmap(raw)
        assert enc[0, 0] == 0 and enc[0, 1] == 1    # road, sidewalk
        assert enc[0, 2] == 250 and enc[1, 2] == 250  # void
        assert enc[1, 0] == 13 and enc[1, 1] == 18   # car, bicycle

    def test_decode_shape(self):
        m = np.zeros((4, 4), np.int64)
        assert decode_segmap(m).shape == (4, 4, 3)


class TestDataset:
    def test_load(self, city_root):
        ds = CityscapesDataset(city_root, "train", image_size=(32, 32),
                               subsample=1, quite=True)
        assert len(ds) == 12
        assert ds.data["img"].shape == (12, 32, 32, 3)
        vals = set(np.unique(ds.data["gt"]))
        assert vals <= set(range(NUM_CLASSES)) | {250}

    def test_subsample(self, city_root):
        ds = CityscapesDataset(city_root, "train", image_size=(32, 32),
                               subsample=4, quite=True)
        assert len(ds) == 3

    def test_extract_cities(self, city_root):
        ds = CityscapesDataset(city_root, "train", image_size=(32, 32),
                               subsample=1, quite=True)
        sub = ds.extract_cities(["aachen"])
        assert len(sub) == 6 and all(c == "aachen" for c in sub.cities)

    def test_split(self, city_root):
        ds = CityscapesDataset(city_root, "train", image_size=(32, 32),
                               subsample=1, quite=True)
        lab, unlab = ds.split_by_proportion(0.5, seed=1)
        assert len(lab) == 6 and len(unlab) == 6
        assert not set(lab.filenames) & set(unlab.filenames)


class TestCityCoTrainer:
    def test_one_epoch(self, city_root, tmp_path):
        from dct_tpu.losses import get_loss_fn
        from dct_tpu.models import Segmentator
        from dct_tpu.train import CoTrainerCity

        config = {"Dataset": {"root_dir": str(city_root),
                              "image_size": (32, 32), "subsample": 1},
                  "Lab_Partitions": {"num_models": 2, "partition_sets": 0.5,
                                     "partition_overlap": 0.5},
                  "Seed": 1}
        labeled, unlab, val = get_cityscapes_split(config)
        segs = [Segmentator({"name": "enet", "num_classes": NUM_CLASSES,
                             "in_channels": 3}, ADAM, STEP,
                            jax.random.PRNGKey(i), input_shape=(1, 32, 32, 3))
                for i in range(2)]
        sup = get_loss_fn("cross_entropy", ignore_index=250)
        ct = CoTrainerCity(segs, labeled, unlab, val,
                           {"sup": sup, "jsd": get_loss_fn("jsd"),
                            "adv": get_loss_fn("jsd")},
                           max_epoch=1, save_dir=tmp_path / "city",
                           adv_scheduler_dict={"name": "ConstantScheduler",
                                               "begin_epoch": 0, "max_value": 0.05},
                           cot_scheduler_dict={"name": "ConstantScheduler",
                                               "begin_epoch": 0, "max_value": 0.5},
                           adv_training_dict={"eplision": 0.03, "fsgm_ratio": 0.5},
                           batch_size=2, iters_per_epoch=2)
        df = ct.start_training(train_jsd=True, train_adv=True)
        assert len(df) == 1
        assert 0.0 <= df["val_mIoU_0"].iloc[0] <= 1.0
        assert np.isfinite(df["adv_loss"]).all()
        assert (tmp_path / "city" / "best_0.ckpt").exists()


class TestCityFuseForward:
    def test_fused_matches_sequential_one_iter(self):
        """The city epoch's fused two-group forward (train/city.py, same
        construction as steps.py fuse_forward) must match the sequential
        path to fp32 noise over one iteration from fresh states. The
        sequential build is forced by clearing seg.bn_momentum (the
        build-time gate)."""
        from dct_tpu.losses import get_loss_fn
        from dct_tpu.models import Segmentator, stack_states
        from dct_tpu.train.city import make_city_cotrain_epoch

        K, B, H, T = 2, 2, 32, 1
        # SGD: Adam's first step is ±lr·sign(g), which amplifies benign
        # fp32 lowering noise into 2·lr param differences (same reasoning
        # as tests/test_shard_cotrain.py)
        SGD = {"name": "SGD", "lr": 0.01, "momentum": 0.9}
        segs = [Segmentator({"name": "enet", "num_classes": NUM_CLASSES,
                             "in_channels": 3}, SGD, STEP,
                            jax.random.PRNGKey(i), input_shape=(1, H, H, 3))
                for i in range(K)]
        seg = segs[0]
        st = stack_states([{"params": s.state["params"],
                            "batch_stats": s.state["batch_stats"]}
                           for s in segs])

        def fresh():
            cp = jax.tree_util.tree_map(jnp.copy, st)
            return {"params": cp["params"], "batch_stats": cp["batch_stats"],
                    "opt_state": seg.tx.init(cp["params"])}

        sup = get_loss_fn("cross_entropy", ignore_index=250)
        fn_fused = make_city_cotrain_epoch(seg, K, NUM_CLASSES, sup,
                                           True, True, 0.03, 10.0)
        assert seg.bn_momentum is not None
        saved, seg.bn_momentum = seg.bn_momentum, None
        try:
            fn_seq = make_city_cotrain_epoch(seg, K, NUM_CLASSES, sup,
                                             True, True, 0.03, 10.0)
        finally:
            seg.bn_momentum = saved

        rs = np.random.RandomState(0)
        N = 16
        img = jnp.asarray(rs.randint(0, 255, (N, H, H, 3), dtype=np.uint8))
        gt = jnp.asarray(rs.randint(0, NUM_CLASSES, (N, H, H)).astype(np.uint8))
        idx_lab = rs.randint(0, N, (T, K, B)).astype(np.int32)
        idx_unlab = rs.randint(0, N, (T, B)).astype(np.int32)
        idx_adv_lab = rs.randint(0, N, (T, 2, B)).astype(np.int32)
        idx_adv_unlab = rs.randint(0, N, (T, 2, B)).astype(np.int32)
        flags = np.array([[True, False]])
        args = (img, gt, idx_lab, idx_unlab, idx_adv_lab, idx_adv_unlab,
                flags, jax.random.PRNGKey(3), 1e-3, 0.5, 0.05)

        new_f, m_f = fn_fused(fresh(), *args)
        new_s, m_s = fn_seq(fresh(), *args)
        for name in ("sup_loss", "jsd_loss", "adv_loss"):
            a, b = np.asarray(m_f[name]), np.asarray(m_s[name])
            assert np.allclose(a, b, atol=5e-5), (name, a, b)
        for which, tol in (("params", 1e-4), ("batch_stats", 1e-3)):
            for pa, pb in zip(jax.tree_util.tree_leaves(new_f[which]),
                              jax.tree_util.tree_leaves(new_s[which])):
                d = np.abs(np.asarray(pa) - np.asarray(pb)).max()
                assert d < tol, (which, d)


class TestCityAugment:
    """key2aug registry parity + composed on-device augmentation."""

    def test_registry_keys_match_reference(self):
        from dct_tpu.data.city_augment import key2aug
        # ref:generalframework/dataset/augment.py:223-231 (incl. 'sale' alias)
        assert set(key2aug) == {"rcrop", "scale", "rsize", "rsizecrop",
                                "rotate", "ccrop", "sale"}

    def test_rcrop_zooms_window(self):
        from dct_tpu.data.city_augment import get_composed_augmentations
        h = w = 32
        xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        img = jnp.stack([xx + 10] * 3, -1)[None]       # (1,h,w,3) coord image
        gt = jnp.zeros((1, h, w), jnp.int32)
        aug = get_composed_augmentations({"rcrop": [16, 16]})
        out, _ = aug(img, gt, jax.random.PRNGKey(0))
        # a 16-wide window fills the 32 canvas → source x advances ~0.5/col
        # (nearest duplicates columns: diffs alternate 0,1 → mean 0.5)
        mid = np.asarray(out[0, 16, :, 0])
        steps = np.diff(mid[(mid > 0)])
        assert 0.3 <= steps.mean() <= 0.7, steps.mean()

    def test_composed_rotate_crop_labels(self):
        from dct_tpu.data.city_augment import get_composed_augmentations
        rs = np.random.RandomState(0)
        img = jnp.asarray(rs.rand(4, 32, 32, 3).astype(np.float32))
        gt = jnp.asarray(rs.randint(0, NUM_CLASSES, (4, 32, 32)))
        aug = get_composed_augmentations({"rotate": 10, "rcrop": [24, 24]})
        img_a, gt_a = jax.jit(aug)(img, gt, jax.random.PRNGKey(1))
        assert img_a.shape == img.shape and gt_a.shape == gt.shape
        vals = set(np.unique(np.asarray(gt_a)).tolist())
        assert vals <= set(range(NUM_CLASSES)) | {250}
        # deterministic given the key
        img_b, _ = jax.jit(aug)(img, gt, jax.random.PRNGKey(1))
        assert np.allclose(np.asarray(img_a), np.asarray(img_b))

    def test_trainer_with_augmentations(self, city_root, tmp_path):
        from dct_tpu.losses import get_loss_fn
        from dct_tpu.models import Segmentator
        from dct_tpu.train import CoTrainerCity

        config = {"Dataset": {"root_dir": str(city_root),
                              "image_size": (32, 32), "subsample": 1},
                  "Lab_Partitions": {"num_models": 2, "partition_sets": 0.5,
                                     "partition_overlap": 0.5},
                  "Seed": 1}
        labeled, unlab, val = get_cityscapes_split(config)
        segs = [Segmentator({"name": "enet", "num_classes": NUM_CLASSES,
                             "in_channels": 3}, ADAM, STEP,
                            jax.random.PRNGKey(i), input_shape=(1, 32, 32, 3))
                for i in range(2)]
        sup = get_loss_fn("cross_entropy", ignore_index=250)
        ct = CoTrainerCity(segs, labeled, unlab, val,
                           {"sup": sup, "jsd": get_loss_fn("jsd"),
                            "adv": get_loss_fn("jsd")},
                           max_epoch=1, save_dir=tmp_path / "city_aug",
                           batch_size=2, iters_per_epoch=2,
                           augmentations={"rotate": 10, "rcrop": [24, 24]})
        df = ct.start_training(train_jsd=True, train_adv=False, save_val=True)
        assert np.isfinite(df["sup_loss_0"]).all()
        # per-10-epoch dumps: epoch 0 → iter000/eval/<model>/*.png
        dumps = list((tmp_path / "city_aug" / "iter000" / "eval").rglob("*.png"))
        assert dumps, "expected val prediction dumps at epoch 0"


class TestSupervisedCityEntry:
    def test_train_sup_city_entry(self, city_root, tmp_path):
        """configs/cityscapes_supervised.yaml through train_sup_city.main
        (ref:config/cityscapes_config.yml + ref:trainer_city.py:29-66):
        one supervised epoch on the synthetic tree, metrics written."""
        import pandas as pd

        import train_sup_city

        run = tmp_path / "city_sup"
        trainer = train_sup_city.main([
            f"Dataset.root_dir={city_root}",
            "Dataset.image_size=[32,32]",
            "Dataset.subsample=1",
            "Trainer.max_epoch=1",
            f"Trainer.save_dir={run}",
            "Dataloader.batch_size=2",
        ])
        assert trainer.inner.K == 1
        csv = pd.read_csv(run / "metrics.csv")
        assert len(csv) == 1 and np.isfinite(csv["sup_loss_0"]).all()
        assert (run / "config.yml").exists()


class TestCityResume:
    def _build(self, city_root, run, max_epoch, checkpoint=None):
        from dct_tpu.losses import get_loss_fn
        from dct_tpu.models import Segmentator
        from dct_tpu.train import CoTrainerCity

        config = {"Dataset": {"root_dir": str(city_root),
                              "image_size": (32, 32), "subsample": 1},
                  "Lab_Partitions": {"num_models": 2, "partition_sets": 0.5,
                                     "partition_overlap": 0.5},
                  "Seed": 1}
        labeled, unlab, val = get_cityscapes_split(config)
        segs = [Segmentator({"name": "enet", "num_classes": NUM_CLASSES,
                             "in_channels": 3}, ADAM, STEP,
                            jax.random.PRNGKey(i), input_shape=(1, 32, 32, 3))
                for i in range(2)]
        return CoTrainerCity(
            segs, labeled, unlab, val,
            {"sup": get_loss_fn("cross_entropy", ignore_index=250),
             "jsd": get_loss_fn("jsd"), "adv": get_loss_fn("jsd")},
            max_epoch=max_epoch, save_dir=run, checkpoint=checkpoint,
            adv_scheduler_dict={"name": "ConstantScheduler",
                                "begin_epoch": 0, "max_value": 0.05},
            cot_scheduler_dict={"name": "ConstantScheduler",
                                "begin_epoch": 0, "max_value": 0.5},
            adv_training_dict={"eplision": 0.03, "fsgm_ratio": 0.5},
            batch_size=2, iters_per_epoch=2)

    def test_city_resume_appends(self, city_root, tmp_path):
        import pandas as pd
        run = tmp_path / "city_resume"
        self._build(city_root, run, 1).start_training(train_jsd=True)
        ct2 = self._build(city_root, run, 2, checkpoint=str(run))
        assert ct2.start_epoch == 1
        df = ct2.start_training(train_jsd=True)
        assert list(df["epoch"]) == [0, 1]
        csv = pd.read_csv(run / ct2.metricname)
        assert list(csv["epoch"]) == [0, 1]
