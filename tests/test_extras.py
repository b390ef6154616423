"""Tests for FCN/SegNet archs, postprocessing tools, and nii-slicer math."""
import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from dct_tpu.models import Segmentator

ADAM = {"name": "Adam", "lr": 1e-3}
STEP = {"name": "StepLR", "step_size": 90, "gamma": 0.1}


class TestNewArchs:
    @pytest.mark.parametrize("arch", ["fcn8", "fcn16", "fcn32", "segnet"])
    def test_output_shape(self, rng, arch):
        seg = Segmentator({"name": arch, "num_classes": 5}, ADAM, STEP, rng,
                          input_shape=(1, 224, 224, 3))
        x = jnp.zeros((1, 224, 224, 3))
        out = seg.apply_eval(seg.state["params"], seg.state["batch_stats"], x)
        assert out.shape == (1, 224, 224, 5)


class TestReport:
    def _fake_run(self, root, name, score):
        d = root / name
        d.mkdir(parents=True)
        df = pd.DataFrame({"S0_DSC1": [score - 0.1, score],
                           "ens_DSC1": [score, score],
                           "ens_DSC2": [score, score]},
                          index=pd.Index(["patient001_01", "mean"], name="patient"))
        df.to_csv(d / "bsummary.csv")
        pd.DataFrame([{"kappa0": 0.8, "kappa1": 0.7}]).to_csv(d / "div.csv",
                                                              index=False)

    def test_aggregate(self, tmp_path):
        from dct_tpu.postprocessing import aggregate_ensemble_results
        self._fake_run(tmp_path, "run_a", 0.9)
        self._fake_run(tmp_path, "run_b", 0.7)
        out = aggregate_ensemble_results(str(tmp_path))
        ens = out["ensemble"]
        # ranked: run_a first
        assert list(ens.columns)[0] == "run_a"
        assert (tmp_path / "ensemble_results.csv").exists()
        assert (tmp_path / "mean_score_results.csv").exists()
        assert "kappa" in ens.index

    def test_plot(self, tmp_path):
        from dct_tpu.postprocessing import plot_learning_curves
        run = tmp_path / "run"
        run.mkdir()
        pd.DataFrame({"val_dice_1": np.linspace(0.2, 0.8, 10),
                      "train_loss": np.linspace(1.5, 0.2, 10)}).to_csv(
            run / "metrics.csv", index_label="epoch")
        out = plot_learning_curves([str(run)], columns=["val_dice_1"])
        assert out and (run / "learning_curves.png").exists()


class TestViewer:
    def test_batch_render(self, tmp_path):
        from PIL import Image

        from dct_tpu.postprocessing.viewer import main as viewer_main
        img_dir = tmp_path / "img"
        pred_dir = tmp_path / "pred"
        img_dir.mkdir()
        pred_dir.mkdir()
        rs = np.random.RandomState(0)
        for i in range(4):
            Image.fromarray(rs.randint(0, 255, (32, 32), dtype=np.uint8)).save(
                img_dir / f"slice_{i}.png")
            Image.fromarray(rs.randint(0, 4, (32, 32)).astype(np.uint8)).save(
                pred_dir / f"slice_{i}.png")
        out = tmp_path / "view.png"
        viewer_main(["--img_source", str(img_dir), str(pred_dir),
                     "--id_regex", r"(slice_\d+)\.png", "-n", "2",
                     "--out", str(out)])
        assert out.exists()


class TestSlicers:
    def test_norm_arr(self):
        from dct_tpu.datapreprocessing import norm_arr
        x = np.array([[-5.0, 0.0], [5.0, 15.0]])
        n = norm_arr(x)
        assert n.dtype == np.uint8
        assert n.min() == 0 and n.max() == 255

    def test_save_volume_slices(self, tmp_path):
        from dct_tpu.datapreprocessing import save_volume_slices
        rs = np.random.RandomState(0)
        img = rs.randint(0, 1000, (20, 20, 3)).astype(np.int16)
        gt = rs.randint(0, 4, (20, 20, 3)).astype(np.uint8)
        stems = save_volume_slices(img, gt, "patient007", "01", tmp_path / "train",
                                   shape=(16, 16), n_augment=1)
        assert len(stems) == 6  # 3 slices × (1 + 1 augment)
        assert (tmp_path / "train" / "img" / "patient007_01_0_0.png").exists()
        assert (tmp_path / "train" / "gt" / "patient007_01_1_2.png").exists()
        from PIL import Image
        g = np.array(Image.open(tmp_path / "train" / "gt" / "patient007_01_0_0.png"))
        assert set(np.unique(g)) <= {0, 1, 2, 3}

    def test_get_frame(self):
        from dct_tpu.datapreprocessing.slicers import get_frame
        assert get_frame("patient001_frame01.nii.gz") == "01"
        assert get_frame("patient001_frame12_gt.nii.gz") == "12"
        with pytest.raises(ValueError):
            get_frame("nonsense.nii")


class TestSpinSlicer:
    def test_center_crop(self):
        from dct_tpu.datapreprocessing import center_crop
        x = np.arange(36).reshape(6, 6)
        c = center_crop(x, (2, 2))
        assert c.shape == (2, 2)
        np.testing.assert_array_equal(c, x[2:4, 2:4])
        # pad-when-smaller (torchvision F.center_crop semantics)
        p = center_crop(x, (8, 8))
        assert p.shape == (8, 8)
        np.testing.assert_array_equal(p[1:7, 1:7], x)
        assert p[0].sum() == 0

    def test_resize_by_resolution(self):
        from dct_tpu.datapreprocessing import resize_by_resolution
        x = np.random.RandomState(0).randint(0, 255, (10, 10)).astype(np.uint8)
        # 0.5mm voxels → 0.25mm target = 2x upsample
        r = resize_by_resolution(x, (0.5, 0.5), (0.25, 0.25))
        assert r.shape == (20, 20)

    def test_save_spin_slices(self, tmp_path):
        from dct_tpu.datapreprocessing import save_spin_slices
        rs = np.random.RandomState(1)
        img = rs.randint(0, 2000, (24, 24, 2)).astype(np.int16)
        gt = (rs.rand(24, 24, 2) > 0.8).astype(np.uint8)
        stems = save_spin_slices(img, gt, "site1-sc01-image",
                                 tmp_path / "train", pixeldim=(0.5, 0.5),
                                 crop_size=(32, 32),
                                 gt_stem="site1-sc01-mask-r1")
        assert stems == ["site1-sc01-image_0", "site1-sc01-image_1"]
        assert (tmp_path / "train" / "img" / "site1-sc01-image_0.png").exists()
        assert (tmp_path / "train" / "gt" / "site1-sc01-mask-r1_1.png").exists()
        # unlabeled pool: no gt folder
        save_spin_slices(img, None, "site2-sc05-image", tmp_path / "unlabeled",
                         pixeldim=(0.5, 0.5), crop_size=(32, 32))
        assert (tmp_path / "unlabeled" / "img" / "site2-sc05-image_0.png").exists()
        assert not (tmp_path / "unlabeled" / "gt").exists()


class TestCityscapesExtra:
    def test_select_extra_data(self, tmp_path):
        from PIL import Image
        from dct_tpu.datapreprocessing.cityscapes_tools import (
            gt_path_for, select_extra_data)
        src = tmp_path / "extra"
        for city, n in [("augsburg", 3), ("bayreuth", 2)]:
            for i in range(n):
                ip = src / "leftImg8bit" / "train_extra" / city / \
                    f"{city}_{i:06d}_000019_leftImg8bit.png"
                gp = gt_path_for(ip)
                ip.parent.mkdir(parents=True, exist_ok=True)
                gp.parent.mkdir(parents=True, exist_ok=True)
                Image.new("RGB", (64, 32)).save(ip)
                Image.new("L", (64, 32)).save(gp)
        dst = tmp_path / "Cityscapes_extra"
        n = select_extra_data(str(src), str(dst), n_images=4, size=(32, 16))
        assert n == 4
        imgs = list(dst.rglob("*_leftImg8bit.png"))
        gts = list(dst.rglob("*_gtCoarse_labelIds.png"))
        assert len(imgs) == 4 and len(gts) == 4
        im = Image.open(imgs[0])
        assert im.size == (32, 16)
        # deterministic selection (np seed 1)
        n2 = select_extra_data(str(src), str(tmp_path / "again"), 4, (32, 16))
        assert sorted(p.name for p in (tmp_path / "again").rglob("*leftImg8bit.png")) \
            == sorted(p.name for p in imgs)
