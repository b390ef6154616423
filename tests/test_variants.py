"""Mean-teacher / VAT trainer + summary.py integration tests (tiny synthetic data)."""
import jax
import numpy as np
import pytest

from dct_tpu.data import MedicalImageDataset
from dct_tpu.losses import get_loss_fn
from dct_tpu.models import Segmentator
from dct_tpu.train import MeanTeacherTrainer, VatTrainer

from helpers import make_synthetic_acdc

ADAM = {"name": "Adam", "lr": 1e-3, "weight_decay": 1e-4}
STEP = {"name": "StepLR", "step_size": 90, "gamma": 0.1}
ARCH = {"name": "enet", "num_classes": 4}


@pytest.fixture(scope="module")
def acdc_root(tmp_path_factory):
    return make_synthetic_acdc(tmp_path_factory.mktemp("acdc"), size=32)


@pytest.fixture(scope="module")
def datasets(acdc_root):
    tr = MedicalImageDataset(acdc_root, "train", transform=(32, 32), quite=True)
    va = MedicalImageDataset(acdc_root, "val", transform=(32, 32), quite=True)
    lab = tr.filter_by_patterns([f"patient{p:03d}" for p in range(1, 6)])
    unlab = tr.filter_by_patterns([f"patient{p:03d}" for p in range(6, 11)])
    return lab, unlab, va


class TestMeanTeacher:
    def test_two_epochs(self, datasets, tmp_path):
        lab, unlab, val = datasets
        student = Segmentator(ARCH, ADAM, STEP, jax.random.PRNGKey(0),
                              input_shape=(1, 32, 32, 1))
        teacher = Segmentator(ARCH, ADAM, STEP, jax.random.PRNGKey(1),
                              input_shape=(1, 32, 32, 1))
        t0_snapshot = [np.asarray(x) for x in
                       jax.tree_util.tree_leaves(teacher.state["params"])]
        mt = MeanTeacherTrainer(student, teacher, lab, unlab, val,
                                {"sup": get_loss_fn("cross_entropy"), "con": "mse"},
                                max_epoch=2, save_dir=tmp_path / "mt",
                                axises=[1, 2, 3], batch_size=4,
                                cot_scheduler_dict={"name": "RampScheduler",
                                                    "begin_epoch": 0, "max_epoch": 80,
                                                    "max_value": 1.0, "ramp_mult": -5})
        df = mt.start_training()
        assert len(df) == 2
        assert (tmp_path / "mt" / "last.ckpt").exists()
        assert list((tmp_path / "mt").glob("best_*.ckpt"))
        assert np.isfinite(df["tra_con_loss"]).all()
        # teacher must have moved toward the student (EMA)
        t1 = [np.asarray(x) for x in
              jax.tree_util.tree_leaves(mt.state["teacher"]["params"])]
        assert any(not np.allclose(a, b) for a, b in zip(t0_snapshot, t1))


class TestVatTrainer:
    def test_two_epochs_adv(self, datasets, tmp_path):
        lab, unlab, val = datasets
        seg = Segmentator(ARCH, ADAM, STEP, jax.random.PRNGKey(0),
                          input_shape=(1, 32, 32, 1))
        vt = VatTrainer(seg, lab, unlab, val, get_loss_fn("cross_entropy"),
                        max_epoch=2, save_dir=tmp_path / "vat", axises=[1, 2, 3],
                        adv_scheduler_dict={"name": "ConstantScheduler",
                                            "begin_epoch": 0, "max_value": 0.05},
                        adv_training_dict={"eplision": 2.0, "ip": 1},
                        batch_size=4)
        df = vt.start_training(train_adv=True)
        assert len(df) == 2
        assert (tmp_path / "vat" / "best.ckpt").exists()
        assert (df["adv_loss"].abs() > 0).any()
        assert np.isfinite(df["adv_loss"]).all()


class TestSummary:
    def test_ensemble_eval(self, acdc_root, datasets, tmp_path):
        # train a 2-model cotrainer for 1 epoch, then run summary.py main()
        from dct_tpu.train import CoTrainer
        lab, unlab, val = datasets
        segs = [Segmentator(ARCH, ADAM, STEP, jax.random.PRNGKey(i),
                            input_shape=(1, 32, 32, 1)) for i in range(2)]
        run = tmp_path / "cot"
        ct = CoTrainer(segs, [lab, lab.subset(range(len(lab)))], unlab, val,
                       {"sup": get_loss_fn("cross_entropy"),
                        "jsd": get_loss_fn("jsd"), "adv": get_loss_fn("jsd")},
                       max_epoch=1, save_dir=run, axises=[1, 2, 3],
                       batch_size=4, iters_per_epoch=4,
                       whole_config={"Dataset": {"root_dir": str(acdc_root),
                                                 "subfolders": ["img", "gt"],
                                                 "transform": "segment_transform((32,32))"}})
        ct.start_training(train_jsd=True)

        import summary as summary_mod
        out = summary_mod.main(["--input_dir", str(run),
                                "--dataset_root", str(acdc_root),
                                "--ensemble_method", "soft"])
        assert (run / "summary.csv").exists()
        assert (run / "bsummary.csv").exists()
        assert (run / "div.csv").exists()
        b = out["bsummary"]
        assert "ens_DSC1" in b.columns
        assert 0.0 <= b.loc["mean", "ens_DSC1"] <= 1.0
        # hard voting path too
        out2 = summary_mod.main(["--input_dir", str(run),
                                 "--dataset_root", str(acdc_root),
                                 "--ensemble_method", "hard"])
        assert "ens_DSC1" in out2["bsummary"].columns

    def test_voting_functions(self):
        from summary import hard_voting, soft_voting
        rs = np.random.RandomState(0)
        probs = rs.rand(3, 2, 4, 4, 3).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        s = soft_voting(probs)
        h = hard_voting(probs)
        assert s.shape == h.shape == (2, 4, 4)
        # all models agree → both votes return that class
        agree = np.zeros((2, 1, 4, 4, 3))
        agree[..., 2] = 1.0
        agree = np.repeat(agree, 3, axis=1).transpose(1, 0, 2, 3, 4)
        assert (soft_voting(agree) == 2).all()
        assert (hard_voting(agree) == 2).all()

    def test_hausdorff(self):
        from summary import hausdorff_distance
        a = np.zeros((8, 8), bool)
        b = np.zeros((8, 8), bool)
        a[2, 2] = True
        b[2, 5] = True
        assert hausdorff_distance(a, b) == 3.0
        assert hausdorff_distance(a, a) == 0.0
        assert np.isnan(hausdorff_distance(a, np.zeros((8, 8), bool)))


class TestVariantResume:
    """Resume-append coverage for the mean-teacher and VAT trainers
    (Trainer/CoTrainer equivalents live in test_trainers.py)."""

    def _mt(self, datasets, run, max_epoch, checkpoint=None):
        lab, unlab, val = datasets
        student = Segmentator(ARCH, ADAM, STEP, jax.random.PRNGKey(0),
                              input_shape=(1, 32, 32, 1))
        teacher = Segmentator(ARCH, ADAM, STEP, jax.random.PRNGKey(1),
                              input_shape=(1, 32, 32, 1))
        return MeanTeacherTrainer(
            student, teacher, lab, unlab, val,
            {"sup": get_loss_fn("cross_entropy"), "con": "mse"},
            max_epoch=max_epoch, save_dir=run, axises=[1, 2, 3], batch_size=4,
            checkpoint=checkpoint,
            cot_scheduler_dict={"name": "RampScheduler", "begin_epoch": 0,
                                "max_epoch": 80, "max_value": 1.0,
                                "ramp_mult": -5})

    def test_mean_teacher_resume_appends(self, datasets, tmp_path):
        import pandas as pd
        run = tmp_path / "mt_resume"
        self._mt(datasets, run, 1).start_training()
        mt2 = self._mt(datasets, run, 2, checkpoint=str(run / "last.ckpt"))
        assert mt2.start_epoch == 1
        df = mt2.start_training()
        assert list(df["epoch"]) == [0, 1]
        csv = pd.read_csv(run / mt2.metricname)
        assert list(csv["epoch"]) == [0, 1]

    def _vat(self, datasets, run, max_epoch, checkpoint=None):
        lab, unlab, val = datasets
        seg = Segmentator(ARCH, ADAM, STEP, jax.random.PRNGKey(0),
                          input_shape=(1, 32, 32, 1))
        return VatTrainer(seg, lab, unlab, val,
                          get_loss_fn("cross_entropy"),
                          max_epoch=max_epoch, save_dir=run, axises=[1, 2, 3],
                          checkpoint=checkpoint,
                          adv_scheduler_dict={"name": "ConstantScheduler",
                                              "begin_epoch": 0,
                                              "max_value": 0.05},
                          adv_training_dict={"eplision": 2.0, "ip": 1},
                          batch_size=4)

    def test_vat_resume_appends(self, datasets, tmp_path):
        import pandas as pd
        run = tmp_path / "vat_resume"
        self._vat(datasets, run, 1).start_training(train_adv=True)
        vt2 = self._vat(datasets, run, 2, checkpoint=str(run / "last.ckpt"))
        assert vt2.start_epoch == 1
        df = vt2.start_training(train_adv=True)
        assert list(df["epoch"]) == [0, 1]
        csv = pd.read_csv(run / vt2.metricname)
        assert list(csv["epoch"]) == [0, 1]
