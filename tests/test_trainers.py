"""End-to-end trainer tests on a tiny synthetic ACDC tree (CPU)."""
import jax
import numpy as np
import pytest

from dct_tpu.data import MedicalImageDataset
from dct_tpu.losses import get_loss_fn
from dct_tpu.models import Segmentator
from dct_tpu.train import CoTrainer, Trainer

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
    return {"train": tr, "val": va}


class TestSupervisedTrainer:
    def test_two_epoch_run(self, datasets, tmp_path):
        seg = Segmentator(ARCH, ADAM, STEP, jax.random.PRNGKey(0),
                          input_shape=(1, 32, 32, 1))
        tr = Trainer(seg, datasets, get_loss_fn("cross_entropy"),
                     max_epoch=2, save_dir=tmp_path / "run", batch_size=4,
                     axises=[1, 2, 3])
        df = tr.start_training()
        assert len(df) == 2
        assert (tmp_path / "run" / "metrics.csv").exists()
        assert (tmp_path / "run" / "best.ckpt").exists()
        assert (tmp_path / "run" / "last.ckpt").exists()
        # dice values are sane
        assert 0.0 <= df["val_dice_1"].iloc[-1] <= 1.0
        # training made progress on the (easy) synthetic task
        assert df["train_loss"].iloc[-1] < df["train_loss"].iloc[0]

    def test_resume(self, datasets, tmp_path):
        seg = Segmentator(ARCH, ADAM, STEP, jax.random.PRNGKey(0),
                          input_shape=(1, 32, 32, 1))
        run = tmp_path / "run2"
        Trainer(seg, datasets, get_loss_fn("cross_entropy"), max_epoch=1,
                save_dir=run, batch_size=4, axises=[1, 2, 3]).start_training()
        seg2 = Segmentator(ARCH, ADAM, STEP, jax.random.PRNGKey(1),
                           input_shape=(1, 32, 32, 1))
        tr2 = Trainer(seg2, datasets, get_loss_fn("cross_entropy"), max_epoch=2,
                      save_dir=run, batch_size=4, axises=[1, 2, 3],
                      checkpoint=str(run / "last.ckpt"))
        assert tr2.start_epoch == 1
        df = tr2.start_training()
        # the resumed run reloads epoch 0's row and appends epoch 1 — the
        # CSV keeps absolute epoch numbering instead of restarting at 0
        assert list(df["epoch"]) == [0, 1]
        import pandas as pd
        csv = pd.read_csv(run / "metrics.csv")
        assert list(csv["epoch"]) == [0, 1]


class TestCoTrainer:
    def _build(self, datasets, tmp_path, n_iters=6, max_epoch=2, checkpoint=None,
               **kw):
        segs = [Segmentator(ARCH, ADAM, STEP, jax.random.PRNGKey(i),
                            input_shape=(1, 32, 32, 1)) for i in range(2)]
        labeled = [datasets["train"].filter_by_patterns(
                       [f"patient{p:03d}" for p in ids])
                   for ids in ([1, 2, 3], [3, 4, 5])]
        unlab = datasets["train"].filter_by_patterns(
            [f"patient{p:03d}" for p in range(6, 11)])
        criterions = {"sup": get_loss_fn("cross_entropy"),
                      "jsd": get_loss_fn("jsd"), "adv": get_loss_fn("jsd")}
        return CoTrainer(
            segs, labeled, unlab, datasets["val"], criterions,
            max_epoch=max_epoch, checkpoint=checkpoint,
            save_dir=tmp_path / "cotrain", axises=[1, 2, 3],
            cot_scheduler_dict={"name": "RampScheduler", "begin_epoch": 0,
                                "max_epoch": 50, "max_value": 0.5, "ramp_mult": -5},
            adv_scheduler_dict={"name": "RampScheduler", "begin_epoch": 0,
                                "max_epoch": 50, "max_value": 0.05, "ramp_mult": -5},
            adv_training_dict={"eplision": 0.03},
            batch_size=4, iters_per_epoch=n_iters, **kw)

    def test_full_cotraining(self, datasets, tmp_path):
        ct = self._build(datasets, tmp_path)
        df = ct.start_training(train_jsd=True, train_adv=True)
        assert len(df) == 2
        for i in range(2):
            assert (tmp_path / "cotrain" / f"best_{i}.ckpt").exists()
            assert (tmp_path / "cotrain" / f"metrics_{i}.csv").exists()
        assert np.isfinite(df["jsd_loss"]).all()
        assert np.isfinite(df["adv_loss"]).all()
        assert (df["adv_loss"] >= 0).all()
        # supervised-only sanity: losses finite and dice in range
        assert 0.0 <= df["val_batch_dice_0_1"].iloc[-1] <= 1.0

    def test_chunked_epoch_dispatch(self, datasets, tmp_path):
        """Trainer.iters_per_dispatch splits the epoch into equal jit calls
        (the workaround for the tunnel worker dying on ~2-minute single
        dispatches at 512², BASELINE.md): 6 iters in 2 chunks of 3 must
        train end-to-end with finite losses and produce the same artifact
        set as the single-call epoch."""
        ct = self._build(datasets, tmp_path, n_iters=6, max_epoch=1,
                         iters_per_dispatch=3)
        df = ct.start_training(train_jsd=True, train_adv=True)
        assert len(df) == 1
        assert np.isfinite(df["jsd_loss"]).all()
        assert np.isfinite(df["adv_loss"]).all()
        assert (tmp_path / "cotrain" / "best_0.ckpt").exists()

    def test_save_train_val_dumps(self, datasets, tmp_path):
        """``save_train``/``save_val`` must materialize PNG class maps
        (VERDICT r4 missing #2): model i dumps its own labeled stream under
        train/<i>/, every model dumps unlab/<i>/ when JSD is on, and eval
        dumps per-model val maps — mirroring
        ref:cotraining_totalloss.py:214-216,229-231,301-303."""
        ct = self._build(datasets, tmp_path, max_epoch=1)
        ct.start_training(train_jsd=True, train_adv=False,
                          save_train=True, save_val=True)
        root = tmp_path / "cotrain" / "iter000"
        for i in range(2):
            train_pngs = list((root / "train" / str(i)).glob("*.png"))
            assert len(train_pngs) == len(ct.lab_dev[i]), (i, len(train_pngs))
            unlab_pngs = list((root / "unlab" / str(i)).glob("*.png"))
            assert len(unlab_pngs) == len(ct.unlab_dev), (i, len(unlab_pngs))
            eval_pngs = list((root / "eval" / str(i)).glob("*.png"))
            assert len(eval_pngs) == len(ct.val_dev), (i, len(eval_pngs))
        # dumps are class maps over the label alphabet, not colorized RGB
        from PIL import Image
        arr = np.asarray(Image.open(train_pngs[0]))
        assert arr.ndim == 2 and arr.max() < ct.C

    def test_sup_only_mode(self, datasets, tmp_path):
        ct = self._build(datasets, tmp_path)
        df = ct.start_training(train_jsd=False, train_adv=False)
        assert (df["jsd_loss"] == 0).all()
        assert (df["adv_loss"] == 0).all()

    def test_eval_all_models_matches_per_model(self, datasets, tmp_path):
        ct = self._build(datasets, tmp_path)
        got = ct._eval_epoch(0)
        for s, st in enumerate(ct._unstack_model_states()):
            ref = ct.eval_all(st["params"], st["batch_stats"], ct.val_dev.img,
                              ct.val_dev.gt, ct._val_idx, ct._val_mask)
            d2 = np.asarray(ref["dice2d"])[ct.val_buckets.mask].mean(0)
            assert np.allclose(got["dice2d"][s], d2, atol=1e-5)
            assert np.allclose(got["dice3d"][s],
                               np.asarray(ref["dice3d"]).mean(0), atol=1e-5)

    def test_resume_appends_history(self, datasets, tmp_path):
        ct = self._build(datasets, tmp_path, max_epoch=1)
        ct.start_training(train_jsd=True, train_adv=False)
        ct2 = self._build(datasets, tmp_path, max_epoch=2,
                          checkpoint=str(tmp_path / "cotrain"))
        assert ct2.start_epoch == 1
        df = ct2.start_training(train_jsd=True, train_adv=False)
        assert list(df["epoch"]) == [0, 1]
        import pandas as pd
        csv = pd.read_csv(tmp_path / "cotrain" / "metrics.csv")
        assert list(csv["epoch"]) == [0, 1]
