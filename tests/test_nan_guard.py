"""check_finite_losses: the per-epoch training-loss health guard.

Motivated by the tunnel chip's fresh-compile NaN binaries (BASELINE.md 512²
ladder triage, 2026-08-21): a silently-NaN run wastes hours and poisons
checkpoints. The guard reads the already-fetched host-side loss metrics, so
it costs nothing per epoch.
"""
from __future__ import annotations

import numpy as np
import pytest

from dct_tpu.utils.general import check_finite_losses


def test_healthy_losses_pass():
    assert check_finite_losses({"sup": np.array([0.5, 0.4]), "jsd": 0.01}, 0)


@pytest.mark.parametrize("bad", [float("nan"), float("inf"), -float("inf")])
def test_warn_returns_false(bad, capsys):
    ok = check_finite_losses({"sup": np.array([0.5, bad])}, 7, "warn")
    assert not ok
    assert "epoch 7" in capsys.readouterr().out


def test_abort_raises():
    with pytest.raises(FloatingPointError):
        check_finite_losses({"adv": float("nan")}, 3, "abort")


def test_ignore_is_silent(capsys):
    assert not check_finite_losses({"adv": float("nan")}, 3, "ignore")
    assert capsys.readouterr().out == ""


def test_trainers_expose_nan_policy():
    """Every trainer accepts nan_policy and the guard is called in its
    epoch loop (grep-level pin so the wiring can't silently regress)."""
    import inspect

    from dct_tpu.train.cotrainer import CoTrainer
    from dct_tpu.train.trainer import Trainer
    from dct_tpu.train.mean_teacher import MeanTeacherTrainer
    from dct_tpu.train.vat import VatTrainer
    from dct_tpu.train.city import CoTrainerCity

    for cls in (CoTrainer, Trainer, MeanTeacherTrainer, VatTrainer,
                CoTrainerCity):
        assert "nan_policy" in inspect.signature(cls.__init__).parameters, cls
        assert "check_finite_losses" in inspect.getsource(
            inspect.getmodule(cls)), cls
