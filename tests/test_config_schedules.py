"""Tests for the config system and weight/LR schedules (ref parity)."""
import math

import pytest

from dct_tpu import schedules
from dct_tpu.config import dict_merge, flatten_dict, parse_dotted_arg, parse_value


class TestConfig:
    def test_parse_value_types(self):
        assert parse_value("1") == 1
        assert parse_value("0.5") == 0.5
        assert parse_value("True") is True
        assert parse_value("[1,2,3]") == [1, 2, 3]
        assert parse_value("hello") == "hello"

    def test_dotted_override(self):
        assert parse_dotted_arg("A.B.C=4") == {"A": {"B": {"C": 4}}}
        assert parse_dotted_arg("Trainer.save_dir=runs/x") == {
            "Trainer": {"save_dir": "runs/x"}}

    def test_merge_nested(self):
        base = {"A": {"x": 1, "y": 2}, "B": 3}
        out = dict_merge(base, {"A": {"y": 5}})
        assert out == {"A": {"x": 1, "y": 5}, "B": 3}
        assert base["A"]["y"] == 2  # no mutation

    def test_merge_none(self):
        assert dict_merge({"a": 1}, None) == {"a": 1}

    def test_flatten(self):
        assert flatten_dict({"a": {"b": 1}, "c": 2}) == {"a.b": 1, "c": 2}

    def test_bad_override(self):
        with pytest.raises(ValueError):
            parse_dotted_arg("no_equals_sign")


class TestWeightSchedulers:
    def test_ramp_values(self):
        # ACDC cot default: begin 0, max_epoch 50, max 0.5, mult -5
        s = schedules.RampScheduler(0, 50, 0.5, -5)
        assert s.value == 0.5 * math.exp(-5.0)  # epoch 0
        for _ in range(50):
            s.step()
        assert s.value == 0.5
        s2 = schedules.RampScheduler(20, 50, 0.05, -5)
        assert s2.value == 0.0  # before begin

    def test_ramp_monotone(self):
        s = schedules.RampScheduler(0, 50, 0.5, -5)
        prev = -1.0
        for _ in range(60):
            assert s.value >= prev
            prev = s.value
            s.step()

    def test_constant(self):
        s = schedules.ConstantScheduler(begin_epoch=3, max_value=2.0)
        vals = []
        for _ in range(5):
            vals.append(s.value)
            s.step()
        assert vals == [0.0, 0.0, 0.0, 2.0, 2.0]

    def test_rampdown(self):
        s = schedules.RampDownScheduler(100, 1.0, -5, 0.1, 50)
        assert s.value == 1.0  # epoch 0
        for _ in range(50):
            s.step()
        assert s.value == 0.1

    def test_state_dict_roundtrip(self):
        s = schedules.RampScheduler(0, 50, 0.5, -5)
        for _ in range(7):
            s.step()
        s2 = schedules.RampScheduler(0, 50, 0.5, -5)
        s2.load_state_dict(s.state_dict())
        assert s2.epoch == 7 and s2.value == s.value

    def test_registry(self):
        s = schedules.get_weight_scheduler(
            {"name": "RampScheduler", "begin_epoch": 0, "max_epoch": 50,
             "max_value": 0.5, "ramp_mult": -5})
        assert isinstance(s, schedules.RampScheduler)


class TestLRSchedules:
    def test_step_lr(self):
        lr = schedules.step_lr(1e-3, step_size=90, gamma=0.1)
        assert lr(0) == 1e-3
        assert lr(89) == 1e-3
        assert abs(lr(90) - 1e-4) < 1e-12
        assert abs(lr(180) - 1e-5) < 1e-13

    def test_multi_step(self):
        lr = schedules.multi_step_lr(1.0, [2, 4], 0.5)
        assert [lr(e) for e in range(5)] == [1.0, 1.0, 0.5, 0.5, 0.25]

    def test_polynomial(self):
        lr = schedules.polynomial_lr(1.0, max_epoch=10, power=1.0)
        assert lr(0) == 1.0 and abs(lr(5) - 0.5) < 1e-12 and lr(10) == 0.0

    def test_from_config(self):
        lr = schedules.get_lr_schedule({"name": "StepLR", "step_size": 90, "gamma": 0.1}, 1e-3)
        assert lr(0) == 1e-3
        with pytest.raises(KeyError):
            schedules.get_lr_schedule({"name": "Bogus"}, 1.0)
