"""Run observability: scalar writers + throughput meter.

The reference logs through four channels (SURVEY §5): tqdm postfix,
tensorboardX scalars (ref:cotraining_totalloss.py:69,444-450), per-epoch .npy
dumps and pandas CSVs. The TPU rebuild keeps CSV/.npy (trainers) and provides:

* ``ScalarWriter`` — JSONL always; TensorBoard events too when
  ``torch.utils.tensorboard`` is importable (it is in this image). Epoch
  granularity only — nothing syncs inside the hot loop.
* ``RateMeter`` — images/sec accounting (throughput is the north-star metric).
* ``trace_epoch`` — optional ``jax.profiler`` trace context for on-demand
  profiling (the reference has no profiler hooks at all).
"""
from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Dict, Optional, Union


class ScalarWriter:
    def __init__(self, logdir: Union[str, Path]) -> None:
        self.logdir = Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.logdir / "scalars.jsonl", "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(str(self.logdir))
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(json.dumps({"tag": tag, "value": float(value),
                                      "step": int(step)}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def add_scalars(self, main_tag: str, tag_scalar_dict: Dict[str, float],
                    step: int) -> None:
        """tensorboardX add_scalars parity (ref:cotraining_totalloss.py:449-450)."""
        for k, v in tag_scalar_dict.items():
            self.add_scalar(f"{main_tag}/{k}", v, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class RateMeter:
    """Streaming images/sec with exponential smoothing."""

    def __init__(self, alpha: float = 0.9) -> None:
        self.alpha = alpha
        self.rate: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, n_images: int) -> float:
        assert self._t0 is not None, "call start() first"
        dt = time.perf_counter() - self._t0
        inst = n_images / max(dt, 1e-9)
        self.rate = inst if self.rate is None else (
            self.alpha * self.rate + (1 - self.alpha) * inst)
        self._t0 = None
        return inst


@contextlib.contextmanager
def trace_epoch(logdir: Union[str, Path, None]):
    """``with trace_epoch('runs/x/trace'): ...`` captures a jax profiler trace
    for the wrapped epoch (view with tensorboard or xprof)."""
    if logdir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def resume_records(csv_path: Union[str, Path], start_epoch: int) -> list:
    """Rows (list of dicts, with their absolute ``epoch``) from a prior run's
    metrics CSV, up to ``start_epoch`` — so a resumed trainer *appends* to its
    metric history instead of restarting the CSV at relative epoch 0."""
    path = Path(csv_path)
    if start_epoch <= 0 or not path.exists():
        return []
    import pandas as pd
    try:
        df = pd.read_csv(path)
    except Exception:
        return []
    if "epoch" not in df.columns:
        return []
    return df[df["epoch"] < start_epoch].to_dict("records")
