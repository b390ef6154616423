"""Metrics: dice meters, IoU/confusion, kappa diversity, streaming averages.

Rebuild of ref:generalframework/metrics/ (+ the near-duplicate metrics2/,
collapsed into one module — the only delta there was DiceMeter.summary's
shape, reproduced via ``detailed=True``).

TPU split of labor: the *per-batch reductions* (dice/intersections) are
computed **inside the jitted steps** and land here as small numpy arrays; the
meters are plain host accumulators — no device syncs in the hot loop
(contrast ref:cotraining_totalloss.py:250-264, which calls ``.item()``/
``.cpu()`` every iteration).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# AverageValueMeter (ref:metrics/averagemeter.py:3-48)
# ---------------------------------------------------------------------------

class AverageValueMeter:
    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.n = 0
        self.sum = 0.0
        self.var = 0.0

    def add(self, value: float, n: int = 1) -> None:
        value = float(value)
        self.n += n
        self.sum += value * n
        self.var += value * value * n

    def value(self):
        if self.n == 0:
            return np.nan, np.nan
        mean = self.sum / self.n
        std = np.sqrt(max(self.var / self.n - mean * mean, 0.0))
        return mean, std


# ---------------------------------------------------------------------------
# DiceMeter (ref:metrics/dice_meter.py:36-83)
# ---------------------------------------------------------------------------

class DiceMeter:
    """Accumulates per-add dice rows.

    ``method='2d'`` expects (B,C) per-slice dice rows per add; ``'3d'`` expects
    a (C,) per-volume row (whole batch = one patient under the patient
    sampler, ref:dice_meter.py:33). ``value()`` → ((report_mean, report_std),
    (per-class means, per-class stds)).
    """

    def __init__(self, method: str = "2d", report_axises: Union[str, List[int]] = "all",
                 C: int = 4) -> None:
        assert method in ("2d", "3d")
        assert report_axises == "all" or isinstance(report_axises, list)
        self.method = method
        self.report_axis = report_axises
        self.C = C
        self.reset()

    def reset(self) -> None:
        self._log: List[np.ndarray] = []

    def add(self, dice_values) -> None:
        d = np.asarray(dice_values, dtype=np.float32)
        if d.ndim == 1:
            d = d[None, :]
        assert d.ndim == 2 and d.shape[1] == self.C, d.shape
        self._log.append(d)

    @property
    def log(self) -> np.ndarray:
        if not self._log:
            return np.zeros((1, self.C), np.float32)
        return np.concatenate(self._log, axis=0)

    def value(self):
        log = self.log
        means = log.mean(0)
        stds = log.std(0)
        if self.report_axis == "all":
            report = log.mean(1)
        else:
            report = log[:, self.report_axis].mean(1)
        return (report.mean(), report.std()), (means, stds)

    def summary(self, detailed: bool = False) -> Dict[str, float]:
        (mean, std), (cls_means, _) = self.value()
        if detailed:  # metrics2 variant (ref:metrics2/dice_meter.py:81-84)
            axes = range(self.C) if self.report_axis == "all" else self.report_axis
            return {"mDSC": float(mean), **{f"DSC{i}": float(cls_means[i]) for i in axes}}
        return {"mDSC": float(mean), "mVars": float(std)}

    def detailed_summary(self) -> Dict[str, float]:
        _, (means, _) = self.value()
        return {f"DSC{i}": float(means[i]) for i in range(len(means))}


# ---------------------------------------------------------------------------
# ConfusionMatrix / IoU (ref:metrics/{confusionmatrix,iou}.py)
# ---------------------------------------------------------------------------

class ConfusionMatrix:
    def __init__(self, num_classes: int, normalized: bool = False,
                 ignore_index: Optional[int] = 255) -> None:
        self.num_classes = num_classes
        self.normalized = normalized
        self.ignore_index = ignore_index
        self.reset()

    def reset(self) -> None:
        self.conf = np.zeros((self.num_classes, self.num_classes), np.int64)

    def add(self, predicted, target) -> None:
        p = np.asarray(predicted).ravel()
        t = np.asarray(target).ravel()
        assert p.shape == t.shape, (p.shape, t.shape)
        keep = (t >= 0) & (t < self.num_classes)
        if self.ignore_index is not None:
            keep &= t != self.ignore_index
        p, t = p[keep], t[keep]
        idx = t * self.num_classes + p
        self.conf += np.bincount(idx, minlength=self.num_classes ** 2).reshape(
            self.num_classes, self.num_classes)

    def value(self) -> np.ndarray:
        if self.normalized:
            conf = self.conf.astype(np.float64)
            return conf / np.maximum(conf.sum(axis=1, keepdims=True), 1e-12)
        return self.conf


class IoU:
    """Streaming mIoU from a confusion matrix (ref:metrics/iou.py:8-113)."""

    def __init__(self, num_classes: int, normalized: bool = False,
                 ignore_index: Optional[int] = 255) -> None:
        self.conf_metric = ConfusionMatrix(num_classes, normalized, ignore_index)

    def reset(self) -> None:
        self.conf_metric.reset()

    def add(self, predicted, target) -> None:
        """predicted: (N,H,W) class map or (N,H,W,C) scores; target: (N,H,W)."""
        p = np.asarray(predicted)
        if p.ndim == 4:
            p = p.argmax(-1)
        self.conf_metric.add(p, np.asarray(target))

    def value(self) -> Dict[str, np.ndarray]:
        hist = self.conf_metric.value().astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            acc = np.diag(hist).sum() / hist.sum()
            acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
            iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist))
            valid = hist.sum(axis=1) > 0
            mean_iu_valid = np.nanmean(iu[valid]) if valid.any() else np.nan
            freq = hist.sum(axis=1) / hist.sum()
            fwavacc = (freq[freq > 0] * iu[freq > 0]).sum()
        return {"Overall_Acc": acc, "Mean_Acc": acc_cls, "FreqW_Acc": fwavacc,
                "Validated_Mean_IoU": mean_iu_valid, "Mean_IoU": np.nanmean(iu),
                "Class_IoU": iu}


# ---------------------------------------------------------------------------
# Cohen kappa diversity (ref:metrics/kappa.py:9-61) — no sklearn dependency
# ---------------------------------------------------------------------------

def cohen_kappa(y1: np.ndarray, y2: np.ndarray) -> float:
    y1 = np.asarray(y1).ravel()
    y2 = np.asarray(y2).ravel()
    classes = np.unique(np.concatenate([y1, y2]))
    if classes.size < 2:
        return np.nan if y1.size == 0 else 1.0
    k = classes.size
    remap = {c: i for i, c in enumerate(classes.tolist())}
    a = np.vectorize(remap.get)(y1)
    b = np.vectorize(remap.get)(y2)
    conf = np.bincount(a * k + b, minlength=k * k).reshape(k, k).astype(np.float64)
    n = conf.sum()
    po = np.diag(conf).sum() / n
    pe = (conf.sum(0) * conf.sum(1)).sum() / (n * n)
    if pe == 1.0:
        return 1.0
    return float((po - pe) / (1 - pe))


class KappaMetrics:
    """Per-model kappa vs the ensemble vote, masked to considered classes —
    the paper's diversity measure (ref:metrics/kappa.py:17-32)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.kappa: List[List[float]] = []

    def add(self, predicts: Sequence[np.ndarray], target: np.ndarray,
            considered_classes: Sequence[int]) -> None:
        target = np.asarray(target).ravel()
        mask = np.isin(target, np.asarray(considered_classes))
        tgt = target[mask]
        scores = [cohen_kappa(np.asarray(p).ravel()[mask], tgt) for p in predicts]
        self.kappa.append(scores)

    def value(self) -> np.ndarray:
        return np.nanmean(np.asarray(self.kappa, np.float64), axis=0)

    def summary(self) -> Dict[str, float]:
        v = self.value()
        return {f"kappa{i}": float(v[i]) for i in range(len(v))}


class Kappa2Annotator:
    """Pairwise kappa between two models on gt-masked pixels
    (ref:metrics/kappa.py:41-61)."""

    def __init__(self) -> None:
        self.kappa: List[float] = []

    def reset(self) -> None:
        self.kappa = []

    def add(self, predict1, predict2, gt, considered_classes=(1, 2, 3)) -> None:
        p1 = np.asarray(predict1).ravel()
        p2 = np.asarray(predict2).ravel()
        if considered_classes is not None:
            mask = np.isin(np.asarray(gt).ravel(), np.asarray(considered_classes))
            p1, p2 = p1[mask], p2[mask]
        self.kappa.append(cohen_kappa(p1, p2))

    def value(self) -> float:
        return float(np.mean(self.kappa))


# ---------------------------------------------------------------------------
# epoch aggregation (ref:metrics/metric.py:32-155)
# ---------------------------------------------------------------------------

class AggregatedMeter:
    """Records one summary dict per epoch → DataFrame."""

    def __init__(self) -> None:
        self.record: List[Dict[str, float]] = []

    def add(self, summary: Dict[str, float]) -> None:
        self.record.append(dict(summary))

    def summary(self) -> pd.DataFrame:
        return pd.DataFrame(self.record)

    def state_dict(self) -> Dict:
        return {"record": self.record}

    def load_state_dict(self, sd: Dict) -> None:
        self.record = list(sd["record"])


class ListAggregatedMeter:
    """Joins many AggregatedMeters column-wise into one CSV
    (ref:metrics/metric.py:101-155)."""

    def __init__(self, names: List[str], meters: List[AggregatedMeter]) -> None:
        assert len(names) == len(meters)
        self.names = names
        self.meters = meters

    def summary(self) -> pd.DataFrame:
        frames = []
        for name, meter in zip(self.names, self.meters):
            df = meter.summary()
            df.columns = [f"{name}_{c}" for c in df.columns]
            frames.append(df)
        return pd.concat(frames, axis=1)

    def to_csv(self, path) -> None:
        self.summary().to_csv(path, index_label="epoch", float_format="%.4f")

    def state_dict(self) -> Dict:
        return {name: m.state_dict() for name, m in zip(self.names, self.meters)}

    def load_state_dict(self, sd: Dict) -> None:
        for name, m in zip(self.names, self.meters):
            m.load_state_dict(sd[name])
