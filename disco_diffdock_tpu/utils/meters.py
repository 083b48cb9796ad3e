"""Metric accumulation + logging conventions.

Parity with ``AverageMeter`` (utils/training.py:64-93) including per-sigma
-interval binning (``test_sigma_intervals``), and the reference's
"HAPPENING | " / "| WARNING: " print conventions routed through ``log``.
"""
from __future__ import annotations

import sys
import time

import numpy as np


class AverageMeter:
    def __init__(self, types, unpooled_metrics: bool = False, intervals: int = 1):
        self.types = list(types)
        self.intervals = intervals
        self.unpooled = unpooled_metrics
        if intervals == 1:
            self.count = 0
            self.acc = {t: 0.0 for t in self.types}
        else:
            self.count = np.zeros((len(self.types), intervals))
            self.acc = {t: np.zeros(intervals) for t in self.types}

    def add(self, vals, interval_idx=None):
        vals = [np.asarray(v) for v in vals]
        if self.intervals == 1:
            self.count += 1 if vals[0].ndim == 0 else len(vals[0])
            for t, v in zip(self.types, vals):
                self.acc[t] += float(v.sum() if self.unpooled else v)
        else:
            for ti, (t, v) in enumerate(zip(self.types, vals)):
                idx = np.asarray(interval_idx[ti])
                np.add.at(self.count[ti], idx, 1.0)
                np.add.at(self.acc[t], idx, np.asarray(v))

    def summary(self) -> dict:
        if self.intervals == 1:
            return {t: self.acc[t] / max(self.count, 1e-12) for t in self.types}
        out = {}
        for i in range(self.intervals):
            for ti, t in enumerate(self.types):
                out[f"int{i}_{t}"] = float(self.acc[t][i] / max(self.count[ti][i], 1e-12))
        return out


def sigma_interval_index(t_values: np.ndarray, intervals: int = 10) -> np.ndarray:
    """Bin diffusion times into intervals (test_epoch's per-sigma metering)."""
    return np.clip((np.asarray(t_values) * intervals).astype(int), 0, intervals - 1)


def log(msg: str, level: str = "info") -> None:
    prefix = {"info": "HAPPENING | ", "warn": "| WARNING: ", "error": "| ERROR: "}[level]
    print(f"{prefix}{msg}", file=sys.stderr if level != "info" else sys.stdout, flush=True)


class Timer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.elapsed = time.perf_counter() - self.t0
