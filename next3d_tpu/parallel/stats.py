"""Training statistics collection.

Plays the role of the reference's torch_utils/training_stats.py: per-phase
scalar moments merged across devices. Under GSPMD the in-step reductions
(jnp.mean over the global batch) already produce replicated scalars, so the
collector is purely host-side accumulation of [n, sum(x), sum(x^2)] moments
(reference :58-103) with the same mean/std query API (:115-180).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict

import numpy as np


class StatsCollector:
    def __init__(self):
        self._moments = defaultdict(lambda: np.zeros(3, np.float64))

    def report(self, name: str, value):
        value = np.asarray(value, np.float64).reshape(-1)
        m = self._moments[name]
        m[0] += value.size
        m[1] += value.sum()
        m[2] += np.square(value).sum()

    def report_dict(self, stats: Dict[str, float]):
        for k, v in stats.items():
            self.report(k, v)

    def names(self):
        return sorted(self._moments)

    def num(self, name):
        return int(self._moments[name][0])

    def mean(self, name):
        n, s, _ = self._moments[name]
        return float(s / n) if n else float("nan")

    def std(self, name):
        n, s, s2 = self._moments[name]
        if n == 0:
            return float("nan")
        mean = s / n
        var = max(s2 / n - mean * mean, 0.0)
        return float(np.sqrt(var))

    def as_dict(self):
        return {name: {"num": self.num(name), "mean": self.mean(name),
                       "std": self.std(name)} for name in self.names()}

    def reset(self):
        self._moments.clear()
