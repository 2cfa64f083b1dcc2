"""Cross-process streaming statistics (mean/std) with one collective per
dump.

Rewrite of ``utils/torch_utils/training_stats.py`` (``report:62``,
``_sync:250``, ``Collector``): per-key running (num, sum, sum-of-squares)
moments accumulated host-side; in multi-host runs ``sync()`` reduces the
moment vectors with ONE ``jax.lax.psum``-equivalent
(``jax.experimental.multihost_utils`` all-reduce) instead of the
reference's per-key ``all_reduce``.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict

import numpy as np


_NUM_MOMENTS = 3


class StatsCollector:
    def __init__(self):
        self._moments: 'OrderedDict[str, np.ndarray]' = OrderedDict()

    def report(self, name: str, value) -> None:
        value = np.asarray(value, np.float64).reshape(-1)
        if value.size == 0:
            return
        m = np.array([value.size, value.sum(), np.square(value).sum()],
                     np.float64)
        if name in self._moments:
            self._moments[name] += m
        else:
            self._moments[name] = m

    def report0(self, name: str, value) -> None:
        """Report only on process 0 (rank-gated stats)."""
        import jax
        if jax.process_index() == 0:
            self.report(name, value)

    def sync(self) -> None:
        """All-reduce the stacked moment matrix across hosts (no-op on a
        single process)."""
        import jax
        if jax.process_count() <= 1 or not self._moments:
            return
        from jax.experimental import multihost_utils
        names = list(self._moments)
        stacked = np.stack([self._moments[n] for n in names])
        summed = multihost_utils.process_allgather(stacked).sum(axis=0)
        for i, n in enumerate(names):
            self._moments[n] = summed[i]

    def mean(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0:
            return float('nan')
        return float(m[1] / m[0])

    def std(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0:
            return float('nan')
        mean = m[1] / m[0]
        var = max(m[2] / m[0] - mean**2, 0.0)
        return float(np.sqrt(var))

    def as_dict(self) -> dict:
        return {n: {'num': int(m[0]), 'mean': self.mean(n),
                    'std': self.std(n)} for n, m in self._moments.items()}

    def reset(self) -> None:
        self._moments.clear()


_default = StatsCollector()


def report(name, value):
    _default.report(name, value)


def report0(name, value):
    _default.report0(name, value)


def default_collector() -> StatsCollector:
    return _default
