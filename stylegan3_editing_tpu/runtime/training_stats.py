"""Training statistics with collective sync.

Parity: reference torch_utils/training_stats.py — moment-accumulating
report/report0 with a single all-reduce of concatenated counters (:235).
TPU design: jitted code reports scalars into a dict of (count, sum, sum-sq)
moments; `psum_moments` folds them across the mesh with one `lax.psum`; the
host-side `StatsCollector` accumulates and answers mean/std queries.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def moments(x) -> jnp.ndarray:
    """[count, sum, sum-of-squares] of a tensor (fp32)."""
    x = jnp.asarray(x, jnp.float32).ravel()
    return jnp.stack([jnp.asarray(x.size, jnp.float32), jnp.sum(x),
                      jnp.sum(jnp.square(x))])


def psum_moments(stats: Dict[str, jnp.ndarray], axis_name: str
                 ) -> Dict[str, jnp.ndarray]:
    """Cross-device reduction of a stats dict inside pjit/shard_map."""
    stacked = jnp.stack(list(stats.values()))
    summed = jax.lax.psum(stacked, axis_name)
    return dict(zip(stats.keys(), summed))


class StatsCollector:
    """Host-side accumulator over reported moment vectors."""

    def __init__(self):
        self._acc: Dict[str, np.ndarray] = {}

    def report(self, name: str, value) -> None:
        """Accumulate a raw value (host scalar/array or moments vector)."""
        v = np.asarray(value, np.float64)
        if v.shape == (3,):
            m = v
        else:
            flat = v.ravel()
            m = np.array([flat.size, flat.sum(), np.square(flat).sum()])
        self._acc[name] = self._acc.get(name, np.zeros(3)) + m

    def update(self, stats: Dict[str, np.ndarray]) -> None:
        for k, v in stats.items():
            self.report(k, v)

    def names(self):
        return sorted(self._acc)

    def num(self, name: str) -> int:
        return int(self._acc.get(name, np.zeros(3))[0])

    def mean(self, name: str) -> float:
        c, s, _ = self._acc.get(name, np.zeros(3))
        return float(s / c) if c > 0 else float("nan")

    def std(self, name: str) -> float:
        c, s, ss = self._acc.get(name, np.zeros(3))
        if c <= 1:
            return 0.0
        mean = s / c
        var = max(ss / c - mean * mean, 0.0)
        return float(np.sqrt(var))

    def as_dict(self) -> Dict[str, dict]:
        return {k: {"num": self.num(k), "mean": self.mean(k),
                    "std": self.std(k)} for k in self.names()}

    def reset(self) -> None:
        self._acc.clear()
