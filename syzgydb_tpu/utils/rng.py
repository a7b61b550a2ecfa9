"""Deterministic RNG shim.

Parity with the reference's myRandomType (settings.go:42-78): when the global
config's random_seed is non-zero, all stochastic choices in the DB (index
plane sampling, stat sampling) become reproducible; when zero, they are seeded
from OS entropy.  ``fork()`` mirrors ThreadsafeNew — derive an independent
child stream so subsystems don't perturb each other's sequences.
"""

from __future__ import annotations

import numpy as np


class MyRandom:
    def __init__(self, seed: int = 0):
        self._seed = seed
        self._rng = np.random.default_rng(seed if seed != 0 else None)

    @property
    def seeded(self) -> bool:
        return self._seed != 0

    def seed(self, seed: int) -> None:
        self._seed = seed
        self._rng = np.random.default_rng(seed if seed != 0 else None)

    def fork(self) -> "MyRandom":
        child = MyRandom.__new__(MyRandom)
        child._seed = self._seed
        child._rng = np.random.default_rng(
            self._rng.integers(0, 2**63 - 1)) if self._seed != 0 \
            else np.random.default_rng()
        return child

    def __getattr__(self, name):
        return getattr(self._rng, name)


# Global instance, reset by config.Configure (settings.go:18-40 analog).
my_random = MyRandom(0)
