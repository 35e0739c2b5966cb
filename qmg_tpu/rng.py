"""Deterministic host-side random number generation.

The reference seeds ``std::mt19937 generator(1337u)`` in every test and
draws gaussian/uniform fills through quantum-linalg's gaussian()/
random_uniform() (SURVEY.md section 2.9; e.g. tests/n13_wilson_kcycle/
wilson_kcycle.cpp:64). quantum-linalg is not vendored in the reference
repo, so bit-exact stream parity is not reproducible; this framework keeps
the same *structure* (a single seeded generator threaded through setup, so
every run is deterministic) with NumPy's MT19937 as the engine.

All draws happen on host and fill fields in flat eo order (parity, y, xh,
dof innermost), matching the reference's flat-vector fill order.
"""

from __future__ import annotations

import numpy as np

__all__ = ["QMGRandom", "DEFAULT_SEED"]

DEFAULT_SEED = 1337


class QMGRandom:
    """A seeded mt19937 stream with the fill primitives the tests need."""

    def __init__(self, seed: int = DEFAULT_SEED):
        self.gen = np.random.Generator(np.random.MT19937(seed))

    def gaussian_cv(self, lat, deviation: float = 1.0) -> np.ndarray:
        """Complex gaussian color vector, (2, Y, Xh, nc).

        Each real component ~ N(0, deviation) (quantum-linalg ``gaussian``).
        """
        shape = lat.cv_shape()
        re = self.gen.normal(0.0, deviation, size=shape)
        im = self.gen.normal(0.0, deviation, size=shape)
        return re + 1j * im

    def gaussian_real(self, shape, deviation: float = 1.0) -> np.ndarray:
        return self.gen.normal(0.0, deviation, size=shape)

    def uniform(self, shape, low: float, high: float) -> np.ndarray:
        return self.gen.uniform(low, high, size=shape)

    def normal_scalar(self, deviation: float = 1.0) -> float:
        return float(self.gen.normal(0.0, deviation))
