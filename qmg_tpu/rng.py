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

__all__ = ["QMGRandom", "StdMT19937", "DEFAULT_SEED"]

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


class StdMT19937:
    """Bit-exact libstdc++ ``std::mt19937`` + distribution streams.

    The reference's determinism anchor is ``std::mt19937 generator(1337u)``
    in every test (e.g. tests/n13_wilson_kcycle/wilson_kcycle.cpp:64).
    This class reproduces the engine (Knuth-LCG seeding + the standard
    twist) and libstdc++'s distribution conventions exactly:

      * generate_canonical<double>: two 32-bit draws, low word first:
        (g0 + g1 * 2^32) / 2^64;
      * uniform_real_distribution(a, b): a + canonical * (b - a);
      * normal_distribution: Marsaglia polar on two canonicals per
        accepted pair, returning y * mult then the saved x * mult.

    Validated against a compiled C++ oracle (tests/test_rng.py).
    """

    N, M = 624, 397
    MATRIX_A = 0x9908B0DF
    UPPER = 0x80000000
    LOWER = 0x7FFFFFFF

    def __init__(self, seed: int = DEFAULT_SEED):
        mt = np.empty(self.N, dtype=np.uint64)
        mt[0] = seed & 0xFFFFFFFF
        for i in range(1, self.N):
            mt[i] = (1812433253 * (mt[i - 1] ^ (mt[i - 1] >> 30)) + i) \
                & 0xFFFFFFFF
        self._mt = mt
        self._idx = self.N
        self._saved_normal = None

    def _refill(self):
        mt = self._mt
        n, m = self.N, self.M
        for i in range(n):
            y = (mt[i] & self.UPPER) | (mt[(i + 1) % n] & self.LOWER)
            mt[i] = (mt[(i + m) % n] ^ (y >> 1)
                     ^ (self.MATRIX_A if (y & 1) else 0)) & 0xFFFFFFFF
        self._idx = 0

    def raw(self) -> int:
        """One tempered 32-bit draw (operator())."""
        if self._idx >= self.N:
            self._refill()
        y = int(self._mt[self._idx])
        self._idx += 1
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y ^= y >> 18
        return y & 0xFFFFFFFF

    def raw_array(self, n: int) -> np.ndarray:
        return np.array([self.raw() for _ in range(n)], dtype=np.uint64)

    def canonical(self) -> float:
        """libstdc++ generate_canonical<double, 53, mt19937>."""
        g0 = self.raw()
        g1 = self.raw()
        return (g0 + g1 * 4294967296.0) / 18446744073709551616.0

    def uniform(self, a: float = 0.0, b: float = 1.0) -> float:
        return a + self.canonical() * (b - a)

    def normal(self, mean: float = 0.0, stddev: float = 1.0) -> float:
        """std::normal_distribution (Marsaglia polar, saved-value cache)."""
        if self._saved_normal is not None:
            v = self._saved_normal
            self._saved_normal = None
            return mean + v * stddev
        while True:
            x = 2.0 * self.canonical() - 1.0
            y = 2.0 * self.canonical() - 1.0
            r2 = x * x + y * y
            if r2 <= 1.0 and r2 != 0.0:
                break
        # math.log/math.sqrt = the C library's log/sqrt - the SAME
        # functions libstdc++'s normal_distribution calls, so the stream
        # is bit-exact vs both the g++ oracle and the native
        # (heatbath.cpp) continuation of this stream. np.log deviates
        # from libm by 1 ulp on some inputs.
        import math
        mult = math.sqrt(-2.0 * math.log(r2) / r2)
        self._saved_normal = x * mult
        return mean + y * mult * stddev

    def reset_normal_cache(self):
        """std::normal_distribution::reset()."""
        self._saved_normal = None

    # QMGRandom-compatible surface for the host heatbath sweep.
    def normal_scalar(self, deviation: float = 1.0) -> float:
        return self.normal(0.0, deviation)
