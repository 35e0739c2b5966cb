"""Physics measurement pipeline: propagators -> folded pion correlator ->
effective goldstone mass.

Packages the measurement stream of reference tests n15/n16/n20
(tests/n15_wilson_goldstone_u1_heatbath/wilson_u1.cpp:100-210,
tests/n16_wilson_kcycle_heatbath, tests/n20_staggered_goldstone...):
per-parity point (or gaussian wall) sources, a solve of D prop = src, the
per-timeslice norm^2 correlator, y -> Y-y folding, and the cosh effective
mass. Reference physics values to reproduce live in the shipped
critical_mass.txt files (BASELINE.md).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .lattice import Lattice2D
from .reductions import norm2sq_timeslice

__all__ = ["point_source", "fold_correlator", "pion_correlator",
           "effective_mass", "effective_mass_cosh"]


def point_source(lat: Lattice2D, x: int, y: int, color: int) -> jnp.ndarray:
    # Validate eagerly: jax .at[] silently clamps out-of-bounds indices.
    if not (0 <= x < lat.x_len and 0 <= y < lat.y_len
            and 0 <= color < lat.nc):
        raise ValueError(f"point source ({x},{y},c={color}) outside "
                         f"{lat.x_len}x{lat.y_len} nc={lat.nc}")
    src = jnp.zeros(lat.cv_shape(), dtype=jnp.complex128)
    p, yy, xh = lat.coord_to_pyx(x, y)
    return src.at[p, yy, xh, color].set(1.0)


def fold_correlator(corr) -> np.ndarray:
    """Symmetrize about the midpoint: c[j] = c[Y-j] = (c[j]+c[Y-j])/2
    (reference n15:141-146)."""
    c = np.array(corr, dtype=np.float64)
    ylen = len(c)
    for j in range(1, ylen // 2):
        t = 0.5 * (c[j] + c[ylen - j])
        c[j] = c[ylen - j] = t
    return c


def pion_correlator(solve, lat: Lattice2D, sources) -> np.ndarray:
    """Sum of folded per-timeslice |prop|^2 over the given sources.

    ``solve(src) -> prop`` is any inverter closure (BiCGstab(l) in n15,
    the MG K-cycle in n16).
    """
    total = np.zeros(lat.y_len)
    for src in sources:
        prop = solve(src)
        corr = np.asarray(norm2sq_timeslice(prop))
        total += fold_correlator(corr)
    return total


def effective_mass(corr) -> np.ndarray:
    """Naive log effective mass m_eff(t) = log(c[t]/c[t+1])."""
    c = np.asarray(corr)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.log(c[:-1] / c[1:])


def effective_mass_acosh(corr) -> np.ndarray:
    """acosh effective mass: m(t) = acosh((c[t+1]+c[t-1])/(2 c[t])) -
    the reference's reported form (n15 wilson_u1.cpp:223-229)."""
    c = np.asarray(corr, dtype=np.float64)
    out = np.full(len(c), np.nan)
    with np.errstate(invalid="ignore"):
        for t in range(1, len(c) - 1):
            r = (c[t + 1] + c[t - 1]) / (2.0 * c[t])
            if r >= 1.0:
                out[t] = np.arccosh(r)
    return out


def effective_mass_cosh(corr) -> np.ndarray:
    """cosh effective mass: solve c[t+1]/c[t] = cosh(m(T/2-t-1))/
    cosh(m(T/2-t)) per t (periodic correlator), by bisection."""
    c = np.asarray(corr, dtype=np.float64)
    T = len(c)
    out = np.full(T - 1, np.nan)
    for t in range(T - 1):
        ratio = c[t + 1] / c[t]
        if not np.isfinite(ratio) or ratio <= 0:
            continue

        def f(m):
            return (np.cosh(m * (T / 2 - (t + 1)))
                    / np.cosh(m * (T / 2 - t))) - ratio

        lo, hi = 1e-8, 10.0
        if f(lo) * f(hi) > 0:
            continue
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            if f(lo) * f(mid) <= 0:
                hi = mid
            else:
                lo = mid
        out[t] = 0.5 * (lo + hi)
    return out
