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


def fit_cosh_mass(corrs, lo: int, hi: int):
    """Jackknifed weighted cosh fit of the pion mass over t in [lo, hi).

    ``corrs``: (n_configs, T) per-configuration folded correlators.
    Fits C(t) = A cosh(m (t - T/2)) by weighted least squares (weights
    1/sigma_t^2 from the per-config scatter of the mean), with
    single-elimination jackknife errors on m. Returns (m, m_err, A).

    Near the critical mass this uses every timeslice of the window
    coherently and is far better conditioned than the pointwise acosh
    plateau average the reference reports (n15 wilson_u1.cpp:223-229);
    both estimators agree well away from criticality.
    """
    from scipy.optimize import curve_fit

    corrs = np.asarray(corrs, dtype=np.float64)
    n, T = corrs.shape
    ts = np.arange(lo, hi, dtype=np.float64)
    sig = corrs[:, lo:hi].std(axis=0, ddof=1) / np.sqrt(n)
    sig = np.where(sig > 0, sig, np.nanmax(sig) if np.nanmax(sig) > 0
                   else 1.0)

    def model(t, A, m):
        return A * np.cosh(m * (t - T / 2.0))

    def one_fit(c):
        c = c[lo:hi]
        # acosh seed from the window midpoint (guards handle r < 1).
        mid = len(c) // 2
        r = ((c[mid + 1] + c[mid - 1]) / (2.0 * c[mid])
             if 0 < mid < len(c) - 1 else 1.1)
        m0 = float(np.arccosh(r)) if r > 1.0 else 0.1
        A0 = c[mid] / np.cosh(m0 * (ts[mid] - T / 2.0))
        popt, _ = curve_fit(model, ts, c, p0=[A0, m0], sigma=sig,
                            absolute_sigma=True, maxfev=20000)
        return abs(popt[1]), popt[0]

    m_full, A_full = one_fit(corrs.mean(axis=0))
    jk = np.array([one_fit(np.delete(corrs, i, axis=0).mean(axis=0))[0]
                   for i in range(n)])
    m_err = float(np.sqrt((n - 1) * np.var(jk)))
    return float(m_full), m_err, float(A_full)
