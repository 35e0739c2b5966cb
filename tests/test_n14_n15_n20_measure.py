"""Physics measurement stream (reference tests n14, n15, n20).

n14: heatbath plaquette stream (covered statistically in test_n01).
n15/n20: point-source propagators -> folded pion correlator -> effective
goldstone mass. Full statistical parity with critical_mass.txt needs
hundreds of 32^2 configs; here single-config checks verify the pipeline:
the correlator is positive, decays away from the source, is symmetric
after folding, and the extracted mass is finite and ordered with the
quark mass (heavier quark -> heavier pion).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import Wilson2D, Staggered2D
from qmg_tpu import u1, solvers, measure
from qmg_tpu.rng import QMGRandom
from qmg_tpu.reductions import gaussian_wall_source

L = 16


@pytest.fixture(scope="module")
def gauge16(request):
    lat = Lattice2D(L, L, 1)
    rng = QMGRandom(1337)
    ph = np.zeros((2, 2, lat.y_len, lat.xh))
    ph = u1.heatbath_noncompact_update(ph, lat, 6.0, 100, rng)
    return u1.phases_to_links(ph), rng


def _pion(op, lat, srcs, tol=1e-9):
    def solve(src):
        res = solvers.bicgstab_l(op.get_apply_function(), jnp.asarray(src),
                                 max_iter=4000, tol=tol, l=6)
        assert bool(res.converged)
        return res.x
    return measure.pion_correlator(solve, lat, srcs)


def test_wilson_pion_correlator(gauge16):
    g, rng = gauge16
    lat = Lattice2D(L, L, 2)
    op = Wilson2D(lat, -0.01, g)
    srcs = [measure.point_source(lat, 0, 0, c) for c in range(2)]
    corr = _pion(op, lat, srcs)
    assert np.all(corr > 0)
    # Decay away from the source and symmetry of the folded correlator.
    assert corr[0] > corr[L // 2]
    np.testing.assert_allclose(corr[1:], corr[1:][::-1], rtol=1e-12)
    meff = measure.effective_mass_cosh(corr)
    mid = meff[L // 4]
    assert np.isfinite(mid) and 0.01 < mid < 2.0


def test_wilson_pion_mass_ordering(gauge16):
    """Heavier quark mass -> heavier goldstone (the critical_mass.txt
    trend: m_pi grows with m - m_c)."""
    g, rng = gauge16
    lat = Lattice2D(L, L, 2)
    masses = [0.05, 0.3]
    meffs = []
    for m in masses:
        op = Wilson2D(lat, m, g)
        srcs = [measure.point_source(lat, 0, 0, c) for c in range(2)]
        corr = _pion(op, lat, srcs)
        meffs.append(measure.effective_mass_cosh(corr)[L // 4])
    assert meffs[1] > meffs[0] > 0


def test_staggered_pion_wall_source(gauge16):
    """n20-style with a gaussian wall source."""
    g, rng = gauge16
    lat = Lattice2D(L, L, 1)
    op = Staggered2D(lat, 0.1, g)
    src = gaussian_wall_source(lat, timeslice=0, color=0, rng=rng)
    corr = _pion(op, lat, [src])
    assert np.all(corr > 0)
    assert corr[1] > corr[L // 2]
    # Staggered correlators oscillate in t (parity partners), so demand a
    # finite positive cosh mass somewhere on the plateau, not at fixed t.
    meff = measure.effective_mass_cosh(corr)[2:L // 2]
    finite = meff[np.isfinite(meff)]
    assert len(finite) > 0 and np.all(finite > 0) and np.all(finite < 3.0)


def test_wall_source_overloads():
    """Both reference overloads (reductions.h:90-162): identical normal
    stream, real vs complex storage, zero imaginary part, support only on
    the requested (timeslice, color) wall."""
    from qmg_tpu.reductions import (gaussian_wall_source_real,
                                    gaussian_wall_source_complex)
    lat = Lattice2D(L, L, 2)
    src_c = gaussian_wall_source_complex(lat, 3, 1, QMGRandom(42),
                                         deviation=2.0, mean=0.5)
    src_r = gaussian_wall_source_real(lat, 3, 1, QMGRandom(42),
                                      deviation=2.0, mean=0.5)
    assert src_c.dtype == np.complex128 and src_r.dtype == np.float64
    assert np.all(src_c.imag == 0.0)
    np.testing.assert_array_equal(src_c.real, src_r)
    # Support: only y=3, c=1 is populated, and it is actually random.
    mask = np.zeros(lat.cv_shape(), dtype=bool)
    mask[:, 3, :, 1] = True
    assert np.all(src_r[~mask] == 0.0)
    wall = src_r[mask]
    assert np.count_nonzero(wall) == wall.size
    assert abs(np.mean(wall) - 0.5) < 1.0  # loose: mean shift applied


def test_fit_cosh_mass_recovers_synthetic():
    """Jackknifed cosh fit recovers a known mass from noisy synthetic
    correlators, with honest (covering) errors. Round-5 analysis tool
    for the near-critical plateau (PARITY.md physics table)."""
    rng = np.random.default_rng(12345)
    T, m_true, A = 32, 0.108, 2.5
    t = np.arange(T)
    c = A * np.cosh(m_true * (t - T / 2))
    corrs = c[None, :] * (1 + 0.03 * rng.standard_normal((80, T)))
    m, err, amp = measure.fit_cosh_mass(corrs, T // 4, T // 2 - 1)
    assert abs(m - m_true) < 3 * err + 2e-3
    assert 0 < err < 0.01
    assert abs(amp - A) / A < 0.1
