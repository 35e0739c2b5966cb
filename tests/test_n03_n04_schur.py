"""Even-odd Schur preconditioned solves (reference tests n03 + n04).

n03 (tests/n03_gauge_laplace_test): gauged Laplace CG solve, then the
eo-Schur prepare/solve/reconstruct path must give the same solution.

n04 (tests/n04_staggered_test): staggered GCR solve + eo-Schur CG with
explicit residual check.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import GaugedLaplace2D, Staggered2D
from qmg_tpu import u1, solvers
from qmg_tpu.rng import QMGRandom
from qmg_tpu.linalg import norm2sq

L = 16


@pytest.fixture
def gauge():
    lat = Lattice2D(L, L, 1)
    rng = QMGRandom(1337)
    return lat, u1.gauss_gauge_u1(lat, rng, beta=6.0), rng


def test_gauged_laplace_cg_and_schur(gauge):
    lat, g, rng = gauge
    m_sq = 0.1 * 0.1
    op = GaugedLaplace2D(lat, m_sq, g)
    b = jnp.asarray(rng.gaussian_cv(lat))

    # Full solve (reference n03:83).
    res = solvers.cg(op.get_apply_function(), b, max_iter=4000, tol=1e-10)
    assert bool(res.converged)
    x_full = res.x
    resid = float(jnp.sqrt(norm2sq(b - op.apply_M(x_full)) / norm2sq(b)))
    assert resid < 1e-9

    # eo-Schur prepare/solve/reconstruct (reference n03:118-139).
    b_prep = op.prepare_b(b)
    res_e = solvers.cg(op.apply_eo_prec_M, b_prep, max_iter=4000, tol=1e-10)
    assert bool(res_e.converged)
    x = op.reconstruct_x(res_e.x, b)
    resid2 = float(jnp.sqrt(norm2sq(b - op.apply_M(x)) / norm2sq(b)))
    assert resid2 < 1e-8
    # Same solution as the full solve.
    assert float(jnp.sqrt(norm2sq(x - x_full) / norm2sq(x_full))) < 1e-7
    # Schur solve needs fewer iterations (the point of eo preconditioning).
    assert int(res_e.iters) < int(res.iters)


def test_staggered_gcr_and_schur(gauge):
    lat, g, rng = gauge
    mass = 0.1
    op = Staggered2D(lat, mass, g)
    b = jnp.asarray(rng.gaussian_cv(lat))

    # Full GCR solve (reference n04:191).
    res = solvers.gcr_restart(op.get_apply_function(), b, max_iter=4000,
                              tol=1e-10, restart_freq=64)
    assert bool(res.converged)
    resid = float(jnp.sqrt(norm2sq(b - op.apply_M(res.x)) / norm2sq(b)))
    assert resid < 1e-9

    # eo-Schur CG (reference n04:221): (m^2 - D_eo D_oe) is HPD.
    b_prep = op.prepare_b(b)
    res_e = solvers.cg(op.apply_eo_prec_M, b_prep, max_iter=4000, tol=1e-10)
    assert bool(res_e.converged)
    x = op.reconstruct_x(res_e.x, b)
    resid2 = float(jnp.sqrt(norm2sq(b - op.apply_M(x)) / norm2sq(b)))
    assert resid2 < 1e-8
    assert float(jnp.sqrt(norm2sq(x - res.x) / norm2sq(res.x))) < 1e-7


def test_staggered_antihermiticity(gauge):
    """The massless staggered op is anti-hermitian: D^dag = -D."""
    lat, g, rng = gauge
    op = Staggered2D(lat, 0.0, g)
    x = jnp.asarray(rng.gaussian_cv(lat))
    dag = op.apply_M(x, 1)  # DAGGER
    np.testing.assert_allclose(np.asarray(dag), -np.asarray(op.apply_M(x)),
                               atol=1e-13)


def test_staggered_gamma5_hermiticity(gauge):
    """eps(x) D eps(x) = D^dag (staggered gamma5-hermiticity)."""
    lat, g, rng = gauge
    op = Staggered2D(lat, 0.1, g)
    x = jnp.asarray(rng.gaussian_cv(lat))
    lhs = op.gamma5(op.apply_M(op.gamma5(x)))
    rhs = op.apply_M(x, 1)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-13)
