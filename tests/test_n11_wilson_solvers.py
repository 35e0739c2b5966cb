"""Wilson solver battery (reference test n11, tests/n11_wilson_test):
BiCGstab, BiCGstab(l), TFQMR, CGNR on M^dag M, restarted GCR - all must
converge on the interacting Wilson operator to the same solution.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import Wilson2D
from qmg_tpu.stencil import StencilType
from qmg_tpu import u1, solvers
from qmg_tpu.rng import QMGRandom
from qmg_tpu.linalg import norm2sq

L = 16
MASS = -0.03
TOL = 1e-8


@pytest.fixture(scope="module")
def problem():
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    op = Wilson2D(lat, MASS, g)
    b = jnp.asarray(rng.gaussian_cv(lat))
    return lat, op, b


def _check(op, b, x, tol=TOL):
    resid = float(jnp.sqrt(norm2sq(b - op.apply_M(x)) / norm2sq(b)))
    assert resid < 10 * tol, f"explicit residual {resid}"
    return resid


def test_bicgstab(problem):
    lat, op, b = problem
    res = solvers.bicgstab(op.get_apply_function(), b, max_iter=4000,
                           tol=TOL)
    assert bool(res.converged)
    _check(op, b, res.x)


def test_bicgstab_l(problem):
    lat, op, b = problem
    res = solvers.bicgstab_l(op.get_apply_function(), b, max_iter=4000,
                             tol=TOL, l=6)
    assert bool(res.converged)
    _check(op, b, res.x)


def test_tfqmr(problem):
    lat, op, b = problem
    res = solvers.tfqmr(op.get_apply_function(), b, max_iter=4000, tol=TOL)
    _check(op, b, res.x, tol=1e-6)  # tau is a proxy bound


def test_cgnr(problem):
    """CGNR: CG on M^dag M x = M^dag b (reference n11:274)."""
    lat, op, b = problem
    mdm = op.get_apply_function(StencilType.MDAGGER_M)
    b_prep = op.prepare_M(b, StencilType.MDAGGER_M)
    res = solvers.cg(mdm, b_prep, max_iter=8000, tol=TOL)
    assert bool(res.converged)
    x = op.reconstruct_M(res.x, b, StencilType.MDAGGER_M)
    _check(op, b, x, tol=1e-6)


def test_cgne(problem):
    """CGNE: CG on M M^dag y = b, x = M^dag y (reference n17:167)."""
    lat, op, b = problem
    mmd = op.get_apply_function(StencilType.M_MDAGGER)
    res = solvers.cg(mmd, b, max_iter=8000, tol=TOL)
    assert bool(res.converged)
    x = op.reconstruct_M(res.x, b, StencilType.M_MDAGGER)
    _check(op, b, x, tol=1e-6)


def test_gcr_restart(problem):
    lat, op, b = problem
    res = solvers.gcr_restart(op.get_apply_function(), b, max_iter=4000,
                              tol=TOL, restart_freq=32)
    assert bool(res.converged)
    _check(op, b, res.x)


def test_all_agree(problem):
    lat, op, b = problem
    xs = []
    xs.append(solvers.bicgstab_l(op.get_apply_function(), b, max_iter=4000,
                                 tol=1e-10, l=6).x)
    xs.append(solvers.gcr_restart(op.get_apply_function(), b, max_iter=4000,
                                  tol=1e-10, restart_freq=32).x)
    d = float(jnp.sqrt(norm2sq(xs[0] - xs[1]) / norm2sq(xs[0])))
    assert d < 1e-8


def test_gamma5_hermiticity(problem):
    """gamma5 M gamma5 = M^dag for Wilson."""
    lat, op, b = problem
    rng = QMGRandom(4)
    x = jnp.asarray(rng.gaussian_cv(lat))
    lhs = op.gamma5(op.apply_M(op.gamma5(x)))
    rhs = op.apply_M(x, StencilType.DAGGER)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)


def test_gcr_store_guard():
    # Unrestarted GCR at scale would allocate a (max_iter, n) direction
    # store (restart_freq=-1 hazard); the trace-time guard must fire
    # before any device allocation, and the restarted path must not.
    big = jnp.zeros((1 << 22,), jnp.complex128)
    with pytest.raises(ValueError, match="direction store"):
        solvers.gcr(lambda x: x, big, max_iter=100000)
    with pytest.raises(ValueError, match="direction store"):
        solvers.gcr_var_precond(lambda x: x, big,
                                lambda r, c: (r, c), max_iter=100000)
    res = solvers.gcr_restart(lambda x: 2 * x, jnp.ones((64,),
                              jnp.complex128), max_iter=50, tol=1e-12,
                              restart_freq=8)
    assert bool(res.converged)
