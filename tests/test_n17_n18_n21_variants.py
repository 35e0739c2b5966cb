"""Derived stencil variants (reference tests n17, n18, n21).

n17: dagger stencil - CGNR on M^dag M and CGNE on M M^dag reconstruct the
same solution.
n18: right block Jacobi with a noised clover - GCR on A B^{-1} +
reconstruct equals the direct solve; Schur prepare/solve/reconstruct.
n21: rbj-dagger - CG on rbj M^dag M and M M^dag.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import Wilson2D
from qmg_tpu.stencil import (StencilType, apply_M, apply_rbj_schur,
                             prepare_rbj_schur, reconstruct_rbj_schur)
from qmg_tpu import u1, solvers, linalg
from qmg_tpu.rng import QMGRandom
from qmg_tpu.linalg import norm2sq

L = 12


@pytest.fixture(scope="module")
def noised_wilson():
    """Wilson with a noised clover (reference n18:134-137) so B is a
    nontrivial per-site matrix."""
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    op = Wilson2D(lat, 0.25, g)
    noise = 0.125 * jnp.asarray(
        rng.gaussian_real(lat.cm_shape())
        + 1j * rng.gaussian_real(lat.cm_shape()))
    op.update_coeffs(clover=op.coeffs.clover + noise)
    b = jnp.asarray(rng.gaussian_cv(lat))
    return lat, op, b


def _resid(op, b, x, stype=StencilType.ORIGINAL):
    return float(jnp.sqrt(norm2sq(b - op.apply_M(x, stype)) / norm2sq(b)))


def test_dagger_matrix_oracle(noised_wilson):
    """Densified M^dag equals the conjugate transpose of densified M."""
    lat = Lattice2D(6, 4, 2)
    rng = QMGRandom(3)
    g = u1.gauss_gauge_u1(lat, rng, beta=4.0)
    op = Wilson2D(lat, 0.1, g)
    from qmg_tpu.eig import densify
    m = densify(op.get_apply_function(), lat.cv_shape())
    md = densify(op.get_apply_function(StencilType.DAGGER), lat.cv_shape())
    np.testing.assert_allclose(md, m.conj().T, atol=1e-13)


def test_cgnr_cgne_same_solution(noised_wilson):
    lat, op, b = noised_wilson
    # CGNR (reference n17:138).
    b_prep = op.prepare_M(b, StencilType.MDAGGER_M)
    r1 = solvers.cg(op.get_apply_function(StencilType.MDAGGER_M), b_prep,
                    max_iter=8000, tol=1e-10)
    x1 = op.reconstruct_M(r1.x, b, StencilType.MDAGGER_M)
    # CGNE (reference n17:167).
    r2 = solvers.cg(op.get_apply_function(StencilType.M_MDAGGER), b,
                    max_iter=8000, tol=1e-10)
    x2 = op.reconstruct_M(r2.x, b, StencilType.M_MDAGGER)
    assert _resid(op, b, x1) < 1e-7
    assert _resid(op, b, x2) < 1e-7
    assert float(jnp.sqrt(norm2sq(x1 - x2) / norm2sq(x1))) < 1e-6


def test_rbjacobi_solve_reconstruct(noised_wilson):
    """GCR on A B^{-1} y = b, x = B^{-1} y equals direct GCR
    (reference n18:184-190)."""
    lat, op, b = noised_wilson
    direct = solvers.gcr_restart(op.get_apply_function(), b, max_iter=4000,
                                 tol=1e-10, restart_freq=32)
    rbj = solvers.gcr_restart(
        op.get_apply_function(StencilType.RIGHT_JACOBI), b, max_iter=4000,
        tol=1e-10, restart_freq=32)
    x_rbj = op.reconstruct_M(rbj.x, b, StencilType.RIGHT_JACOBI)
    assert _resid(op, b, direct.x) < 1e-9
    assert _resid(op, b, x_rbj) < 1e-9
    assert float(jnp.sqrt(norm2sq(x_rbj - direct.x)
                          / norm2sq(direct.x))) < 1e-8


def test_rbjacobi_identities(noised_wilson):
    """rbj clover is the identity; rbj op equals M B^{-1} explicitly."""
    lat, op, b = noised_wilson
    rbj = op.rbjacobi
    eye = linalg.identity_like(rbj.coeffs.clover)
    np.testing.assert_allclose(np.asarray(rbj.coeffs.clover),
                               np.asarray(eye), atol=1e-13)
    x = jnp.asarray(QMGRandom(9).gaussian_cv(lat))
    # M B^{-1} x via original op on cinv x (B = clover + mass).
    binv_x = linalg.site_matvec(rbj.cinv, x)
    expect = op.apply_M(binv_x)
    got = op.apply_M(x, StencilType.RIGHT_JACOBI)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=1e-11)


def test_rbjacobi_schur(noised_wilson):
    """Schur prepare/solve/reconstruct (reference n18:218-229)."""
    lat, op, b = noised_wilson
    b_prep = op.prepare_M(b, StencilType.RIGHT_SCHUR)
    assert b_prep.shape == (lat.y_len, lat.xh, lat.nc)
    res = solvers.gcr_restart(
        op.get_apply_function(StencilType.RIGHT_SCHUR), b_prep,
        max_iter=4000, tol=1e-11, restart_freq=32)
    assert bool(res.converged)
    x = op.reconstruct_M(res.x, b, StencilType.RIGHT_SCHUR)
    assert _resid(op, b, x) < 1e-9


def test_rbj_dagger_normal_solves(noised_wilson):
    """n21: CG on rbj M^dag M (CGNR) and rbj M M^dag (CGNE)."""
    lat, op, b = noised_wilson
    # rbj CGNR.
    b_prep = op.prepare_M(b, StencilType.RBJ_MDAGGER_M)
    r1 = solvers.cg(op.get_apply_function(StencilType.RBJ_MDAGGER_M),
                    b_prep, max_iter=8000, tol=1e-10)
    x1 = op.reconstruct_M(r1.x, b, StencilType.RBJ_MDAGGER_M)
    assert _resid(op, b, x1) < 1e-6
    # rbj CGNE.
    r2 = solvers.cg(op.get_apply_function(StencilType.RBJ_M_MDAGGER), b,
                    max_iter=8000, tol=1e-10)
    x2 = op.reconstruct_M(r2.x, b, StencilType.RBJ_M_MDAGGER)
    assert _resid(op, b, x2) < 1e-6
    assert float(jnp.sqrt(norm2sq(x1 - x2) / norm2sq(x1))) < 1e-5


def test_rbj_dagger_matrix_oracle():
    """Densified rbj-dagger equals the conj transpose of densified rbj."""
    lat = Lattice2D(6, 4, 2)
    rng = QMGRandom(21)
    g = u1.gauss_gauge_u1(lat, rng, beta=4.0)
    op = Wilson2D(lat, 0.3, g)
    from qmg_tpu.eig import densify
    m = densify(op.get_apply_function(StencilType.RIGHT_JACOBI),
                lat.cv_shape())
    md = densify(op.get_apply_function(StencilType.RBJ_DAGGER),
                 lat.cv_shape())
    np.testing.assert_allclose(md, m.conj().T, atol=1e-12)
