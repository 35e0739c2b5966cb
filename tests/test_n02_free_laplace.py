"""Free Laplace stencil values + CG solve (reference test n02,
tests/n02_free_laplace_test/free_laplace.cpp).

The reference drops a point source and prints the stencil pattern
(self = 4 + m^2, neighbors = -1), applies twice (self = (4+m^2)^2 + 4,
+x = -2(4+m^2), +2x = 1), then CG-solves to 1e-7 on 32x24.
"""

import numpy as np
import jax.numpy as jnp

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import FreeLaplace2D
from qmg_tpu import solvers
from qmg_tpu.linalg import norm2sq

X, Y = 32, 24
M_SQ = 0.1 * 0.1


def point_source(lat, x, y, c=0):
    src = np.zeros(lat.cv_shape(), dtype=np.complex128)
    p, yy, xh = lat.coord_to_pyx(x, y)
    src[p, yy, xh, c] = 1.0
    return jnp.asarray(src)


def at_site(field, lat, x, y, c=0):
    p, yy, xh = lat.coord_to_pyx(x, y)
    return complex(field[p, yy, xh, c])


def test_point_source_stencil_values():
    lat = Lattice2D(X, Y, 1)
    op = FreeLaplace2D(lat, M_SQ)
    for x0, y0 in [(X // 2, Y // 2), (X // 2, Y // 2 + 1)]:  # even, odd
        rhs = point_source(lat, x0, y0)
        lhs = op.apply_M(rhs)
        assert abs(at_site(lhs, lat, x0, y0) - (4.0 + M_SQ)) < 1e-14
        for dx, dy in [(1, 0), (0, 1), (-1, 0), (0, -1)]:
            v = at_site(lhs, lat, (x0 + dx) % X, (y0 + dy) % Y)
            assert abs(v - (-1.0)) < 1e-14
        # everything else zero
        total = float(norm2sq(lhs))
        expect = (4.0 + M_SQ) ** 2 + 4.0
        assert abs(total - expect) < 1e-12


def test_double_application_values():
    lat = Lattice2D(X, Y, 1)
    op = FreeLaplace2D(lat, M_SQ)
    x0, y0 = X // 2, Y // 2 + 1
    lhs = op.apply_M(op.apply_M(point_source(lat, x0, y0)))
    s = 4.0 + M_SQ
    assert abs(at_site(lhs, lat, x0, y0) - (s * s + 4.0)) < 1e-12
    assert abs(at_site(lhs, lat, (x0 + 1) % X, y0) - (-2.0 * s)) < 1e-12
    assert abs(at_site(lhs, lat, (x0 + 2) % X, y0) - 1.0) < 1e-12


def test_cg_inversion():
    lat = Lattice2D(X, Y, 1)
    op = FreeLaplace2D(lat, M_SQ)
    rhs = point_source(lat, X // 2, Y // 2)
    res = solvers.cg(op.get_apply_function(), rhs, max_iter=4000, tol=1e-7)
    assert bool(res.converged)
    # Explicit residual check (the reference's "Check tolerance" print).
    resid = float(jnp.sqrt(norm2sq(rhs - op.apply_M(res.x))
                           / norm2sq(rhs)))
    assert resid < 1e-6
    # Laplace is hermitian: M^dagger == M.
    dag = op.dagger_coeffs
    np.testing.assert_allclose(np.asarray(dag.clover),
                               np.asarray(op.coeffs.clover), atol=1e-14)
    np.testing.assert_allclose(np.asarray(dag.hopping),
                               np.asarray(op.coeffs.hopping), atol=1e-14)


def test_dense_oracle_small():
    """Densify the operator on 8x6 and check hermiticity + direct solve."""
    lat = Lattice2D(8, 6, 1)
    op = FreeLaplace2D(lat, M_SQ)
    n = lat.size_cv
    basis = np.eye(n, dtype=np.complex128).reshape((n,) + lat.cv_shape())
    cols = [np.asarray(op.apply_M(jnp.asarray(b))).reshape(n)
            for b in basis]
    mat = np.stack(cols, axis=1)
    np.testing.assert_allclose(mat, mat.conj().T, atol=1e-14)
    rng = np.random.default_rng(3)
    b = rng.normal(size=n) + 1j * rng.normal(size=n)
    x_direct = np.linalg.solve(mat, b)
    res = solvers.cg(op.get_apply_function(),
                     jnp.asarray(b.reshape(lat.cv_shape())),
                     max_iter=2000, tol=1e-12)
    np.testing.assert_allclose(np.asarray(res.x).reshape(n), x_direct,
                               atol=1e-8)
