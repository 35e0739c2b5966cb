"""Domain-wall operator parity tests.

The reference ships NO test for Dwf2D (SURVEY.md 2.4) - these are new
oracles: Dwf2D must equal Ls stacked Wilson(mass = M5 + 1... ) blocks
plus the explicit s-couplings, and Gamma_5 must be an involution that
makes Gamma_5 D hermitian (domain-wall gamma5-hermiticity:
Gamma_5 D Gamma_5 = D^dag).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import Wilson2D
from qmg_tpu.operators.dwf import Dwf2D, create_dwf_ls
from qmg_tpu import u1, solvers
from qmg_tpu.rng import QMGRandom
from qmg_tpu.linalg import norm2sq

L = 8
LS = 4


@pytest.fixture(scope="module")
def setup():
    lat_g = Lattice2D(L, L, 1)
    rng = QMGRandom(1337)
    g = u1.gauss_gauge_u1(lat_g, rng, beta=6.0)
    lat = Lattice2D(L, L, 2 * LS)
    op = create_dwf_ls(lat, mass=0.1, gauge=g, ls=LS, m5=-1.0)
    return lat, op, g, rng


def test_dwf_equals_stacked_wilson(setup):
    """Applying DWF to a vector supported on a single s-slice, the same
    slice of the result must equal the 2D Wilson apply with shift
    3w + M5 - 2w = M5 + w... : explicitly, the block-diagonal part is
    Wilson hopping + 3w clover + M5, vs Wilson's 2w clover + mass; so
    slice_out = Wilson(mass = M5 + w) slice_in."""
    lat, op, g, rng = setup
    lat_w = Lattice2D(L, L, 2)
    w_op = Wilson2D(lat_w, mass=-1.0 + 1.0, gauge=g)  # M5 + w = 0
    v_w = jnp.asarray(rng.gaussian_cv(lat_w))
    s = 1  # interior slice
    v = jnp.zeros(lat.cv_shape(), dtype=jnp.complex128)
    v = v.at[..., 2 * s:2 * s + 2].set(v_w)
    out = op.apply_M(v)
    out_slice = out[..., 2 * s:2 * s + 2]
    expect = w_op.apply_M(v_w)
    np.testing.assert_allclose(np.asarray(out_slice), np.asarray(expect),
                               atol=1e-12)
    # Neighboring slices receive only the -P_+/-P_- couplings.
    up_coupling = out[..., 2 * s + 2:2 * s + 4]
    np.testing.assert_allclose(np.asarray(up_coupling[..., 0]),
                               -np.asarray(v_w[..., 0]), atol=1e-13)
    assert float(jnp.max(jnp.abs(up_coupling[..., 1]))) < 1e-13


def test_gamma5_involution_and_hermiticity(setup):
    lat, op, g, rng = setup
    x = jnp.asarray(rng.gaussian_cv(lat))
    np.testing.assert_allclose(np.asarray(op.gamma5(op.gamma5(x))),
                               np.asarray(x), atol=0)
    # Gamma_5 D Gamma_5 = D^dag.
    lhs = op.gamma5(op.apply_M(op.gamma5(x)))
    rhs = op.apply_M(x, 1)  # DAGGER
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               atol=1e-12)


def test_dwf_solve(setup):
    lat, op, g, rng = setup
    b = jnp.asarray(rng.gaussian_cv(lat))
    res = solvers.bicgstab_l(op.get_apply_function(), b, max_iter=2000,
                             tol=1e-9, l=6)
    assert bool(res.converged)
    resid = float(jnp.sqrt(norm2sq(b - op.apply_M(res.x)) / norm2sq(b)))
    assert resid < 1e-8


def test_unsupported_ls_raises(setup):
    lat, op, g, rng = setup
    with pytest.raises(ValueError):
        create_dwf_ls(Lattice2D(L, L, 10), 0.1, g, ls=5)
