"""Twolink (distance-2) and corner stencil pieces, applied.

The reference ALLOCATES these coefficient arrays
(/root/reference/stencil/stencil_2d.h:155-164) but never applies them -
apply_M only warns (stencil_2d.h:925-933). Here they are first-class
stencil pieces: applied in apply_M, daggered in build_dagger, and
right-Jacobi-derived in build_rbjacobi. Oracles: an explicit numpy
coordinate-space stencil application, the adjoint identity for the
dagger set, and M B^{-1} for the rbjacobi set. The eo-Schur and
Galerkin-coarsening paths keep the reference's distance-1 contract and
must refuse these pieces loudly.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from qmg_tpu.lattice import Lattice2D, eo_pack, eo_unpack
from qmg_tpu.stencil import (make_coeffs, apply_M, build_dagger,
                             build_rbjacobi, apply_rbj_schur, Stencil2D)
from qmg_tpu import linalg

# Coordinate deltas per coefficient slot, matching the reference layouts
# (stencil_2d.h:28-39).
HOP_DELTAS = [(1, 0), (0, 1), (-1, 0), (0, -1)]
TWO_DELTAS = [(2, 0), (0, 2), (-2, 0), (0, -2)]
COR_DELTAS = [(1, 1), (-1, 1), (-1, -1), (1, -1)]

XL, YL, NC = 8, 6, 2


def random_piece(rng, n_dirs, lat):
    """(n_dirs, 2, Y, Xh, nc, nc) packed + the unpacked (n,y,x,i,j) grid."""
    grid = (rng.normal(size=(n_dirs, YL, XL, NC, NC))
            + 1j * rng.normal(size=(n_dirs, YL, XL, NC, NC)))
    packed = np.stack([eo_pack(grid[d], lat) for d in range(n_dirs)])
    return packed, grid


def make_full_coeffs(lat, rng, shift=0.17):
    cl_grid = (rng.normal(size=(YL, XL, NC, NC))
               + 1j * rng.normal(size=(YL, XL, NC, NC)))
    hop, hop_grid = random_piece(rng, 4, lat)
    two, two_grid = random_piece(rng, 4, lat)
    cor, cor_grid = random_piece(rng, 4, lat)
    coeffs = make_coeffs(lat, clover=jnp.asarray(eo_pack(cl_grid, lat)),
                         hopping=jnp.asarray(hop), twolink=jnp.asarray(two),
                         corner=jnp.asarray(cor), shift=shift)
    return coeffs, (cl_grid, hop_grid, two_grid, cor_grid, shift)


def grid_apply(grids, v_grid):
    """Numpy oracle: out[y,x] = clover v + sum_d coeff_d v(s+d) + shift v."""
    cl, hop, two, cor, shift = grids
    out = np.einsum("yxij,yxj->yxi", cl, v_grid) + shift * v_grid
    for deltas, mats in ((HOP_DELTAS, hop), (TWO_DELTAS, two),
                         (COR_DELTAS, cor)):
        for d, (dx, dy) in enumerate(deltas):
            pulled = np.roll(v_grid, shift=(-dy, -dx), axis=(0, 1))
            out += np.einsum("yxij,yxj->yxi", mats[d], pulled)
    return out


@pytest.fixture(scope="module")
def full_stencil():
    lat = Lattice2D(XL, YL, NC)
    rng = np.random.default_rng(7)
    coeffs, grids = make_full_coeffs(lat, rng)
    return lat, coeffs, grids


def test_apply_m_matches_grid_oracle(full_stencil):
    lat, coeffs, grids = full_stencil
    rng = np.random.default_rng(8)
    v_grid = (rng.normal(size=(YL, XL, NC))
              + 1j * rng.normal(size=(YL, XL, NC)))
    out = np.asarray(apply_M(coeffs, jnp.asarray(eo_pack(v_grid, lat))))
    np.testing.assert_allclose(eo_unpack(out, lat), grid_apply(grids, v_grid),
                               rtol=1e-13, atol=1e-13)


def test_dagger_adjoint_identity(full_stencil):
    lat, coeffs, _ = full_stencil
    dag = build_dagger(coeffs)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=lat.cv_shape())
                    + 1j * rng.normal(size=lat.cv_shape()))
    y = jnp.asarray(rng.normal(size=lat.cv_shape())
                    + 1j * rng.normal(size=lat.cv_shape()))
    lhs = complex(linalg.vdot(y, apply_M(coeffs, x)))
    rhs = complex(linalg.vdot(apply_M(dag, y), x))
    assert abs(lhs - rhs) < 1e-11 * max(abs(lhs), 1.0)


def test_rbjacobi_is_m_times_binv(full_stencil):
    lat, coeffs, _ = full_stencil
    rbj = build_rbjacobi(coeffs)
    assert rbj.coeffs.twolink is not None
    assert rbj.coeffs.corner is not None
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.normal(size=lat.cv_shape())
                    + 1j * rng.normal(size=lat.cv_shape()))
    got = apply_M(rbj.coeffs, x)
    want = apply_M(coeffs, linalg.site_matvec(rbj.cinv, x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-11, atol=1e-11)


def test_schur_refuses_distance2(full_stencil):
    _, coeffs, _ = full_stencil
    rbj = build_rbjacobi(coeffs)
    with pytest.raises(ValueError, match="distance-1"):
        apply_rbj_schur(rbj, jnp.zeros(coeffs.lat.cv_shape()[1:],
                                       dtype=jnp.complex128))


def test_coarse_build_refuses_distance2(full_stencil):
    lat, coeffs, _ = full_stencil
    from qmg_tpu.operators.coarse import build_coarse_coeffs
    from qmg_tpu.transfer import TransferMG
    coarse_lat = Lattice2D(XL // 2, YL // 2, 2)
    rng = np.random.default_rng(11)
    nvecs = jnp.asarray(rng.normal(size=(2,) + lat.cv_shape())
                        + 1j * rng.normal(size=(2,) + lat.cv_shape()))
    t = TransferMG(lat, coarse_lat, nvecs, do_block_ortho=True)
    with pytest.raises(ValueError, match="distance-1"):
        build_coarse_coeffs(coarse_lat, coeffs, t)


def test_stencil2d_dagger_roundtrip(full_stencil):
    """M^dagger^dagger == M through the stateful wrapper."""
    _, coeffs, _ = full_stencil
    st = Stencil2D(coeffs)
    dd = build_dagger(st.dagger_coeffs)
    for name in ("clover", "hopping", "twolink", "corner"):
        np.testing.assert_allclose(np.asarray(getattr(dd, name)),
                                   np.asarray(getattr(coeffs, name)),
                                   rtol=1e-13, atol=1e-13)
