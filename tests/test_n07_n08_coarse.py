"""Coarse-operator build oracle + geometric V-cycle (reference n07, n08).

n08 (tests/n08_distance1_build_test/build_test.cpp:126-147): the built
coarse stencil must equal the emulated prolong -> fine apply -> restrict
operator at every level - THE correctness oracle for the Galerkin builder.

n07 (tests/n07_free_laplace_mg): hand-rolled Richardson V-cycle on the
free Laplace converges using the emulated coarse apply.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import FreeLaplace2D, Wilson2D
from qmg_tpu.operators.coarse import CoarseOperator2D
from qmg_tpu.transfer import TransferMG, DoublingType
from qmg_tpu.multigrid import MultigridMG
from qmg_tpu import u1
from qmg_tpu.rng import QMGRandom
from qmg_tpu.linalg import norm2sq


def _ortho_nulls(stencil, lat, nvec, rng, chiral=False):
    """Gaussian null-vector surrogates (+ chiral doubling when asked)."""
    vecs = []
    if chiral:
        for _ in range(nvec // 2):
            v = jnp.asarray(rng.gaussian_cv(lat))
            up, dn = stencil.chiral_projection_both(v)
            vecs += [up, dn]
        # Reference orders all ups then all downs (n13:375-384).
        vecs = vecs[0::2] + vecs[1::2]
    else:
        vecs = [jnp.asarray(rng.gaussian_cv(lat)) for _ in range(nvec)]
    return jnp.stack(vecs)


def _check_coarse_matches_emulated(mg, level, seed=0):
    lat_c = mg.get_lattice(level)
    rng = QMGRandom(seed + 100)
    xc = jnp.asarray(rng.gaussian_cv(lat_c))
    built = mg.get_stencil(level).apply_M(xc)
    t = mg.get_transfer(level - 1)
    emulated = t.restrict_f2c(mg.apply_stencil(t.prolong_c2f(xc),
                                               level - 1))
    err = float(jnp.sqrt(norm2sq(built - emulated) / norm2sq(emulated)))
    assert err < 1e-12, f"level {level}: built vs emulated err {err}"


def test_coarse_build_free_laplace_two_levels():
    """16^2 -> 4^2 -> 1^2 with 4x4 blocking, nvec=2."""
    lats = [Lattice2D(16, 16, 1), Lattice2D(4, 4, 2), Lattice2D(1, 1, 2)]
    op = FreeLaplace2D(lats[0], 0.01)
    mg = MultigridMG(lats[0], op)
    rng = QMGRandom(5)
    for i in (1, 2):
        nv = _ortho_nulls(mg.get_stencil(i - 1), lats[i - 1], lats[i].nc,
                          rng)
        t = TransferMG(lats[i - 1], lats[i], nv, do_block_ortho=True)
        mg.push_level(lats[i], t, build_stencil=True)
        _check_coarse_matches_emulated(mg, i, seed=i)


def test_coarse_build_wilson_chiral():
    """Interacting Wilson with chiral doubling (the n13 setup shape)."""
    lat0 = Lattice2D(16, 16, 2)
    lat1 = Lattice2D(4, 4, 4)
    rng = QMGRandom(1337)
    g = u1.gauss_gauge_u1(lat0, rng, beta=6.0)
    w = Wilson2D(lat0, -0.05, g)
    nv = _ortho_nulls(w, lat0, 4, rng, chiral=True)
    t = TransferMG(lat0, lat1, nv, do_block_ortho=True,
                   doubling=DoublingType.PROJECTION)
    mg = MultigridMG(lat0, w)
    mg.push_level(lat1, t, build_stencil=True, is_chiral=True)
    _check_coarse_matches_emulated(mg, 1)
    # Coarse op inherits the shift (mass) scalar (reference coarse.h:131).
    assert complex(mg.get_stencil(1).coeffs.shift) == complex(w.coeffs.shift)


def test_coarse_build_dim2_and_point():
    """Coarse lattices of dim 2 and 1 exercise the wrap/fold special cases
    (reference coarse.h:146-155, :226-233)."""
    lat0 = Lattice2D(8, 8, 1)
    lat1 = Lattice2D(2, 2, 2)   # blocksize 4 -> dim-2 coarse
    lat2 = Lattice2D(1, 1, 2)   # point coarse
    op = FreeLaplace2D(lat0, 0.02)
    mg = MultigridMG(lat0, op)
    rng = QMGRandom(8)
    nv = _ortho_nulls(op, lat0, 2, rng)
    t1 = TransferMG(lat0, lat1, nv, do_block_ortho=True)
    mg.push_level(lat1, t1, build_stencil=True)
    _check_coarse_matches_emulated(mg, 1)
    nv2 = _ortho_nulls(mg.get_stencil(1), lat1, 2, rng)
    t2 = TransferMG(lat1, lat2, nv2, do_block_ortho=True)
    mg.push_level(lat2, t2, build_stencil=True)
    _check_coarse_matches_emulated(mg, 2)


def test_richardson_vcycle_free_laplace():
    """n07: two-level Richardson V-cycle with the EMULATED coarse apply
    beats plain Richardson relaxation."""
    from qmg_tpu import solvers

    lat0 = Lattice2D(16, 16, 1)
    lat1 = Lattice2D(4, 4, 1)
    op = FreeLaplace2D(lat0, 0.01)
    mg = MultigridMG(lat0, op)
    rng = QMGRandom(2)
    # Geometric null vector: the constant mode (the free Laplace kernel).
    nv = jnp.ones((1,) + lat0.cv_shape(), dtype=jnp.complex128)
    t = TransferMG(lat0, lat1, nv, do_block_ortho=True)
    mg.push_level(lat1, t, build_stencil=False)  # emulated coarse apply

    b = jnp.asarray(rng.gaussian_cv(lat0))
    x = jnp.zeros_like(b)
    omega = 0.2
    n_relax = 4

    def relax(x, r, level, n):
        for _ in range(n):
            x = x + omega * r
            r = r - omega * mg.apply_stencil(r, level)
        return x, r

    resid_hist = []
    for _ in range(30):
        r = b - op.apply_M(x)
        resid_hist.append(float(jnp.sqrt(norm2sq(r) / norm2sq(b))))
        # presmooth
        z1, r1 = relax(jnp.zeros_like(r), r, 0, n_relax)
        # coarse correction via richardson on the emulated coarse op
        rc = t.restrict_f2c(r1)
        res = solvers.cg(lambda v: mg.apply_stencil(v, 1), rc,
                         max_iter=200, tol=1e-10)
        ec = res.x
        z2 = t.prolong_c2f(ec)
        x = x + z1 + z2
        # postsmooth
        r2 = b - op.apply_M(x)
        z3, _ = relax(jnp.zeros_like(r2), r2, 0, n_relax)
        x = x + z3
    final = float(jnp.sqrt(norm2sq(b - op.apply_M(x)) / norm2sq(b)))
    assert final < 1e-5, f"V-cycle stalled at {final}"
    assert final < resid_hist[5]  # monotone progress
