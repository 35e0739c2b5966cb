"""Device-resident (jittable) setup vs the eager host build.

setup_planes.make_kcycle_setup_planes traces the WHOLE n13 setup
(null-vector solves, block ortho, Galerkin coarse build, dense coarsest
inverse) into one jit. Oracles are functional (P(dagger)P = 1 and the
n08 Galerkin identity on the traced state, then an end-to-end solve):
elementwise equality with the eager build is NOT required, since
eager-vs-jit rounding in the c64 Krylov null-vector solves yields
legitimately different near-null spaces.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import Wilson2D
from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
from qmg_tpu.setup_planes import (make_kcycle_setup_planes,
                                  gauss_seed_planes)
from qmg_tpu.tpu_compat import (make_planes_solver, mg_state_planes,
                                host_to_planes, from_planes)
from qmg_tpu import u1
from qmg_tpu.rng import QMGRandom
from qmg_tpu.linalg import norm2sq

L = 32
MASS = -0.05


def _cfg():
    return KCycleConfig(n_refine=2, coarse_dof=4, nullvec_max_iter=120,
                        nullvec_tol=1e-3, coarsest_direct=True)


def test_traced_setup_state_galerkin_oracle():
    """n08-style functional oracle on the TRACED state: the coarse
    operator it built must equal prolong -> fine apply -> restrict
    through its own block-orthonormalized null vectors, and P(dagger)P = 1.
    (Elementwise comparison against the eager build is NOT a valid
    oracle: eager-vs-jit rounding in the c64 Krylov null-vector solves
    yields legitimately different near-null spaces.)"""
    cfg = _cfg()
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    gauge = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    seeds = gauss_seed_planes(lat, cfg, QMGRandom(999))
    setup_fn = make_kcycle_setup_planes(lat, cfg, MASS)
    state = setup_fn(host_to_planes(np.asarray(gauge)), *seeds)

    from qmg_tpu.stencil import make_coeffs, apply_M
    from qmg_tpu.transfer import TransferMG, DoublingType
    lats = [Lattice2D(L, L, 2),
            Lattice2D(L // 4, L // 4, cfg.coarse_dof),
            Lattice2D(L // 16, L // 16, cfg.coarse_dof)]
    for lvl in range(2):
        lat_f, lat_c = lats[lvl], lats[lvl + 1]
        nvb = from_planes(jnp.asarray(state[f"nvb{lvl}"]))
        # state nvb is the transfer's BLOCKED layout (nvec, 2c, Yc,
        # Xhc, B): build a shape-only transfer and inject it, the same
        # way the planes solver patches hierarchies.
        dummy = jnp.zeros((cfg.coarse_dof,) + lat_f.cv_shape(),
                          jnp.complex64)
        t = TransferMG(lat_f, lat_c, dummy, do_block_ortho=False,
                       doubling=DoublingType.PROJECTION)
        t._nvb = nvb
        sh_f = from_planes(jnp.asarray(state[f"shifts{lvl}"]))
        sh_c = from_planes(jnp.asarray(state[f"shifts{lvl + 1}"]))
        cf = make_coeffs(
            lat_f, clover=from_planes(jnp.asarray(state[f"clover{lvl}"])),
            hopping=from_planes(jnp.asarray(state[f"hopping{lvl}"])),
            shift=sh_f[0], eo_shift=sh_f[1], dof_shift=sh_f[2],
            dtype=jnp.complex64)
        cc = make_coeffs(
            lat_c,
            clover=from_planes(jnp.asarray(state[f"clover{lvl + 1}"])),
            hopping=from_planes(jnp.asarray(state[f"hopping{lvl + 1}"])),
            shift=sh_c[0], eo_shift=sh_c[1], dof_shift=sh_c[2],
            dtype=jnp.complex64)
        rng2 = QMGRandom(7 + lvl)
        xc = jnp.asarray(rng2.gaussian_cv(lat_c), jnp.complex64)
        # P(dagger)P = 1 on the coarse space.
        rt = t.restrict_f2c(t.prolong_c2f(xc))
        np.testing.assert_allclose(np.asarray(rt), np.asarray(xc),
                                   atol=2e-5)
        # Galerkin: A_c x = R A_f P x.
        built = apply_M(cc, xc)
        emulated = t.restrict_f2c(apply_M(cf, t.prolong_c2f(xc)))
        scale = float(jnp.max(jnp.abs(emulated)))
        np.testing.assert_allclose(np.asarray(built), np.asarray(emulated),
                                   atol=3e-5 * scale,
                                   err_msg=f"Galerkin oracle at level {lvl}")


def test_traced_setup_state_drives_planes_solver():
    """structure_only scaffold + traced-setup state = working solver."""
    cfg = _cfg()
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    gauge = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    op = Wilson2D(lat, MASS, jnp.asarray(gauge, jnp.complex64),
                  dtype=jnp.complex64)

    mg_struct = build_kcycle_hierarchy(lat, op, cfg, QMGRandom(1),
                                       structure_only=True)
    sp, _ = make_planes_solver(mg_struct, tol=1e-6, max_iter=100)

    setup_fn = make_kcycle_setup_planes(lat, cfg, MASS)
    seeds = gauss_seed_planes(lat, cfg, QMGRandom(999))
    state = setup_fn(host_to_planes(np.asarray(gauge)), *seeds)

    # Monolithic single-jit variant produces an equivalent state
    # (the per-level default chains smaller XLA modules).
    setup_mono = make_kcycle_setup_planes(lat, cfg, MASS,
                                          per_level_jit=False)
    state_mono = jax.jit(setup_mono)(host_to_planes(np.asarray(gauge)),
                                     *seeds)
    assert set(state_mono) == set(state)
    for k in sorted(state):
        np.testing.assert_allclose(
            np.asarray(state_mono[k]), np.asarray(state[k]),
            atol=2e-2 * max(float(np.max(np.abs(np.asarray(state[k])))),
                            1e-3),
            err_msg=f"monolithic vs per-level setup diverged at {k}")

    b = np.asarray(rng.gaussian_cv(lat))
    x_p, iters, rsq = jax.jit(sp)(state, host_to_planes(b))
    x = from_planes(x_p)
    bj = jnp.asarray(b, jnp.complex64)
    resid = float(jnp.sqrt(norm2sq(bj - op.apply_M(x)) / norm2sq(bj)))
    assert resid < 1e-5, f"true resid {resid}"
    # The real (solved) null vectors must precondition far better than
    # the structure_only gaussians.
    _, st_struct = make_planes_solver(mg_struct, tol=1e-6, max_iter=100)
    x2_p, iters2, _ = jax.jit(sp)(st_struct, host_to_planes(b))
    assert int(iters) < int(iters2), (
        f"traced-setup state ({int(iters)} iters) should beat the "
        f"gaussian scaffold ({int(iters2)})")


def test_traced_setup_n19_schur_config():
    """Device setup under the n19 configuration: rbjacobi null-vector
    stype (traced batched-QR derived build), rbjacobi coarsening, Schur
    outer solve through the planes boundary."""
    from qmg_tpu.stencil import StencilType
    from qmg_tpu.operators.coarse import CoarseOperator2D
    cfg = KCycleConfig(
        n_refine=1, coarse_dof=4, nullvec_max_iter=150, nullvec_tol=1e-3,
        fine_stencil_app=StencilType.RIGHT_SCHUR,
        coarsest_stencil_app=StencilType.RIGHT_SCHUR,
        nullvec_stype=StencilType.RIGHT_JACOBI,
        nullvec_solver="gcr_restart",
        precond_coarsen_rbjacobi=True,
        build_extra=CoarseOperator2D.BUILD_RBJACOBI,
        coarsest_direct=False)  # Schur coarsest is half-space; no direct
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    gauge = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    op = Wilson2D(lat, MASS, jnp.asarray(gauge, jnp.complex64),
                  dtype=jnp.complex64)

    mg_struct = build_kcycle_hierarchy(lat, op, cfg, QMGRandom(1),
                                       structure_only=True)
    sp, _ = make_planes_solver(mg_struct, tol=1e-6, max_iter=150,
                               outer_type=StencilType.RIGHT_SCHUR)
    setup_fn = make_kcycle_setup_planes(lat, cfg, MASS)
    seeds = gauss_seed_planes(lat, cfg, QMGRandom(999))
    state = setup_fn(host_to_planes(np.asarray(gauge)), *seeds)
    b = np.asarray(rng.gaussian_cv(lat))
    x_p, iters, rsq = jax.jit(sp)(state, host_to_planes(b))
    x = from_planes(x_p)
    bj = jnp.asarray(b, jnp.complex64)
    resid = float(jnp.sqrt(norm2sq(bj - op.apply_M(x)) / norm2sq(bj)))
    assert resid < 1e-5, f"true resid {resid}"
    assert int(iters) < 100
