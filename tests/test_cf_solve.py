"""Channels-first K-cycle solve (cf_solve.py) vs the standard planes
solver: same state, same schedule, same tolerance contract.

The cf path is a pure layout change (real-pair channels-first fields,
flat real-pair GCR stores); its trajectory follows the standard
solver's flexible-GCR arithmetic, so the oracle is the true
reconstructed residual plus an iteration-count match within the slack
flexible preconditioning allows.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qmg_tpu import u1
from qmg_tpu.cf_solve import make_cf_planes_solver
from qmg_tpu.lattice import Lattice2D
from qmg_tpu.linalg import norm2sq
from qmg_tpu.operators import Wilson2D
from qmg_tpu.rng import QMGRandom
from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
from qmg_tpu.setup_planes import gauss_seed_planes, make_kcycle_setup_planes
from qmg_tpu.tpu_compat import (from_planes, host_to_planes,
                                make_planes_solver)

TOL = 1e-6


@pytest.fixture(scope="module")
def rig():
    lat = Lattice2D(32, 32, 2)
    rng = QMGRandom(1337)
    gauge = np.asarray(u1.read_gauge_u1(
        lat, "/root/reference/tests/common_cfgs_u1/l32t32b60_heatbath.dat"))
    cfg = KCycleConfig(n_refine=2, coarse_dof=8, nullvec_tol=5e-4,
                       nullvec_max_iter=200, coarsest_direct=True)
    setup_fn = make_kcycle_setup_planes(lat, cfg, -0.05)
    state = setup_fn(host_to_planes(gauge), *gauss_seed_planes(
        lat, cfg, QMGRandom(999)))
    op = Wilson2D(lat, -0.05, jnp.asarray(gauge, jnp.complex64),
                  dtype=jnp.complex64)
    mg = build_kcycle_hierarchy(lat, op, cfg, QMGRandom(1),
                                structure_only=True)
    b = np.asarray(QMGRandom(77).gaussian_cv(lat))
    return lat, state, mg, op, b


def test_cf_solve_matches_standard(rig):
    lat, state, mg, op, b = rig
    b_p = host_to_planes(b)

    solve_std, _ = make_planes_solver(mg, tol=TOL, max_iter=200,
                                      restart_freq=32)
    x_std, it_std, rsq_std = jax.jit(solve_std)(state, b_p)

    solve_cf = make_cf_planes_solver(mg, tol=TOL, max_iter=200,
                                     restart_freq=32)
    x_cf, it_cf, rsq_cf = jax.jit(solve_cf)(state, b_p)

    bj = jnp.asarray(b, jnp.complex64)
    bn = float(jnp.sqrt(norm2sq(bj)))
    res_std = float(jnp.sqrt(norm2sq(
        bj - op.apply_M(from_planes(x_std))))) / bn
    res_cf = float(jnp.sqrt(norm2sq(
        bj - op.apply_M(from_planes(x_cf))))) / bn
    # Both meet the tolerance contract on the TRUE residual (f32 slack).
    assert res_std < 5 * TOL
    assert res_cf < 5 * TOL, f"cf true residual {res_cf:.3e}"
    # Same preconditioner schedule -> the trajectories should be close.
    assert abs(int(it_cf) - int(it_std)) <= 2, (
        f"cf iters {int(it_cf)} vs standard {int(it_std)}")


def test_cf_solve_requires_direct_coarsest(rig):
    lat, state, mg, op, b = rig
    slim = {k: v for k, v in state.items() if k != "cdinv"}
    solve_cf = make_cf_planes_solver(mg, tol=TOL, max_iter=50)
    with pytest.raises(ValueError, match="direct coarsest"):
        solve_cf(slim, host_to_planes(b))
