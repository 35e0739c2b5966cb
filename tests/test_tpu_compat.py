"""Real-plane jit boundaries (tpu_compat): roundtrips and the whole-MG
planes solver (backend-agnostic; exercised here on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import Wilson2D
from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
from qmg_tpu.tpu_compat import (to_planes, from_planes, host_to_planes,
                                make_planes_solver)
from qmg_tpu import u1
from qmg_tpu.rng import QMGRandom
from qmg_tpu.linalg import norm2sq


def test_planes_roundtrip():
    rng = np.random.default_rng(0)
    z = rng.normal(size=(3, 4)) + 1j * rng.normal(size=(3, 4))
    p = host_to_planes(z, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(from_planes(jnp.asarray(p))), z)
    zz = jnp.asarray(z)
    np.testing.assert_allclose(np.asarray(from_planes(to_planes(zz))), z)


def test_planes_mg_solver_matches_complex_path():
    lat = Lattice2D(16, 16, 2)
    rng = QMGRandom(1337)
    g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    op = Wilson2D(lat, -0.05, g)
    cfg = KCycleConfig(n_refine=1, coarse_dof=8, nullvec_max_iter=200)
    mg = build_kcycle_hierarchy(lat, op, cfg, rng)
    b = jnp.asarray(rng.gaussian_cv(lat))

    ref = mg.solve(b, tol=1e-8, max_iter=200, restart_freq=32, track=False)

    solve_planes, state = make_planes_solver(mg, tol=1e-8, max_iter=200,
                                             restart_freq=32)
    solve_jit = jax.jit(solve_planes)
    x_p, iters, res_sq = solve_jit(state, host_to_planes(
        np.asarray(b), dtype=np.float64))
    x = from_planes(x_p)
    resid = float(jnp.sqrt(norm2sq(b - op.apply_M(x)) / norm2sq(b)))
    assert resid < 1e-7
    # Note: planes state decodes to the same values, so iteration counts
    # match the complex path exactly.
    assert int(iters) == int(ref.iters)
    # The complex hierarchy is restored untouched after tracing.
    res2 = mg.solve(b, tol=1e-8, max_iter=200, restart_freq=32,
                    track=False)
    assert int(res2.iters) == int(ref.iters)
