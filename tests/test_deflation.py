"""Coarsest-level deflation (reference stateful_multigrid.h:613-696 +
the deflation projection in mg_preconditioner :895-908).

The coarsest solve runs CGNR (MDAGGER_M) with the lowest/highest
eigenpairs of the normal op projected out as the initial guess; the
deflated K-cycle must converge in no more iterations than undeflated.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import Wilson2D
from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
from qmg_tpu.stencil import StencilType
from qmg_tpu import u1
from qmg_tpu.rng import QMGRandom
from qmg_tpu.linalg import norm2sq

L = 16


def _make(deflate: bool):
    lat0 = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    g = u1.gauss_gauge_u1(lat0, rng, beta=6.0)
    op = Wilson2D(lat0, -0.05, g)
    cfg = KCycleConfig(n_refine=1, coarse_dof=4,
                       coarsest_stencil_app=StencilType.MDAGGER_M,
                       nullvec_max_iter=150, nullvec_tol=5e-4)
    mg = build_kcycle_hierarchy(lat0, op, cfg, rng)
    mg.coarsest_solve.deflate = deflate
    if deflate:
        mg.deflate_coarsest(num_low=4, num_high=2)
        assert mg.coarsest_evecs.shape[0] == 6
    b = jnp.asarray(rng.gaussian_cv(lat0))
    return op, mg, b


def test_deflated_normal_coarsest_solve():
    op, mg, b = _make(deflate=True)
    res = mg.solve(b, tol=1e-9, max_iter=300, restart_freq=32)
    assert bool(res.converged)
    resid = float(jnp.sqrt(norm2sq(b - op.apply_M(res.x)) / norm2sq(b)))
    assert resid < 1e-8
    op2, mg2, b2 = _make(deflate=False)
    res2 = mg2.solve(b2, tol=1e-9, max_iter=300, restart_freq=32)
    assert bool(res2.converged)
    assert int(res.iters) <= int(res2.iters) + 2


def test_deflate_requires_normal_op():
    lat0 = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    g = u1.gauss_gauge_u1(lat0, rng, beta=6.0)
    op = Wilson2D(lat0, -0.05, g)
    cfg = KCycleConfig(n_refine=1, coarse_dof=2, free_null_vectors=True)
    mg = build_kcycle_hierarchy(lat0, op, cfg, rng)
    with pytest.raises(ValueError, match="normal op"):
        mg.deflate_coarsest(2, 0)


def test_normal_shift():
    """CoarsestSolveMG.normal_shift adds shift*I to the coarsest normal op
    (reference shift_function, stateful_multigrid.h:715-729)."""
    op, mg, b = _make(deflate=False)
    mg.coarsest_solve.normal_shift = 0.05
    res = mg.solve(b, tol=1e-9, max_iter=300, restart_freq=32)
    # A shifted (inexact) coarsest solve still preconditions: converges.
    assert bool(res.converged)
