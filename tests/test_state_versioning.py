"""Compiled-solve cache keying: state versions, not recyclable id()s.

Round-1 keyed the solve cache on id() of coefficient buffers; a freed
buffer's id reused by a new array after update_links could silently
return a stale executable with the old gauge field baked in. The cache
now keys on monotonic, never-reused version counters bumped by every
coefficient / shift / override mutation.
"""

import gc

import numpy as np
import jax.numpy as jnp

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import Wilson2D
from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
from qmg_tpu.transfer import TransferMG
from qmg_tpu import u1
from qmg_tpu.rng import QMGRandom
from qmg_tpu.linalg import norm2sq


def test_version_bumps_on_every_mutation():
    lat = Lattice2D(8, 8, 2)
    rng = QMGRandom(7)
    op = Wilson2D(lat, 0.1, u1.gauss_gauge_u1(lat, rng, beta=6.0))
    seen = {op.version}

    op.update_shifts(shift=0.2)
    assert op.version not in seen
    seen.add(op.version)

    op.update_links(jnp.asarray(u1.gauss_gauge_u1(lat, rng, beta=6.0)))
    assert op.version not in seen
    seen.add(op.version)

    op.apply_override = lambda x: x
    assert op.version not in seen
    seen.add(op.version)
    op.apply_override = None
    assert op.version not in seen


def test_transfer_versions_never_collide():
    lat = Lattice2D(8, 8, 2)
    clat = Lattice2D(2, 2, 2)
    rng = QMGRandom(3)
    versions = set()
    for _ in range(4):
        nv = jnp.stack([jnp.asarray(rng.gaussian_cv(lat))
                        for _ in range(2)])
        t = TransferMG(lat, clat, nv)
        v = t.version
        assert v not in versions
        versions.add(v)
        del t
        gc.collect()  # id(t) may be recycled; version must not be


def test_update_links_invalidates_cached_solve():
    """Solve, mutate the gauge field (forcing GC of the old buffers),
    solve again: the second solve must use the NEW operator - its true
    residual w.r.t. the new operator must be small."""
    lat = Lattice2D(16, 16, 2)
    rng = QMGRandom(1337)
    g1 = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    op = Wilson2D(lat, -0.05, g1)
    cfg = KCycleConfig(n_refine=1, coarse_dof=2, x_block=4, y_block=4,
                       free_null_vectors=True)
    mg = build_kcycle_hierarchy(lat, op, cfg, rng)
    b = jnp.asarray(rng.gaussian_cv(lat))
    res1 = mg.solve(b, tol=1e-8, max_iter=200, restart_freq=32,
                    track=False)
    assert bool(res1.converged)

    g2 = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    op.update_links(jnp.asarray(g2))
    gc.collect()
    res2 = mg.solve(b, tol=1e-8, max_iter=200, restart_freq=32,
                    track=False)
    # The hierarchy's coarse level still belongs to g1, so convergence is
    # not guaranteed - but the outer matvec MUST be the g2 operator:
    # residual reported by the solver must equal the true g2 residual.
    true_r2 = float(jnp.sqrt(norm2sq(b - op.apply_M(res2.x))))
    rep_r2 = float(np.sqrt(float(res2.res_sq)))
    assert abs(true_r2 - rep_r2) <= 1e-6 * max(1.0, rep_r2), (
        "solve after update_links reused a stale compiled executable")
    # And the two solutions must differ (different operators).
    assert float(norm2sq(res1.x - res2.x)) > 1e-12
