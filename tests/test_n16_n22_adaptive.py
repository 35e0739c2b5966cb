"""MG-solved measurement stream + adaptive setup (reference tests n16, n22).

n16 (tests/n16_wilson_kcycle_heatbath): heatbath evolution, per-config
update_links + hierarchy rebuild, wall-source propagators solved with the
K-cycle, pion correlator accumulation.

n22 (tests/n22_wilson_kcycle_adaptive): alpha-MG-style adaptive setup -
Richardson-smoothed test vectors, K-cycle self-improvement passes via
update_level, ops/iteration accounting via shift_all_to_nullvec.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import Wilson2D
from qmg_tpu.operators.coarse import CoarseOperator2D
from qmg_tpu.setup import (KCycleConfig, build_kcycle_hierarchy,
                           chiral_double)
from qmg_tpu.transfer import TransferMG, DoublingType
from qmg_tpu.stateful import (LevelSolveMG, CoarsestSolveMG,
                              StatefulMultigridMG, DSLASH_NULLVEC,
                              DSLASH_KRYLOV)
from qmg_tpu.stencil import StencilType
from qmg_tpu import u1, solvers, measure
from qmg_tpu.rng import QMGRandom
from qmg_tpu.reductions import gaussian_wall_source
from qmg_tpu.linalg import norm2sq, orthogonal, normalize

L = 16


def test_n16_heatbath_mg_measurement_stream():
    """Two heatbath configs: update_links + rebuild + MG-solved pion."""
    lat_g = Lattice2D(L, L, 1)
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    ph = np.zeros((2, 2, lat_g.y_len, lat_g.xh))
    ph = u1.heatbath_noncompact_update(ph, lat_g, 6.0, 80, rng)
    g = u1.phases_to_links(ph)
    op = Wilson2D(lat, -0.01, g)
    cfg = KCycleConfig(n_refine=1, coarse_dof=4, nullvec_max_iter=150,
                       nullvec_tol=5e-4)
    corrs = []
    for step in range(2):
        if step > 0:
            # Evolve, update links, rebuild the hierarchy
            # (reference n16:286-441).
            ph = u1.heatbath_noncompact_update(ph, lat_g, 6.0, 10, rng)
            op.update_links(u1.phases_to_links(ph))
        mg = build_kcycle_hierarchy(lat, op, cfg, rng)

        def solve(src):
            res = mg.solve(jnp.asarray(src), tol=1e-8, max_iter=200,
                           restart_freq=32)
            assert bool(res.converged)
            return res.x

        srcs = [gaussian_wall_source(lat, 0, c, rng) for c in range(2)]
        corrs.append(measure.pion_correlator(solve, lat, srcs))
    for corr in corrs:
        assert np.all(corr > 0)
        assert corr[1] > corr[L // 2]
    # Different configs give different correlators.
    assert not np.allclose(corrs[0], corrs[1])


def _push_adaptive_level(mg, lat_prev, lat_i, test_vectors, update=False,
                         level=None):
    raw = chiral_double(mg.get_stencil((level or 1) - 1), test_vectors)
    transfer = TransferMG(lat_prev, lat_i, raw, do_block_ortho=True,
                          doubling=DoublingType.PROJECTION)
    ls = LevelSolveMG(intermediate_tol=0.2, intermediate_iters=1000,
                      intermediate_restart_freq=32, pre_iters=2,
                      post_iters=2)
    if update:
        mg.update_level(level, lat_i, transfer, ls, build_stencil=True,
                        is_chiral=True, nvecs=raw)
    else:
        mg.push_level(lat_i, transfer, ls, build_stencil=True,
                      is_chiral=True, nvecs=raw)
    return raw


def test_n22_full_adaptive_ladder():
    """The complete n22 flow at 3 levels x 2 adaptive passes:
    build_coarse_by_restrict initial deeper levels (reference n22:327-333,
    :628-706), per-pass K-cycle self-smoothing with restriction from the
    finer level's test vectors + rebuild-all-coarser (:336-426), ops
    accounting via shift_all_to_nullvec (:428-432), and the solve-phase
    parameter restore (:436-448)."""
    from qmg_tpu.setup import (AdaptiveConfig, build_adaptive_hierarchy,
                               adaptive_pass, finalize_adaptive)

    lat0 = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    g = u1.gauss_gauge_u1(lat0, rng, beta=6.0)
    op = Wilson2D(lat0, -0.05, g)
    acfg = AdaptiveConfig(n_refine=2, coarse_dof=8, x_block=4, y_block=4,
                          n_setup=2)
    mg, tvs = build_adaptive_hierarchy(lat0, op, acfg, rng)
    assert mg.get_num_levels() == 3
    assert mg.get_lattice(2).volume == 1
    assert len(tvs[0]) == 4 and len(tvs[1]) == 4

    b = jnp.asarray(rng.gaussian_cv(lat0))
    iters = []
    res = mg.solve(b, tol=1e-8, max_iter=400, restart_freq=32, track=False)
    assert bool(res.converged)
    iters.append(int(res.iters))

    for _ in range(acfg.n_setup):
        adaptive_pass(mg, tvs, acfg, rng)
        res = mg.solve(b, tol=1e-8, max_iter=400, restart_freq=32,
                       track=False)
        assert bool(res.converged)
        iters.append(int(res.iters))

    # The adaptive passes must not degrade the hierarchy (usually they
    # strictly improve the initial Richardson-only vectors).
    assert iters[-1] <= iters[0] + 2, f"adaptive degraded: {iters}"
    print(f"[QMG-TEST] n22 full ladder iters per pass: {iters}")

    # Ops accounting (reference :428-432, :494-522): after finalize all
    # setup work sits in NULLVEC; Krylov counters restart from zero.
    finalize_adaptive(mg, acfg)
    for lvl in range(3):
        assert mg.get_tracker_count(DSLASH_KRYLOV, lvl) == 0
    assert mg.get_tracker_count(DSLASH_NULLVEC, 0) > 0
    assert mg.get_tracker_count(DSLASH_NULLVEC, 1) > 0
    # Solve-phase params restored (reference :441-448).
    assert mg.get_level_solve(0).intermediate_tol == acfg.inner_tol
    assert mg.get_level_solve(1).intermediate_iters == acfg.inner_max_iter

    res = mg.solve(b, tol=1e-8, max_iter=400, restart_freq=32)
    assert bool(res.converged)
    assert mg.get_tracker_count(DSLASH_KRYLOV, 0) > 0
    avg = mg.query_average_iterations()
    assert avg[0] == float(int(res.iters))


def test_n22_adaptive_setup_improves():
    """Initial Richardson-smoothed vectors, then one adaptive pass that
    re-smooths the test vectors with the current K-cycle itself and
    update_level's the hierarchy - the iteration count must not degrade."""
    lat0 = Lattice2D(L, L, 2)
    lat1 = Lattice2D(4, 4, 8)
    rng = QMGRandom(1337)
    g = u1.gauss_gauge_u1(lat0, rng, beta=6.0)
    op = Wilson2D(lat0, -0.05, g)
    coarsest = CoarsestSolveMG(coarsest_tol=0.2, coarsest_iters=1000,
                               coarsest_restart_freq=32)
    mg = StatefulMultigridMG(lat0, op, coarsest)

    # Initial setup: gaussian -> Richardson(10, omega=0.33, blocksize 250)
    # (reference n22:261-324, :289).
    tv = []
    for j in range(4):
        v = jnp.asarray(rng.gaussian_cv(lat0))
        for w in tv:
            v = orthogonal(v, w)
        res = solvers.richardson(op.get_apply_function(), -op.apply_M(v),
                                 max_iter=10, tol=1e-10, omega=0.33,
                                 blocksize=250)
        mg.add_tracker_count(DSLASH_NULLVEC, int(res.ops_count) + 1, 0)
        v = normalize(v + res.x)
        tv.append(v)
    tv = jnp.stack(tv)
    _push_adaptive_level(mg, lat0, lat1, tv, level=1)

    b = jnp.asarray(rng.gaussian_cv(lat0))
    res0 = mg.solve(b, tol=1e-8, max_iter=400, restart_freq=32)
    iters_initial = int(res0.iters)
    assert bool(res0.converged)

    # Adaptive pass: smooth each test vector with the CURRENT K-cycle
    # (reference n22:373-376), re-orthonormalize, update_level.
    precond = mg.make_preconditioner(0)
    new_tv = []
    for j in range(4):
        z, _ = precond(tv[j], {"counts": jnp.zeros((2, 4), jnp.int32),
                               "iters": jnp.zeros((2,), jnp.int32)})
        v = z
        for w in new_tv:
            v = orthogonal(v, w)
        new_tv.append(normalize(v))
    new_tv = jnp.stack(new_tv)
    _push_adaptive_level(mg, lat0, lat1, new_tv, update=True, level=1)

    # Accounting: fold setup work into NULLVEC (reference n22:428-432).
    mg.shift_all_to_nullvec(0)
    mg.shift_all_to_nullvec(1)
    assert mg.get_tracker_count(DSLASH_KRYLOV, 0) == 0

    res1 = mg.solve(b, tol=1e-8, max_iter=400, restart_freq=32)
    assert bool(res1.converged)
    iters_adaptive = int(res1.iters)
    # Adaptive vectors must not be worse (usually strictly better).
    assert iters_adaptive <= iters_initial + 2, (
        f"adaptive {iters_adaptive} vs initial {iters_initial}")
    print(f"[QMG-TEST] n22 adaptive: {iters_initial} -> {iters_adaptive}")
