"""Sharded Dslash (shard_map + ppermute halo exchange) vs single-device
apply, on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import Wilson2D, Staggered2D
from qmg_tpu.stencil import apply_M
from qmg_tpu.shard_dslash import make_sharded_dslash
from qmg_tpu import u1, parallel
from qmg_tpu.rng import QMGRandom


@pytest.fixture(scope="module", autouse=True)
def _clear_jit_caches():
    # The sharded SPMD compiles here are the largest modules in the
    # suite; XLA's CPU compiler has been observed to segfault on them
    # late in a long session (~120 tests of accumulated executables).
    # Dropping the jit caches before this module reliably avoids it.
    jax.clear_caches()
    yield


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return parallel.make_mesh(8)


@pytest.mark.parametrize("kind", ["wilson", "staggered"])
def test_sharded_matches_single(mesh, kind):
    rng = QMGRandom(1337)
    if kind == "wilson":
        lat = Lattice2D(32, 32, 2)
        g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
        op = Wilson2D(lat, -0.07, g)
    else:
        lat = Lattice2D(32, 32, 1)
        g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
        op = Staggered2D(lat, 0.1, g)
    x = jnp.asarray(rng.gaussian_cv(lat))
    expect = np.asarray(apply_M(op.coeffs, x))

    apply_sharded = jax.jit(make_sharded_dslash(op.coeffs, mesh))
    xs = parallel.shard_field(x, mesh)
    got = np.asarray(apply_sharded(xs))
    np.testing.assert_allclose(got, expect, atol=1e-12)


def test_sharded_rejects_bad_tiling(mesh):
    lat = Lattice2D(12, 12, 1)  # Xh=6 does not tile the x axis
    g = u1.unit_gauge_u1(lat)
    op = Staggered2D(lat, 0.1, g)
    with pytest.raises(ValueError, match="tile the mesh|Y_loc"):
        make_sharded_dslash(op.coeffs, mesh)


def test_sharded_solver_end_to_end(mesh):
    """A full CG solve over the sharded operator (reductions become
    all-reduces under jit)."""
    from qmg_tpu import solvers
    from qmg_tpu.linalg import norm2sq
    lat = Lattice2D(32, 32, 1)
    rng = QMGRandom(2)
    g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    from qmg_tpu.operators import GaugedLaplace2D
    op = GaugedLaplace2D(lat, 0.01, g)
    apply_sharded = make_sharded_dslash(op.coeffs, mesh)
    b = parallel.shard_field(jnp.asarray(rng.gaussian_cv(lat)), mesh)
    res = jax.jit(lambda b: solvers.cg(apply_sharded, b, max_iter=2000,
                                       tol=1e-10))(b)
    assert bool(res.converged)
    resid = float(jnp.sqrt(norm2sq(b - op.apply_M(res.x)) / norm2sq(b)))
    assert resid < 1e-9


def test_validate_mg_sharding_and_crossover(mesh):
    from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
    lat = Lattice2D(32, 32, 2)
    rng = QMGRandom(1337)
    op = Wilson2D(lat, 0.1, u1.unit_gauge_u1(lat))
    cfg = KCycleConfig(n_refine=2, coarse_dof=2, free_null_vectors=True)
    mg = build_kcycle_hierarchy(lat, op, cfg, rng)
    parallel.validate_mg_sharding(mg, mesh)  # 32x32 / (4,2) mesh: fine ok
    # 8x8 level: Xh=4 tiles mx=2, but Y_loc = 8/4 = 2 is even -> still ok;
    # 2x2 level: Y=2 does not tile my=4 -> crossover at level 2.
    assert parallel.replication_crossover(mg, mesh) == 2
    with pytest.raises(ValueError, match="does not tile"):
        parallel.validate_mg_sharding(mg, mesh, level=2)


def test_replicate_coarse_levels_preserves_solve(mesh):
    """Explicit gather-to-replicated crossover: replicating the coarse
    levels changes placements only, not the trajectory."""
    jax.clear_caches()  # big SPMD compile: see _clear_jit_caches
    from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
    lat = Lattice2D(32, 32, 2)
    rng = QMGRandom(1337)
    g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    op = Wilson2D(lat, -0.05, g)
    cfg = KCycleConfig(n_refine=1, coarse_dof=4, nullvec_max_iter=100,
                       nullvec_tol=1e-3)
    mg = build_kcycle_hierarchy(lat, op, cfg, rng)
    b = jnp.asarray(rng.gaussian_cv(lat))
    ref = mg.solve(b, tol=1e-8, max_iter=100, track=False)

    op.coeffs = parallel.shard_coeffs(op.coeffs, mesh)
    op.apply_override = make_sharded_dslash(op.coeffs, mesh)
    try:
        parallel.replicate_coarse_levels(mg, mesh)
        res = mg.solve(parallel.shard_field(b, mesh), tol=1e-8,
                       max_iter=100, track=False)
    finally:
        op.apply_override = None
    assert int(res.iters) == int(ref.iters)
    from qmg_tpu.linalg import norm2sq
    resid = float(jnp.sqrt(norm2sq(b - op.apply_M(res.x)) / norm2sq(b)))
    assert resid < 1e-7


def test_dryrun_multichip_contract():
    """The driver's exact call shape: dryrun_multichip(8) through the
    self-provisioning SUBPROCESS path (what actually runs when the
    driver calls in on the 1-chip axon backend). The subprocess also
    keeps the heaviest sharded compile out of this long-lived test
    process: XLA's CPU compiler can segfault on the big SPMD K-cycle
    module late in a full-suite session (reproduced at ~120 tests in),
    while a fresh process compiles it fine."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as gmod
    gmod.dryrun_multichip(8, force_subprocess=True)


def test_mg_solve_with_sharded_fine_dslash(mesh):
    """Full K-cycle solve with the fine-level Dslash routed through the
    explicit shard_map+ppermute apply (apply_override hook); coarse
    levels and transfers ride XLA auto-sharding."""
    jax.clear_caches()  # big SPMD compile: see _clear_jit_caches
    from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
    from qmg_tpu.rng import QMGRandom
    from qmg_tpu.linalg import norm2sq

    lat = Lattice2D(32, 32, 2)
    rng = QMGRandom(1337)
    g = u1.unit_gauge_u1(lat)
    op = Wilson2D(lat, 0.1, g)
    cfg = KCycleConfig(n_refine=1, coarse_dof=2, free_null_vectors=True)
    mg = build_kcycle_hierarchy(lat, op, cfg, rng)
    b = jnp.asarray(rng.gaussian_cv(lat))
    ref = mg.solve(b, tol=1e-8, max_iter=200, track=False)

    op.apply_override = make_sharded_dslash(op.coeffs, mesh)
    try:
        bs = parallel.shard_field(b, mesh)
        res = mg.solve(bs, tol=1e-8, max_iter=200, track=False)
    finally:
        op.apply_override = None
    assert int(res.iters) == int(ref.iters)
    resid = float(jnp.sqrt(norm2sq(b - op.apply_M(res.x)) / norm2sq(b)))
    assert resid < 1e-7


@pytest.fixture(scope="module")
def ymesh():
    """x-unsharded (4, 1) mesh for the sharded Pallas kernel (the
    kernel streams full rows on the lane axis; y-slab decomposition)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    return parallel.make_mesh(4, shape=(4, 1))


def test_sharded_pallas_wilson_matches_single(ymesh):
    """VERDICT r2 item 3: the rank-1 phase Pallas kernel inside
    shard_map (halo-frame variant, ppermute y-halos, interpret mode on
    the CPU mesh) must reproduce the stencil apply."""
    jax.clear_caches()  # big SPMD compile: see _clear_jit_caches
    from qmg_tpu.shard_dslash import make_sharded_pallas_wilson
    lat = Lattice2D(32, 32, 2)
    rng = QMGRandom(1337)
    g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    op = Wilson2D(lat, -0.07, jnp.asarray(g), dtype=jnp.complex64)
    x = jnp.asarray(rng.gaussian_cv(lat)).astype(jnp.complex64)
    expect = np.asarray(apply_M(op.coeffs, x))

    apply_fn = jax.jit(make_sharded_pallas_wilson(
        op.coeffs, ymesh, mass=-0.07, tile=8, interpret=True))
    xs = parallel.shard_field(x, ymesh)
    got = np.asarray(apply_fn(xs))
    np.testing.assert_allclose(got, expect, atol=5e-5)


def test_sharded_pallas_wilson_rejects_x_sharding(mesh):
    from qmg_tpu.shard_dslash import make_sharded_pallas_wilson
    lat = Lattice2D(32, 32, 2)
    op = Wilson2D(lat, -0.07, u1.unit_gauge_u1(lat))
    with pytest.raises(ValueError, match="x-unsharded"):
        make_sharded_pallas_wilson(op.coeffs, mesh, mass=-0.07)


def test_planes_solver_mesh_pallas_trajectory(ymesh):
    """make_planes_solver(mesh=..., use_pallas_fine=True,
    pallas_kind='wilson-r1') - the sharded fused fine kernel inside the
    whole MG solve - must track the unsharded planes solve's trajectory
    (VERDICT r2 item 3 done-criterion)."""
    jax.clear_caches()  # big SPMD compile: see _clear_jit_caches
    from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
    from qmg_tpu.tpu_compat import (make_planes_solver, shard_planes_state,
                                    host_to_planes, from_planes)
    from qmg_tpu.linalg import norm2sq
    lat = Lattice2D(32, 32, 2)
    rng = QMGRandom(1337)
    g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    op = Wilson2D(lat, -0.05, g)
    cfg = KCycleConfig(n_refine=1, coarse_dof=4, nullvec_max_iter=100,
                       nullvec_tol=1e-3)
    mg = build_kcycle_hierarchy(lat, op, cfg, rng)
    b = jnp.asarray(rng.gaussian_cv(lat))
    b_p = host_to_planes(np.asarray(b, np.complex64))

    # tol must sit ABOVE the c64 stagnation floor (~1e-6 relative,
    # rsq ~1e-12 x bsq): AT the floor, iteration counts are chaotic in
    # the reduction order (measured: 33 unsharded vs 16 mesh at
    # tol=1e-6, while at 1e-5 every path lands on exactly 14).
    sp0, st0 = make_planes_solver(mg, tol=1e-5, max_iter=200,
                                  restart_freq=32)
    _, iters0, _ = jax.jit(sp0)(st0, b_p)

    sp, st = make_planes_solver(mg, tol=1e-5, max_iter=200,
                                restart_freq=32, mesh=ymesh,
                                use_pallas_fine=True,
                                pallas_kind="wilson-r1",
                                pallas_interpret=True)
    stp, bp = shard_planes_state(st, ymesh, b_p)
    x_p, iters, _ = jax.jit(sp)(stp, bp)
    # c64 + SPMD reduction order + the f32 kernel boundary can flip the
    # stopping test by an iteration either way.
    assert abs(int(iters) - int(iters0)) <= 1
    x = from_planes(x_p).astype(b.dtype)
    resid = float(jnp.sqrt(norm2sq(b - op.apply_M(x)) / norm2sq(b)))
    assert resid < 1e-4
