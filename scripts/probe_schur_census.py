"""Census of the n19 Schur K-cycle's per-level op counts vs standard.

The 512^2 A/B (PERF.md round 4) has Schur at 566 ms / 6 outers vs
standard 109.6 ms / 9 outers - ~8x per outer iteration. Two hypotheses:
  (a) the Schur configuration runs MORE stencil applies per outer
      (different inner-trip structure / prepare+reconstruct per visit);
  (b) each Schur apply is SLOWER than each standard apply (apply
      formulation problem).
This probe separates them with the Dslash trackers (op counts are
platform-independent) on CPU, then optionally times single applies per
level on the live backend with the marginal K-vs-2K protocol.

Usage: python scripts/probe_schur_census.py [L] [--time]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def build(L, schur):
    import jax.numpy as jnp
    from qmg_tpu.lattice import Lattice2D
    from qmg_tpu.rng import QMGRandom
    from qmg_tpu import u1
    from qmg_tpu.operators.wilson import Wilson2D
    from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
    from qmg_tpu.stencil import StencilType
    from qmg_tpu.operators.coarse import CoarseOperator2D

    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    import os
    path = ("/root/reference/tests/common_cfgs_u1/"
            f"l{L}t{L}b60_heatbath.dat")
    if os.path.exists(path):
        gauge = jnp.asarray(u1.read_gauge_u1(lat, path), jnp.complex128)
    else:
        gauge = jnp.asarray(u1.gauss_gauge_u1(lat, rng, 6.0),
                            jnp.complex128)
    op = Wilson2D(lat, -0.06, gauge, dtype=gauge.dtype)
    kw = {}
    if schur:
        kw = dict(fine_stencil_app=StencilType.RIGHT_SCHUR,
                  coarsest_stencil_app=StencilType.RIGHT_SCHUR,
                  nullvec_stype=StencilType.RIGHT_JACOBI,
                  nullvec_solver="gcr_restart",
                  precond_coarsen_rbjacobi=True,
                  build_extra=CoarseOperator2D.BUILD_RBJACOBI)
    cfg = KCycleConfig(n_refine=2 if L <= 256 else 3, coarse_dof=8,
                       nullvec_tol=5e-4, nullvec_max_iter=200,
                       coarsest_direct=True, **kw)
    mg = build_kcycle_hierarchy(lat, op, cfg, rng)
    return lat, rng, mg, (StencilType.RIGHT_SCHUR if schur
                          else StencilType.ORIGINAL)


def census(L):
    from qmg_tpu.stencil import StencilType
    for label, schur in (("standard", False), ("schur", True)):
        lat, rng, mg, outer_type = build(L, schur)
        b = rng.gaussian_cv(lat)
        if schur:
            b = mg.get_stencil(0).prepare_M(b, outer_type)
        for tr in mg.dslash_tracker_list:
            tr.reset_tracker()
        res = mg.solve(b, tol=1e-5, max_iter=200, restart_freq=32,
                       outer_type=outer_type, track=True)
        print(f"[{label}] outer iters={int(res.iters)} "
              f"converged={bool(res.converged)}")
        for lvl in range(mg.get_num_levels()):
            tr = mg.dslash_tracker_list[lvl]
            print(f"  level {lvl}: total applies={tr.get_total_count()} "
                  f"tracker={dict(tr.tracker)} "
                  f"krylov_iters={tr.get_iterations_count()}")


def timed(fn, args, reps=5):
    import jax
    import jax.numpy as jnp

    def scalar(*a):
        return jnp.sum(jnp.abs(fn(*a)))

    f = jax.jit(scalar)
    float(np.asarray(jax.device_get(f(*args))))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(jax.device_get(f(*args))))
        best = min(best, time.perf_counter() - t0)
    return best


def time_applies(L, K=64):
    """Marginal per-apply time, ORIGINAL vs RIGHT_SCHUR, each level."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from qmg_tpu.stencil import StencilType

    lat, rng, mg, _ = build(L, True)
    for lvl in range(mg.get_num_levels()):
        st = mg.get_stencil(lvl)
        for stype in (StencilType.ORIGINAL, StencilType.RIGHT_SCHUR):
            shape = st.solve_size_shape(stype)
            x = jnp.asarray(
                np.random.default_rng(0).standard_normal(shape)
                + 1j * np.random.default_rng(1).standard_normal(shape),
                jnp.complex64)
            apply_fn = st.get_apply_function(stype)

            def chain(x0, k):
                def body(_, v):
                    out = apply_fn(v)
                    return out / jnp.sqrt(
                        jnp.sum(jnp.abs(out) ** 2) + 1.0)
                return lax.fori_loop(0, k, body, x0)

            t1 = timed(lambda v: chain(v, K), (x,))
            t2 = timed(lambda v: chain(v, 2 * K), (x,))
            per = (t2 - t1) / K * 1e3
            print(f"  level {lvl} {stype.name}: {per:.4f} ms/apply "
                  f"(marginal, K={K})")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    L = int(args[0]) if args else 128
    import jax
    if "--time" in sys.argv:
        # Timing runs on the ambient backend (TPU under axon).
        print(f"[probe] backend {jax.default_backend()}, L={L}")
        time_applies(L)
    else:
        # Op-count census is platform-independent; CPU fp64 (the
        # sitecustomize pre-registers axon, so override via config).
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        census(L)


if __name__ == "__main__":
    main()
