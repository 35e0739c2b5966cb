"""Probe: per-outer marginal vs once-per-solve intercept, n19 Schur.

The 512^2 Schur planes solve costs 650 ms / 6 outers while the standard
one costs 113 ms / 9 (PERF.md round 5) even though the Schur run makes
FEWER stencil applies at every level (census, 128^2). Two remaining
suspects:
  (a) once-per-solve work: the planes solver re-derives rbjacobi
      (QR / B^-1 chains) + the fused Schur composition from the traced
      coefficients INSIDE every solve call;
  (b) per-outer work: the Schur K-cycle's per-visit prepare/reconstruct
      or the half-space applies lower badly.
Separate them with fixed-outer planes solvers: intercept = t(1 outer) -
marginal, marginal = (t(K) - t(1)) / (K - 1).

Run: python scripts/probe_schur_marginal.py [L] [schur|std]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import Wilson2D
from qmg_tpu.operators.coarse import CoarseOperator2D
from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
from qmg_tpu.stencil import StencilType
from qmg_tpu.tpu_compat import make_planes_solver, host_to_planes
from qmg_tpu import u1
from qmg_tpu.rng import QMGRandom


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    schur = (sys.argv[2] if len(sys.argv) > 2 else "schur") == "schur"
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)

    cpu = jax.devices("cpu")[0]
    kw = {}
    if schur:
        kw = dict(fine_stencil_app=StencilType.RIGHT_SCHUR,
                  coarsest_stencil_app=StencilType.RIGHT_SCHUR,
                  nullvec_stype=StencilType.RIGHT_JACOBI,
                  nullvec_solver="gcr_restart",
                  precond_coarsen_rbjacobi=True,
                  build_extra=CoarseOperator2D.BUILD_RBJACOBI)
    n_refine = 2 if L <= 256 else 3
    cfg = KCycleConfig(n_refine=n_refine, coarse_dof=8,
                       nullvec_tol=5e-4, nullvec_max_iter=200,
                       coarsest_direct=True, **kw)
    with jax.default_device(cpu):
        gauge = jnp.asarray(u1.gauss_gauge_u1(lat, rng, 6.0),
                            jnp.complex64)
        op = Wilson2D(lat, -0.06, gauge, dtype=jnp.complex64)
        t0 = time.time()
        mg = build_kcycle_hierarchy(lat, op, cfg, rng)
        print(f"[probe] host setup {time.time()-t0:.1f}s")
        b = rng.gaussian_cv(lat)
    b_p = host_to_planes(np.asarray(b))
    otype = StencilType.RIGHT_SCHUR if schur else None

    results = {}
    for k_out in (1, 4):
        with jax.default_device(cpu):
            solve_planes, state = make_planes_solver(
                mg, tol=1e-30, max_iter=200, restart_freq=32,
                outer_type=otype, fixed_outer_iters=k_out)
        solve = jax.jit(solve_planes)
        dev = jax.devices()[0]
        state_d = jax.device_put(state, dev)
        b_d = jax.device_put(b_p, dev)
        t0 = time.time()
        x, it, rsq = solve(state_d, b_d)
        float(np.asarray(jax.device_get(rsq)))
        print(f"[probe] k={k_out} cold (incl compile) {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            x, it, rsq = solve(state_d, b_d)
            float(np.asarray(jax.device_get(rsq)))
            best = min(best, time.perf_counter() - t0)
        results[k_out] = best
        print(f"[probe] k={k_out}: {best*1e3:.1f} ms  res_sq="
              f"{float(np.asarray(jax.device_get(rsq))):.3e}")

    t1, tk = results[1], results[4]
    marg = (tk - t1) / 3
    print(f"[probe] {'schur' if schur else 'std'} L={L}: per-outer "
          f"marginal {marg*1e3:.1f} ms, once-per-solve intercept "
          f"{(t1 - marg)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
