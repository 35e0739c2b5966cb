"""Attribute the 2048^2 K-cycle iteration cost (VERDICT r4 item 9).

The 2048^2 flagship solve runs 1544.5 ms / 9 outers = 171.6 ms/iter
(PERF.md round 4) while the identical pipeline does 12.2 ms/iter at
512^2 - a 14x step for 16x the fine-level data, i.e. roughly
bandwidth-scaling, but with no published breakdown. This probe times
the solve's components on the DEVICE state produced by the jitted
channels-first setup (the only practical setup at this size):

  fine        ORIGINAL fine Dslash apply (stacked einsum, xla path)
  restrict    level-0 -> 1 restriction (blocked einsum)
  prolong     level-1 -> 0 prolongation
  smooth2     2-iteration MinRes smoother at level 0 (2 fine applies
              + reductions, the pre+post smoothing of one K-cycle
              visit)
  precond     ONE full K-cycle preconditioner call
  outer1      one fixed outer FGCR trip with precond_mode='none'
              (fine matvec + orthogonalization against stored
              directions + store append)
  solve       full adaptive solve (reference wall time)

All timings are marginal K-vs-2K chains inside one jit (state decode
subtracts out), scalar-fetch synced, min over reps.

Run on the TPU: python scripts/probe_2048_attrib.py [L] [n_refine]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import Wilson2D
from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
from qmg_tpu.setup_planes import make_kcycle_setup_planes, gauss_seed_planes
from qmg_tpu.tpu_compat import (make_planes_solver, host_to_planes,
                                from_planes)
from qmg_tpu import u1, solvers
from qmg_tpu.cache import enable_persistent_cache
from qmg_tpu.rng import QMGRandom

enable_persistent_cache()


def timed_scalar(fn, reps=5):
    """fn() must return a small array; returns best wall seconds."""
    out = fn()
    float(np.asarray(jax.device_get(jnp.sum(jnp.abs(out)))))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(np.asarray(jax.device_get(jnp.sum(jnp.abs(out)))))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_refine = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    restart = 16 if L >= 2048 else 32
    cfg = KCycleConfig(n_refine=n_refine, coarse_dof=8,
                       nullvec_tol=5e-4, nullvec_max_iter=200,
                       inner_restart_freq=8 if L >= 2048 else 32,
                       coarsest_restart_freq=restart,
                       coarsest_direct=True)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        gauge = np.asarray(u1.gauss_gauge_u1(lat, rng, 6.0))
        op = Wilson2D(lat, -0.06, jnp.asarray(gauge), dtype=jnp.complex64)
        mg = build_kcycle_hierarchy(lat, op, cfg, QMGRandom(1),
                                    structure_only=True)
        solve_planes, _ = make_planes_solver(mg, tol=1e-5, max_iter=200,
                                             restart_freq=restart)
        outer_only, _ = make_planes_solver(mg, tol=1e-30, max_iter=200,
                                           restart_freq=restart,
                                           precond_mode="none",
                                           fixed_outer_iters=1)
        outer_only3, _ = make_planes_solver(mg, tol=1e-30, max_iter=200,
                                            restart_freq=restart,
                                            precond_mode="none",
                                            fixed_outer_iters=3)
    setup_fn = make_kcycle_setup_planes(lat, cfg, -0.06,
                                        channels_first=L >= 2048)
    seeds = gauss_seed_planes(lat, cfg, rng)
    g_p = host_to_planes(gauge)
    t0 = time.time()
    state = setup_fn(g_p, *seeds)
    float(np.asarray(jax.device_get(jnp.sum(jnp.abs(
        state[f"nvb{cfg.n_refine - 1}"])))))
    print(f"[attrib] device setup (incl any compile) {time.time()-t0:.1f}s")

    b_p = host_to_planes(rng.gaussian_cv(lat))
    b_dev = jax.device_put(b_p)

    # --- component chains, all driven through the SAME state decode the
    # solve uses (patch machinery via a planes-style wrapper) ---
    def patched(fn_name):
        """Build chain(state, b, K) running K applies of a component
        selected inside the traced solve-style context."""
        def chain(state_, bp, K):
            from qmg_tpu.tpu_compat import _planes_component_chain
            return _planes_component_chain(mg, state_, bp, fn_name, K)
        return jax.jit(chain, static_argnums=(2,))

    comps = ["fine", "transfer", "smooth2", "precond"]
    res = {}
    for name in comps:
        ch = patched(name)
        t1 = timed_scalar(lambda: ch(state, b_dev, 4))
        t2 = timed_scalar(lambda: ch(state, b_dev, 8))
        res[name] = (t2 - t1) / 4
        print(f"[attrib] {name}: {res[name]*1e3:.2f} ms/call "
              f"(marginal, K=4 vs 8)")

    # outer-only FGCR trips (precond = identity)
    oj1 = jax.jit(outer_only)
    oj3 = jax.jit(outer_only3)
    t1 = timed_scalar(lambda: oj1(state, b_dev)[2])
    t3 = timed_scalar(lambda: oj3(state, b_dev)[2])
    outer_marg = (t3 - t1) / 2
    print(f"[attrib] outer1 (fine matvec + GCR store/ortho): "
          f"{outer_marg*1e3:.2f} ms/trip (marginal)")

    sj = jax.jit(solve_planes)
    t0 = time.perf_counter()
    xp, iters, rsq = sj(state, b_dev)
    n_it = int(np.max(np.asarray(iters)))
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    xp, iters, rsq = sj(state, b_dev)
    n_it = int(np.max(np.asarray(iters)))
    dt = time.perf_counter() - t0
    print(f"[attrib] full solve: {dt*1e3:.1f} ms / {n_it} outers = "
          f"{dt*1e3/max(n_it,1):.1f} ms/iter (first warm {t_first*1e3:.1f})"
          f" res_sq={float(np.asarray(rsq)):.3e}")
    per = dt / max(n_it, 1)
    acc = res["precond"] + outer_marg
    print(f"[attrib] model: precond {res['precond']*1e3:.1f} + outer "
          f"{outer_marg*1e3:.1f} = {acc*1e3:.1f} ms/iter vs measured "
          f"{per*1e3:.1f}")


if __name__ == "__main__":
    main()
