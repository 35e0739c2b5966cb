"""A/B: standard planes K-cycle vs the channels-first solve (cf_solve)
at a given size on the TPU.  Same state, same schedule, same tol;
reports wall, iters, and the true reconstructed residual for both.

Run: python scripts/probe_cf_solve.py [L] [n_refine] [tol]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import Wilson2D
from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
from qmg_tpu.setup_planes import make_kcycle_setup_planes, gauss_seed_planes
from qmg_tpu.tpu_compat import make_planes_solver, host_to_planes
from qmg_tpu.cf_solve import make_cf_planes_solver
from qmg_tpu import u1
from qmg_tpu.cache import enable_persistent_cache
from qmg_tpu.rng import QMGRandom

enable_persistent_cache()


def run(sj, state, b_dev, label):
    t0 = time.perf_counter()
    xp, iters, rsq = sj(state, b_dev)
    n_it = int(np.max(np.asarray(iters)))
    warm = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        xp, iters, rsq = sj(state, b_dev)
        n_it = int(np.max(np.asarray(iters)))
        best = min(best, time.perf_counter() - t0)
    print(f"[cf-ab] {label}: {best*1e3:.1f} ms / {n_it} outers = "
          f"{best*1e3/max(n_it,1):.1f} ms/iter  rsq {float(np.asarray(rsq)):.3e}"
          f"  (first-warm {warm*1e3:.1f})", flush=True)
    return xp


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_refine = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-5
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    restart = 16 if L >= 2048 else 32
    inner_restart = 8 if L >= 2048 else 32
    cfg = KCycleConfig(n_refine=n_refine, coarse_dof=8,
                       nullvec_tol=5e-4, nullvec_max_iter=200,
                       inner_restart_freq=inner_restart,
                       coarsest_restart_freq=restart,
                       coarsest_direct=True)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        gauge = np.asarray(u1.gauss_gauge_u1(lat, rng, 6.0))
        op = Wilson2D(lat, -0.06, jnp.asarray(gauge), dtype=jnp.complex64)
        mg = build_kcycle_hierarchy(lat, op, cfg, QMGRandom(1),
                                    structure_only=True)
        solve_std, _ = make_planes_solver(mg, tol=tol, max_iter=200,
                                          restart_freq=restart)
        solve_cf = make_cf_planes_solver(mg, tol=tol, max_iter=200,
                                         restart_freq=restart,
                                         inner_restart_freq=inner_restart)
    setup_fn = make_kcycle_setup_planes(lat, cfg, -0.06,
                                        channels_first=L >= 2048)
    seeds = gauss_seed_planes(lat, cfg, rng)
    t0 = time.time()
    state = setup_fn(host_to_planes(gauge), *seeds)
    float(np.asarray(jax.device_get(jnp.sum(jnp.abs(
        state[f"nvb{cfg.n_refine - 1}"])))))
    print(f"[cf-ab] device setup {time.time()-t0:.1f}s", flush=True)
    b_dev = jax.device_put(host_to_planes(rng.gaussian_cv(lat)))

    run(jax.jit(solve_std), state, b_dev, f"standard {L}^2")
    run(jax.jit(solve_cf), state, b_dev, f"cf       {L}^2")


if __name__ == "__main__":
    main()
