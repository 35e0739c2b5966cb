"""Isolate WHERE the batched multi-RHS K-cycle regression lives
(VERDICT r3 item 3, continued; PERF.md "Marginal census").

probe_outer_marginal.py established the end-to-end figure (batched
outer ~10.9 ms/rhs/outer vs ~1 ms single at 256^2/nrhs 8). This probe
runs the same fixed-k-vs-2k marginal protocol on three surgical
variants that partition the outer iteration's composition:

  outer0  - precond = identity: a plain restarted fine-level FGCR.
            Isolates the batched (nrhs, R, n) direction-store
            composition (betas projections, dynamic_update_slice
            stores, restart cond) with NO preconditioner at all.
  inner0  - K-cycle with intermediate_iters=0 (fixed_trips) + direct
            coarsest: outer FGCR + smoothers + restrict/prolong +
            prepare/reconstruct, but NO level-1 Krylov loop.
  fixed   - K-cycle with intermediate_iters=K1 fixed trips + direct
            coarsest: adds the level-1 GCR loop as a fully static
            (unmasked-under-vmap) program.

Comparing the three batched marginals against each other and against
probe_outer_marginal's adaptive row assigns the regression to (a) the
outer store composition, (b) the transfer/smoother sandwich, (c) the
static inner-loop body, or (d) the per-lane masking of the adaptive
inner loops - the four candidates PERF.md's diagnosis trail left open.

Sync protocol: device-scalar fetch, min over individually-synced reps
(jax.block_until_ready does not wait on the axon backend).

Usage: python scripts/probe_batched_isolate.py MODE [L] [nrhs] [k1] [kN]
       [reps] [inner_k]
  MODE in {outer0, inner0, fixed}
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def bench(fn, args, reps):
    import jax
    import jax.numpy as jnp

    def scalar_fn(*a):
        out = fn(*a)
        return jax.tree_util.tree_reduce(
            lambda acc, x: acc + jnp.sum(jnp.abs(x)), out,
            jnp.float32(0.0))

    f = jax.jit(scalar_fn)
    float(np.asarray(jax.device_get(f(*args))))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(jax.device_get(f(*args))))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "outer0"
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    nrhs = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    k1 = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    kN = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    reps = int(sys.argv[6]) if len(sys.argv) > 6 else 6
    inner_k = int(sys.argv[7]) if len(sys.argv) > 7 else 4
    assert mode in ("outer0", "inner0", "fixed"), mode

    import jax
    import jax.numpy as jnp
    from qmg_tpu.lattice import Lattice2D
    from qmg_tpu.operators import Wilson2D
    from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
    from qmg_tpu.setup_planes import (make_kcycle_setup_planes,
                                      gauss_seed_planes)
    from qmg_tpu.tpu_compat import make_planes_solver, host_to_planes
    from qmg_tpu import u1
    from qmg_tpu.rng import QMGRandom

    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    cpu = jax.devices("cpu")[0]
    cfg = KCycleConfig(n_refine=2, coarse_dof=8, nullvec_tol=5e-4,
                       nullvec_max_iter=200,
                       coarsest_direct=(mode != "outer0"))
    with jax.default_device(cpu):
        gauge = jnp.asarray(u1.gauss_gauge_u1(lat, rng, 6.0),
                            dtype=jnp.complex64)
        op = Wilson2D(lat, -0.06, gauge, dtype=jnp.complex64)
        mg = build_kcycle_hierarchy(lat, op, cfg, rng, structure_only=True)
        b1 = host_to_planes(rng.gaussian_cv(lat))
        bN = np.stack([host_to_planes(rng.gaussian_cv(lat))
                       for _ in range(nrhs)])
    setup_fn = make_kcycle_setup_planes(lat, cfg, -0.06)
    seeds = gauss_seed_planes(lat, cfg, QMGRandom(1337))
    state = setup_fn(host_to_planes(np.asarray(gauge)), *seeds)
    float(np.asarray(jax.device_get(
        jnp.sum(jnp.abs(state[f"nvb{cfg.n_refine - 1}"])))))

    if mode in ("inner0", "fixed"):
        for lvl in range(1, mg.get_num_levels() - 1):
            ls = mg.get_level_solve(lvl)
            ls.fixed_trips = True
            ls.intermediate_iters = 0 if mode == "inner0" else inner_k

    dev = jax.devices()[0]
    print(f"[probe] mode={mode} backend {dev.platform} "
          f"({dev.device_kind}), L={L}, nrhs={nrhs}, single k1={k1}, "
          f"batched kN={kN}, reps={reps}, inner_k={inner_k}", flush=True)

    def mk(k):
        sp, _ = make_planes_solver(
            mg, tol=0.0, max_iter=k, restart_freq=32,
            fixed_outer_iters=k,
            precond_mode=("none" if mode == "outer0" else "mg"))
        return sp

    t1a = bench(mk(k1), (state, b1), reps)
    t1b = bench(mk(2 * k1), (state, b1), reps)
    d1 = t1b - t1a
    print(f"[single ] {k1} outers {t1a*1e3:8.1f} ms, {2*k1} outers "
          f"{t1b*1e3:8.1f} ms -> marginal {d1*1e3:8.2f} ms "
          f"({d1*1e3/k1:6.3f} ms/outer)", flush=True)

    vN = jax.vmap(mk(kN), in_axes=(None, 0))
    v2N = jax.vmap(mk(2 * kN), in_axes=(None, 0))
    tNa = bench(vN, (state, bN), reps)
    tNb = bench(v2N, (state, bN), reps)
    dN = tNb - tNa
    print(f"[batched] {kN} outers {tNa*1e3:8.1f} ms, {2*kN} outers "
          f"{tNb*1e3:8.1f} ms -> marginal {dN*1e3:8.2f} ms "
          f"({dN*1e3/(kN*nrhs):6.3f} ms/rhs/outer)", flush=True)

    ratio = (dN / (kN * nrhs)) / max(d1 / k1, 1e-9)
    print(f"[probe] mode={mode} per-rhs per-outer batched/single "
          f"ratio: {ratio:6.2f}", flush=True)


if __name__ == "__main__":
    main()
