"""Resolve the SINGLE-side outer-FGCR marginal that
probe_batched_components.py cannot (VERDICT r3 item 3, continued).

At 256^2 a single K-cycle outer iteration costs ~1 ms device-side —
below the axon tunnel's +-10-25 ms per-dispatch noise at the component
probe's k1=8, which is why its single marginals clamp to 0. Here the
single side runs fixed 32-vs-64 outers (marginal ~32 outers, well above
the noise floor) and the batched side fixed 8-vs-16 (its per-outer cost
is ~87 ms at nrhs=8, already resolvable). Figure of merit:

  per-rhs per-outer ratio = (dN / (kN * nrhs)) / (d1 / k1)

(1.0 = batching is per-rhs free; the bench-measured end-to-end
regression is 2.5-3.6x; the K-cycle INNER loops stay adaptive/masked
here, matching make_batched_planes_solver's default mode.)

Usage: python scripts/probe_outer_marginal.py [L] [nrhs] [k1] [kN] [reps]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def bench(fn, args, reps):
    """Min over individually-synced reps; sync = device scalar fetch
    (jax.block_until_ready does not wait on the axon backend)."""
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
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nrhs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    k1 = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    kN = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 10

    import jax
    from qmg_tpu.lattice import Lattice2D
    from qmg_tpu.setup import KCycleConfig
    from qmg_tpu.setup_planes import (make_kcycle_setup_planes,
                                      gauss_seed_planes)
    from qmg_tpu.operators import Wilson2D
    from qmg_tpu.setup import build_kcycle_hierarchy
    from qmg_tpu.tpu_compat import make_planes_solver, host_to_planes
    from qmg_tpu import u1
    from qmg_tpu.rng import QMGRandom
    import jax.numpy as jnp

    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    cpu = jax.devices("cpu")[0]
    cfg = KCycleConfig(n_refine=2, coarse_dof=8, nullvec_tol=5e-4,
                       nullvec_max_iter=200)
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
    dev = jax.devices()[0]
    print(f"[probe] backend {dev.platform} ({dev.device_kind}), L={L}, "
          f"nrhs={nrhs}, single k1={k1}, batched kN={kN}, reps={reps}",
          flush=True)

    def mk(k):
        sp, _ = make_planes_solver(mg, tol=0.0, max_iter=k,
                                   restart_freq=32, fixed_outer_iters=k)
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
    print(f"[probe] per-rhs per-outer batched/single ratio: {ratio:6.2f}",
          flush=True)


if __name__ == "__main__":
    main()
