"""Steady-state DEVICE-SIDE timing of single vs batched K-cycle solves.

probe_batched_components.py showed every pipeline stage batching at
per-rhs ratio 0.15-0.32 under vmap, while bench.py's A/B (one dispatch
per solve) showed batched 3x WORSE per rhs - and a fixed-1-outer solve
costing 2x a converged ~10-outer solve. Both anomalies point at
PER-DISPATCH overhead (remote-tunnel arg marshaling of the ~N-array
state pytree), not device compute. This probe removes dispatch from the
measurement entirely: K chained solves run inside ONE jitted program
(each solve's rhs perturbed by the previous solution, so nothing can be
elided), timed at two chain lengths; the difference isolates the pure
device cost of one solve.

Usage: python scripts/probe_batched_steady.py [L] [nrhs] [outers]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timed(fn, args, reps=5):
    import jax
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nrhs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    outers = int(sys.argv[3]) if len(sys.argv) > 3 else 12

    import jax
    import jax.numpy as jnp
    from jax import lax
    from qmg_tpu.lattice import Lattice2D
    from qmg_tpu.operators import Wilson2D
    from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
    from qmg_tpu.tpu_compat import make_planes_solver, host_to_planes
    from qmg_tpu import u1
    from qmg_tpu.rng import QMGRandom

    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        gauge = jnp.asarray(u1.gauss_gauge_u1(lat, rng, 6.0),
                            dtype=jnp.complex64)
        op = Wilson2D(lat, -0.06, gauge, dtype=jnp.complex64)
        cfg = KCycleConfig(n_refine=2, coarse_dof=8, nullvec_tol=5e-4,
                           nullvec_max_iter=200)
        mg = build_kcycle_hierarchy(lat, op, cfg, rng)
        # Masked (tolerance-stopping) solver, the production config.
        sp_m, state = make_planes_solver(mg, tol=1e-5, max_iter=outers,
                                         restart_freq=32)
        # Fixed-schedule solver (no stopping test).
        sp_f, _ = make_planes_solver(mg, tol=0.0, max_iter=outers,
                                     restart_freq=32,
                                     fixed_outer_iters=outers)
        b1 = host_to_planes(rng.gaussian_cv(lat))
        bN = np.stack([host_to_planes(rng.gaussian_cv(lat))
                       for _ in range(nrhs)])

    dev = jax.devices()[0]
    print(f"[steady] backend {dev.platform} ({dev.device_kind}), L={L}, "
          f"nrhs={nrhs}, outers={outers}", flush=True)

    def chain(sp, k, batched):
        """k solves inside one program, each seeded from the last."""
        def run(state, b):
            def body(_, carry):
                b_cur, acc = carry
                x, iters, rsq = sp(state, b_cur)
                # Rotate the rhs by a solution-dependent perturbation so
                # no solve can be collapsed or hoisted.
                b_next = b + 1e-3 * x
                return b_next, acc + rsq
            b_fin, acc = lax.fori_loop(0, k, body, (b, jnp.float32(0.0)))
            return acc
        if batched:
            run_b = jax.vmap(run, in_axes=(None, 0))
            return lambda state, b: jnp.sum(run_b(state, b))
        return run

    for label, sp in (("masked", sp_m), ("fixed", sp_f)):
        t1a = timed(chain(sp, 1, False), (state, b1))
        t1b = timed(chain(sp, 5, False), (state, b1))
        tna = timed(chain(sp, 1, True), (state, bN))
        tnb = timed(chain(sp, 5, True), (state, bN))
        single = (t1b - t1a) / 4
        batched = (tnb - tna) / 4
        print(f"[{label:6s}] per-solve device cost: single "
              f"{single*1e3:8.2f} ms, batched x{nrhs} {batched*1e3:8.2f} "
              f"ms -> {batched/nrhs*1e3:7.2f} ms/rhs "
              f"(ratio {batched/(nrhs*single):5.2f}); per-dispatch "
              f"overhead est single {(t1a-single)*1e3:7.2f} ms, batched "
              f"{(tna-batched)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
