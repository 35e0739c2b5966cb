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
    """MIN over individually-synced reps.

    TWO hard-won rules (both violated by earlier revisions of this
    probe, which produced numbers off by ~30x):
      * sync by FETCHING the scalar result (float(np.asarray(...))):
        jax.block_until_ready does NOT reliably wait on the axon
        remote-TPU backend - chain-9 programs "timed" faster than
        chain-1 under it;
      * take the MIN over individually-synced reps: host/tunnel
        dispatch noise (hundreds of ms on a contended single-core
        host) only ever ADDS time.
    ``fn`` must return a SCALAR so the sync fetch is cheap.
    """
    import jax
    f = jax.jit(fn)
    float(np.asarray(jax.device_get(f(*args))))  # warm / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(jax.device_get(f(*args))))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    L = int(args[0]) if args else 256
    nrhs = int(args[1]) if len(args) > 1 else 8
    outers = int(args[2]) if len(args) > 2 else 12
    # Single-variable flips toward bench.py's protocol (the bench/probe
    # steady-state numbers differ ~30x; these isolate the cause).
    use_heatbath = "--heatbath" in sys.argv
    use_direct = "--direct" in sys.argv

    import jax
    import jax.numpy as jnp
    from jax import lax
    from qmg_tpu.lattice import Lattice2D
    from qmg_tpu.operators import Wilson2D
    from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
    from qmg_tpu.tpu_compat import make_planes_solver, host_to_planes
    from qmg_tpu import u1
    from qmg_tpu.rng import QMGRandom

    import os
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        path = ("/root/reference/tests/common_cfgs_u1/"
                f"l{L}t{L}b60_heatbath.dat")
        if use_heatbath and os.path.exists(path):
            gauge = jnp.asarray(u1.read_gauge_u1(lat, path),
                                dtype=jnp.complex64)
        else:
            gauge = jnp.asarray(u1.gauss_gauge_u1(lat, rng, 6.0),
                                dtype=jnp.complex64)
        op = Wilson2D(lat, -0.06, gauge, dtype=jnp.complex64)
        cfg = KCycleConfig(n_refine=2, coarse_dof=8, nullvec_tol=5e-4,
                           nullvec_max_iter=200,
                           coarsest_direct=use_direct)
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

    K_LONG = 9
    for label, sp in (("masked", sp_m), ("fixed", sp_f)):
        t1a = timed(chain(sp, 1, False), (state, b1))
        t1b = timed(chain(sp, K_LONG, False), (state, b1))
        tna = timed(chain(sp, 1, True), (state, bN))
        tnb = timed(chain(sp, K_LONG, True), (state, bN))
        single = (t1b - t1a) / (K_LONG - 1)
        batched = (tnb - tna) / (K_LONG - 1)
        print(f"[{label:6s}] per-solve device cost: single "
              f"{single*1e3:8.2f} ms, batched x{nrhs} {batched*1e3:8.2f} "
              f"ms -> {batched/nrhs*1e3:7.2f} ms/rhs "
              f"(ratio {batched/(nrhs*single):5.2f}); raw chain times "
              f"1/{K_LONG}: single {t1a*1e3:.1f}/{t1b*1e3:.1f} ms, "
              f"batched {tna*1e3:.1f}/{tnb*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
