"""2048^2 device-resident setup + solve on the TPU (VERDICT r3 item 1).

The standard complex-arithmetic fine stage fails XLA layout assignment
at 2048^2 (PERF.md); the channels-first stage (cf.py,
make_kcycle_setup_planes(channels_first=True)) keeps every fine-lattice
buffer real with (Y, Xh)-minor layouts. This script runs the full
setup -> planes-solve pipeline at a given size on the axon TPU and
reports wall times.

Usage: python scripts/tpu_setup_2048.py [L] [n_refine] [--std]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import Wilson2D
from qmg_tpu.operators.wilson import wilson_coeffs_numpy
from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
from qmg_tpu.setup_planes import (make_kcycle_setup_planes,
                                  gauss_seed_planes)
from qmg_tpu.tpu_compat import (make_planes_solver, host_to_planes,
                                from_planes)
from qmg_tpu import u1
from qmg_tpu.rng import QMGRandom


def sync(x):
    return float(jnp.sum(jnp.abs(x)))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    L = int(args[0]) if args else 2048
    n_refine = int(args[1]) if len(args) > 1 else (3 if L <= 1024 else 4)
    channels_first = "--std" not in sys.argv
    mass = -0.06
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    dev = jax.devices()[0]
    print(f"[2048] L={L} n_refine={n_refine} cf={channels_first} "
          f"dev={dev.device_kind}", flush=True)

    cfg = KCycleConfig(n_refine=n_refine, coarse_dof=8,
                       coarsest_direct=True,
                       inner_restart_freq=8 if L >= 2048 else 32,
                       coarsest_restart_freq=16 if L >= 2048 else 32)
    t0 = time.time()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        gauge = np.asarray(u1.gauss_gauge_u1(lat, rng, 6.0))
        seeds = gauss_seed_planes(lat, cfg, rng)
    gauge_p = host_to_planes(gauge)
    print(f"[2048] host gauge+seeds: {time.time() - t0:.1f} s", flush=True)

    setup = make_kcycle_setup_planes(lat, cfg, mass,
                                     channels_first=channels_first)
    t0 = time.time()
    gauge_d = jax.device_put(gauge_p, dev)
    seeds_d = [jax.device_put(s, dev) for s in seeds]
    state = setup(gauge_d, *seeds_d)
    cks = sync(state[f"clover{n_refine}"])
    t1 = time.time()
    print(f"[2048] setup (incl compile): {t1 - t0:.1f} s, coarsest "
          f"clover checksum {cks:.4e}", flush=True)
    # Warm rebuild with fresh seeds = the n16 per-config cost.
    with jax.default_device(cpu):
        seeds2 = gauss_seed_planes(lat, cfg, rng)
    seeds2_d = [jax.device_put(s, dev) for s in seeds2]
    t0 = time.time()
    state = setup(gauge_d, *seeds2_d)
    cks = sync(state[f"clover{n_refine}"])
    t1 = time.time()
    print(f"[2048] warm setup rebuild: {t1 - t0:.2f} s", flush=True)

    # Solve leg: planes K-cycle on the built state.
    with jax.default_device(cpu):
        clover, hopping = wilson_coeffs_numpy(lat, jnp.asarray(gauge))
        op = Wilson2D.__new__(Wilson2D)
        from qmg_tpu.stencil import Stencil2D, make_coeffs
        op._dtype = jnp.complex64
        op.wilson_coeff = 1.0
        Stencil2D.__init__(op, make_coeffs(
            lat, clover=jnp.asarray(clover, jnp.complex64),
            hopping=jnp.asarray(hopping, jnp.complex64), shift=mass,
            dtype=jnp.complex64))
        mg = build_kcycle_hierarchy(lat, op, cfg, rng,
                                    structure_only=True)
        use_pallas = lat.xh % 128 == 0  # kernel lane requirement
        # Right-size the GCR direction stores at >= 2048^2 (bench.py
        # does the same): the flat (R, n) outer store at R=32 is 4 GiB
        # and OOMs the 16 GB chip once the setup state is resident.
        restart = 16 if L >= 2048 else 32
        solve, _ = make_planes_solver(
            mg, tol=1e-6, max_iter=200, restart_freq=restart,
            use_pallas_fine=use_pallas,
            pallas_kind="wilson-r1" if use_pallas else None)
        b = np.asarray(rng.gaussian_cv(lat)).astype(np.complex64)
    b_d = jax.device_put(host_to_planes(b), dev)
    jit = jax.jit(solve)
    t0 = time.time()
    x_p, iters, rsq = jit(state, b_d)
    s = sync(x_p)
    t1 = time.time()
    print(f"[2048] solve (incl compile): {t1 - t0:.1f} s, "
          f"iters={int(iters)} rsq={float(rsq):.3e}", flush=True)
    t0 = time.time()
    x_p, iters, rsq = jit(state, b_d)
    s = sync(x_p)
    t1 = time.time()
    print(f"[2048] warm solve: {t1 - t0:.3f} s, iters={int(iters)} "
          f"rsq={float(rsq):.3e} checksum={s:.3e}", flush=True)


if __name__ == "__main__":
    main()
