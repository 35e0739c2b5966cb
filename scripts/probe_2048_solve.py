"""Probe: does the planes K-cycle SOLVE work at 2048^2 on the TPU?

The 2048^2 device-resident SETUP fails in XLA layout assignment
(PERF.md "Device-resident setup"); this probes the other half of the
flagship contract - the solve path - at the same size, with a
structure-only hierarchy (real fine Wilson operator from a hot gauge,
identity coarse levels, random null vectors). Convergence is
meaningless here; what is measured is whether XLA compiles and runs the
2048^2 fine-level complex program with sane layouts, and the per-outer-
iteration wall time.

Run on the axon TPU:  python scripts/probe_2048_solve.py [L] [kernel]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import Wilson2D
from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
from qmg_tpu.operators.wilson import wilson_coeffs_numpy
from qmg_tpu.tpu_compat import make_planes_solver, host_to_planes
from qmg_tpu import u1
from qmg_tpu.rng import QMGRandom


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    kernel = sys.argv[2] if len(sys.argv) > 2 else "wilson-r1"
    n_refine = 3 if L <= 1024 else 4
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        gauge = np.asarray(u1.gauss_gauge_u1(lat, rng, 6.0))
        clover, hopping = wilson_coeffs_numpy(lat, jnp.asarray(gauge))
        op = Wilson2D.__new__(Wilson2D)
        from qmg_tpu.stencil import Stencil2D, make_coeffs
        op._dtype = jnp.complex64
        op.wilson_coeff = 1.0
        Stencil2D.__init__(op, make_coeffs(
            lat, clover=jnp.asarray(clover, jnp.complex64),
            hopping=jnp.asarray(hopping, jnp.complex64), shift=-0.06,
            dtype=jnp.complex64))
        cfg = KCycleConfig(n_refine=n_refine, coarse_dof=8,
                           coarsest_direct=False)
        mg = build_kcycle_hierarchy(lat, op, cfg, rng,
                                    structure_only=True)
        solve, state = make_planes_solver(
            mg, tol=1e-30, max_iter=5, restart_freq=32,
            use_pallas_fine=(kernel != "xla"),
            pallas_kind=None if kernel == "xla" else kernel)
        # Random (garbage) null vectors so the transfer einsums do real
        # work; coarse levels stay identity (trivially convergent).
        host = np.random.default_rng(7)
        for k in list(state):
            if k.startswith("nvb"):
                state[k] = (0.1 * host.standard_normal(
                    state[k].shape)).astype(np.float32)
        b = np.asarray(rng.gaussian_cv(lat)).astype(np.complex64)

    b_p = host_to_planes(b)
    dev = jax.devices()[0]
    print(f"[probe] device {dev.device_kind}, L={L}, kernel={kernel}, "
          f"n_refine={n_refine}", flush=True)
    state_d = jax.device_put(state, dev)
    b_d = jax.device_put(b_p, dev)
    jit = jax.jit(solve)
    t0 = time.time()
    x_p, iters, rsq = jit(state_d, b_d)
    # True sync: scalar host readback (block_until_ready lies on axon).
    s = float(jnp.sum(jnp.abs(x_p[..., 0])))
    t1 = time.time()
    print(f"[probe] first call (incl compile): {t1 - t0:.1f} s; "
          f"iters={int(iters)} rsq={float(rsq):.3e} checksum={s:.3e}",
          flush=True)
    t0 = time.time()
    x_p, iters, rsq = jit(state_d, b_d)
    s = float(jnp.sum(jnp.abs(x_p[..., 0])))
    t1 = time.time()
    print(f"[probe] warm solve (5 outer iters): {t1 - t0 :.3f} s "
          f"({(t1 - t0) / 5 * 1e3:.1f} ms/outer) checksum={s:.3e}",
          flush=True)


if __name__ == "__main__":
    main()
