"""Device-resident adaptive (n22) setup at scale on the TPU.

VERDICT r3 item 5 done-criterion: n22-style adaptive setup at >= 512^2
with warm per-pass seconds. Runs make_adaptive_setup_planes at the
given size, then re-runs with fresh seeds to report the warm
(compile-cached) cost of the init stages and of one full adaptive pass
- the per-configuration cost of an adaptive n16-style stream.

Usage: python scripts/tpu_adaptive_512.py [L] [n_refine]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.setup import AdaptiveConfig
from qmg_tpu.setup_planes import (make_adaptive_setup_planes,
                                  adaptive_seed_planes)
from qmg_tpu.tpu_compat import host_to_planes
from qmg_tpu import u1
from qmg_tpu.rng import QMGRandom


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_refine = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    dev = jax.devices()[0]
    acfg = AdaptiveConfig(n_refine=n_refine, coarse_dof=8, n_setup=1)
    print(f"[adaptive] L={L} n_refine={n_refine} dev={dev.device_kind}",
          flush=True)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        gauge = np.asarray(u1.gauss_gauge_u1(lat, rng, 6.0)).astype(
            np.complex64)
        seeds = adaptive_seed_planes(lat, acfg, rng)
    gauge_p = jax.device_put(host_to_planes(gauge), dev)
    setup = make_adaptive_setup_planes(lat, acfg, -0.06)

    t0 = time.time()
    state = setup(gauge_p, seeds[0], seeds[1])
    cks = float(jnp.sum(jnp.abs(state[f"clover{n_refine}"])))
    print(f"[adaptive] cold full setup (init + {acfg.n_setup} pass, "
          f"incl compile): {time.time() - t0:.1f} s, checksum {cks:.4e}",
          flush=True)
    bad = [k for k in sorted(state)
           if not bool(jnp.all(jnp.isfinite(state[k])))]
    if bad:
        print(f"[adaptive] NONFINITE state arrays: {bad}", flush=True)

    with jax.default_device(cpu):
        seeds2 = adaptive_seed_planes(lat, acfg, rng)
    t0 = time.time()
    state = setup(gauge_p, seeds2[0], seeds2[1])
    cks = float(jnp.sum(jnp.abs(state[f"clover{n_refine}"])))
    t_full = time.time() - t0
    # Init-only timing: n_setup=0 variant shares the init stage jits?
    # (separate factory -> separate jits; report the full-warm number
    # and the pass cost as full - init measured within one factory).
    print(f"[adaptive] warm full rebuild: {t_full:.2f} s "
          f"(init stages + 1 adaptive pass + rebuilds), checksum "
          f"{cks:.4e}", flush=True)


if __name__ == "__main__":
    main()
