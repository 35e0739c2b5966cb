"""Probe the batched-vs-single K-cycle solve at the HLO level.

VERDICT r3 item 3: the TPU batched multi-RHS solve costs ~3x sequential
per rhs while the fixed-schedule A/B proved masking is NOT the cause.
This probe compiles the single-rhs and batched planes solvers on the
ambient backend and reports, for each, the optimized-HLO op census
(copies / transposes / fusions) and the compiler's memory analysis -
the direct evidence for (or against) the relayout-copy hypothesis.

Usage:  python scripts/probe_batched_hlo.py [L] [nrhs]
"""

import collections
import re
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    nrhs = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp
    from qmg_tpu.lattice import Lattice2D
    from qmg_tpu.operators import Wilson2D
    from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
    from qmg_tpu.tpu_compat import (make_planes_solver,
                                    make_batched_planes_solver,
                                    host_to_planes)
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
        single, state = make_planes_solver(mg, tol=1e-5, max_iter=200,
                                           restart_freq=32)
        batched, _ = make_batched_planes_solver(mg, tol=1e-5,
                                                max_iter=200,
                                                restart_freq=32)
        b1 = host_to_planes(rng.gaussian_cv(lat))
        bN = np.stack([host_to_planes(rng.gaussian_cv(lat))
                       for _ in range(nrhs)])

    dev = jax.devices()[0]
    print(f"[probe] backend {dev.platform} ({dev.device_kind}), L={L}, "
          f"nrhs={nrhs}", flush=True)

    def census(label, fn, args):
        lowered = jax.jit(fn).lower(*args)
        compiled = lowered.compile()
        try:
            txt = compiled.as_text()
        except Exception as e:
            print(f"[{label}] as_text unavailable: {e}")
            txt = ""
        ops = collections.Counter()
        bytes_by_op = collections.Counter()
        for m in re.finditer(
                r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*((?:\w+)\[[^\]]*\]"
                r"(?:\{[^}]*\})?)\s+(\w+)\(", txt, re.M):
            shape, opname = m.group(1), m.group(2)
            ops[opname] += 1
            nums = re.findall(r"\[([\d,]*)\]", shape)
            if nums and nums[0]:
                n = 1
                for d in nums[0].split(","):
                    n *= int(d)
                elt = 8 if shape.startswith("c64") else (
                    4 if shape.startswith(("f32", "s32", "u32")) else 4)
                bytes_by_op[opname] += n * elt
        top = ", ".join(f"{k}:{v}" for k, v in ops.most_common(12))
        print(f"[{label}] ops: {top}")
        for k in ("copy", "transpose", "bitcast", "reshape"):
            if ops.get(k):
                print(f"[{label}]   {k}: {ops[k]} ops, "
                      f"{bytes_by_op[k]/2**20:.1f} MiB of outputs")
        try:
            ma = compiled.memory_analysis()
            print(f"[{label}] memory: args {ma.argument_size_in_bytes/2**20:.1f} "
                  f"MiB, output {ma.output_size_in_bytes/2**20:.1f} MiB, "
                  f"temp {ma.temp_size_in_bytes/2**20:.1f} MiB")
        except Exception as e:
            print(f"[{label}] memory_analysis unavailable: {e}")
        return compiled

    census("single", single, (state, b1))
    census(f"batched x{nrhs}", batched, (state, bN))


if __name__ == "__main__":
    main()
