"""Where does the vmapped fine-stencil apply's time go? (VERDICT r3
item 3, continued - the isolation probes put the batched regression in
the K-cycle preconditioner, and the marginal census put the batched L0
apply at ~2.8 ms per 8-lane dispatch where bandwidth predicts ~0.2 ms.)

Compiles a K-chained fine apply three ways on the ambient backend and
reports the optimized-HLO op census (copy/transpose bytes) + the
compiler cost analysis, then times each with the scalar-fetch protocol:

  single  - apply_M chained K times on one field
  vmap    - jax.vmap of the same chain over nrhs
  explicit- a hand-batched chain: the SAME einsum with the rhs batch
            axis written into the subscripts ("s...ij,bs...j->b...i"),
            no vmap involved - distinguishes "vmap produces a bad
            program" from "XLA compiles any batched apply badly".

Usage: python scripts/probe_apply_hlo.py [L] [nrhs] [K]
"""

import collections
import re
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def census(label, compiled):
    try:
        txt = compiled.as_text()
    except Exception as e:
        print(f"[{label}] as_text unavailable: {e}")
        return
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
            elt = 8 if shape.startswith("c64") else 4
            bytes_by_op[opname] += n * elt
    top = ", ".join(f"{k}:{v}" for k, v in ops.most_common(10))
    print(f"[{label}] ops: {top}")
    for k in ("copy", "transpose", "fusion", "convolution", "dot",
              "reduce"):
        if ops.get(k):
            print(f"[{label}]   {k}: {ops[k]} ops, "
                  f"{bytes_by_op[k]/2**20:.1f} MiB of outputs")
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        keys = {k: v for k, v in ca.items()
                if k in ("flops", "bytes accessed", "transcendentals",
                         "optimal_seconds")}
        print(f"[{label}] cost: {keys}")
    except Exception as e:
        print(f"[{label}] cost_analysis unavailable: {e}")
    try:
        ma = compiled.memory_analysis()
        print(f"[{label}] memory: temp {ma.temp_size_in_bytes/2**20:.1f} "
              f"MiB")
    except Exception as e:
        print(f"[{label}] memory_analysis unavailable: {e}")


def bench(f, args, reps=8):
    import jax
    float(np.asarray(jax.device_get(f(*args))))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(jax.device_get(f(*args))))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nrhs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    import jax
    import jax.numpy as jnp
    from jax import lax
    from qmg_tpu.lattice import Lattice2D
    from qmg_tpu.operators import Wilson2D
    from qmg_tpu.stencil import apply_M, apply_shift, ALL_DIRS
    from qmg_tpu.cshift import cshift_pull
    from qmg_tpu.tpu_compat import host_to_planes, from_planes, to_planes
    from qmg_tpu import u1
    from qmg_tpu.rng import QMGRandom

    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        gauge = jnp.asarray(u1.gauss_gauge_u1(lat, rng, 6.0),
                            dtype=jnp.complex64)
        op = Wilson2D(lat, -0.06, gauge, dtype=jnp.complex64)
        base = op.coeffs
        cl_p = host_to_planes(np.asarray(base.clover))
        hp_p = host_to_planes(np.asarray(base.hopping))
        sh_p = host_to_planes(np.stack([
            np.asarray(base.shift, np.complex128),
            np.asarray(base.eo_shift, np.complex128),
            np.asarray(base.dof_shift, np.complex128)]))
        v1 = host_to_planes(rng.gaussian_cv(lat))
        vN = np.stack([host_to_planes(rng.gaussian_cv(lat))
                       for _ in range(nrhs)])

    dev = jax.devices()[0]
    print(f"[probe] backend {dev.platform} ({dev.device_kind}), L={L}, "
          f"nrhs={nrhs}, K={K}", flush=True)

    def coeffs_of(cl_p, hp_p, sh_p):
        sh = from_planes(sh_p)
        return base.replace(clover=from_planes(cl_p),
                            hopping=from_planes(hp_p),
                            shift=sh[0], eo_shift=sh[1], dof_shift=sh[2])

    def scalarize(stage):
        def f(*a):
            return jnp.sum(jnp.abs(stage(*a)))
        return f

    # --- single ---------------------------------------------------------
    def single_stage(cl_p, hp_p, sh_p, v_p):
        coeffs = coeffs_of(cl_p, hp_p, sh_p)
        v = from_planes(v_p)

        def body(_, v):
            return apply_M(coeffs, v) / jnp.float32(8.0)
        return to_planes(lax.fori_loop(0, K, body, v))

    # --- vmap -----------------------------------------------------------
    vmapped = jax.vmap(single_stage, in_axes=(None, None, None, 0))

    # --- explicit batch --------------------------------------------------
    def explicit_stage(cl_p, hp_p, sh_p, v_p):
        coeffs = coeffs_of(cl_p, hp_p, sh_p)
        vb = from_planes(v_p)  # (b, 2, Y, Xh, nc) complex

        mats = jnp.concatenate([coeffs.clover[None], coeffs.hopping])

        def one(v):
            nbrs = jnp.stack([v] + [cshift_pull(v, d) for d in ALL_DIRS],
                             axis=0)
            return nbrs

        def body(_, vb):
            nbrs = jax.vmap(one)(vb)  # (b, 5, 2, Y, Xh, nc)
            out = jnp.einsum("s...ij,bs...j->b...i", mats, nbrs)
            out = out + jax.vmap(lambda v: apply_shift(coeffs, v))(vb)
            return out / jnp.float32(8.0)
        return to_planes(lax.fori_loop(0, K, body, vb))

    # --- elementwise batch -------------------------------------------------
    # Hypothesis (census above): under vmap XLA re-lowers the batched
    # site-matvec einsum as CONVOLUTIONS, which blocks the roll/select ->
    # matvec fusion the single program gets and materializes ~472 MiB of
    # temps. This variant writes the site matvec as broadcast
    # multiply-add over the tiny nc axis - no dot/einsum for XLA to
    # pattern-match - accumulating per-direction terms.
    def elementwise_stage(cl_p, hp_p, sh_p, v_p):
        coeffs = coeffs_of(cl_p, hp_p, sh_p)
        vb = from_planes(v_p)  # (b, 2, Y, Xh, nc)

        def matvec(m, v):
            # m: (2, Y, Xh, i, j); v: (b, 2, Y, Xh, j) -> (b, 2, Y, Xh, i)
            return jnp.sum(m[None] * v[:, ..., None, :], axis=-1)

        def body(_, vb):
            out = matvec(coeffs.clover, vb)
            for d in ALL_DIRS:
                pulled = jax.vmap(lambda v: cshift_pull(v, d))(vb)
                out = out + matvec(coeffs.hopping[d], pulled)
            out = out + jax.vmap(lambda v: apply_shift(coeffs, v))(vb)
            return out / jnp.float32(8.0)
        return to_planes(lax.fori_loop(0, K, body, vb))

    jobs = [("single", single_stage, (cl_p, hp_p, sh_p, v1)),
            (f"vmap x{nrhs}", vmapped, (cl_p, hp_p, sh_p, vN)),
            (f"explicit x{nrhs}", explicit_stage, (cl_p, hp_p, sh_p, vN)),
            (f"eltwise x{nrhs}", elementwise_stage, (cl_p, hp_p, sh_p, vN))]
    compiled = []
    for label, fn, args in jobs:
        f = jax.jit(scalarize(fn))
        c = f.lower(*args).compile()
        census(label, c)
        compiled.append((label, f, args))
    # Marginal protocol (PERF.md "isolation matrix"): absolute times on
    # the axon tunnel are dispatch-dominated and variable; time the K and
    # 2K chains and report (t(2K)-t(K))/K as device ms/apply.
    for label, f, args in compiled:
        t = bench(f, args)
        print(f"[{label}] abs  {t*1e3:8.2f} ms "
              f"({t*1e3/K:7.3f} ms/apply incl dispatch)", flush=True)
    print("[marginal protocol: K vs 2K]", flush=True)
    K2 = 2 * K

    def mk_single(kk):
        def s(cl_p, hp_p, sh_p, v_p):
            coeffs = coeffs_of(cl_p, hp_p, sh_p)
            v = from_planes(v_p)
            return to_planes(lax.fori_loop(
                0, kk, lambda _, v: apply_M(coeffs, v) / jnp.float32(8.0),
                v))
        return s

    def mk_eltwise(kk):
        def s(cl_p, hp_p, sh_p, v_p):
            coeffs = coeffs_of(cl_p, hp_p, sh_p)
            vb = from_planes(v_p)

            def matvec(m, v):
                return jnp.sum(m[None] * v[:, ..., None, :], axis=-1)

            def body(_, vb):
                out = matvec(coeffs.clover, vb)
                for d in ALL_DIRS:
                    pulled = jax.vmap(lambda v: cshift_pull(v, d))(vb)
                    out = out + matvec(coeffs.hopping[d], pulled)
                out = out + jax.vmap(lambda v: apply_shift(coeffs, v))(vb)
                return out / jnp.float32(8.0)
            return to_planes(lax.fori_loop(0, kk, body, vb))
        return s

    marg_jobs = [
        ("single", mk_single, (cl_p, hp_p, sh_p, v1), 1),
        (f"vmap x{nrhs}",
         lambda kk: jax.vmap(mk_single(kk), in_axes=(None, None, None, 0)),
         (cl_p, hp_p, sh_p, vN), nrhs),
        (f"eltwise x{nrhs}", mk_eltwise, (cl_p, hp_p, sh_p, vN), nrhs),
    ]
    for label, mk, args, b in marg_jobs:
        fA = jax.jit(scalarize(mk(K)))
        fB = jax.jit(scalarize(mk(K2)))
        tA = bench(fA, args)
        tB = bench(fB, args)
        marg = (tB - tA) / K
        print(f"[{label}] marginal {marg*1e3:7.3f} ms/apply "
              f"({marg*1e3/b:7.4f} ms/rhs/apply)  "
              f"[tK={tA*1e3:.1f} t2K={tB*1e3:.1f}]", flush=True)


if __name__ == "__main__":
    main()
