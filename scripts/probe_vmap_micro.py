"""Micro-isolation for the batched-chain cost: three probe bodies of
increasing structure, single vs vmapped, marginal K-vs-8K protocol.

Context (PERF.md "isolation matrix" + probe_apply_cf.py): the batched
fine apply costs ~2.9 ms per 8-lane dispatch in THREE structurally
different formulations (planes-vmap with convs + 3.2 GB accessed,
cf-einsum-vmap with 5.7 GB, cf-unrolled with 682 MiB and zero temps)
while the single apply sits at ~0.03 ms. Identical cost across programs
whose static traffic differs 8x means the bottleneck is NOT the apply's
arithmetic. Candidates: the vmapped fori_loop carry (HBM round trip of
the batched carry each iteration), a backend per-iteration constant, or
lane-serialized execution. Bodies:

  scale : v = v * 1.0001            (pure elementwise, no neighbors)
  roll  : v = v*0.5 + roll(v)*0.5   (one neighbor, no coeffs)
  chess : v = v*0.5 + sum of 4 rolls (stencil shape, no matrices)

Usage: python scripts/probe_vmap_micro.py [L] [nrhs] [K]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def bench(f, args, reps=12):
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

    # Same footprint as the cf fine field at L: (2, 2, nc, Y, Xh) f32.
    shp = (2, 2, 2, L, L // 2)
    rng = np.random.default_rng(0)
    v1 = rng.standard_normal(shp).astype(np.float32)
    vN = rng.standard_normal((nrhs,) + shp).astype(np.float32)

    dev = jax.devices()[0]
    print(f"[probe] backend {dev.platform} ({dev.device_kind}), L={L}, "
          f"nrhs={nrhs}, K={K}, field {v1.nbytes/2**20:.1f} MiB",
          flush=True)

    def body_scale(v):
        return v * jnp.float32(1.0001)

    def body_roll(v):
        return v * jnp.float32(0.5) + jnp.roll(v, 1, axis=-1) \
            * jnp.float32(0.5)

    def body_chess(v):
        out = v * jnp.float32(0.5)
        for ax, sh in ((-1, 1), (-1, -1), (-2, 1), (-2, -1)):
            out = out + jnp.roll(v, sh, axis=ax) * jnp.float32(0.125)
        return out

    def mk(body, kk):
        def s(v):
            return lax.fori_loop(0, kk, lambda _, v: body(v), v)
        return s

    def scalarize(stage):
        def f(*a):
            return jnp.sum(jnp.abs(stage(*a)))
        return f

    K2 = 8 * K
    for name, body in (("scale", body_scale), ("roll", body_roll),
                       ("chess", body_chess)):
        for label, wrap, args, b in (
                ("single", lambda f: f, (v1,), 1),
                (f"vmap x{nrhs}", jax.vmap, (vN,), nrhs)):
            fA = jax.jit(scalarize(wrap(mk(body, K))))
            fB = jax.jit(scalarize(wrap(mk(body, K2))))
            tA = bench(fA, args)
            tB = bench(fB, args)
            marg = (tB - tA) / (K2 - K)
            print(f"[{name} {label}] marginal {marg*1e3:7.4f} ms/iter "
                  f"({marg*1e3/b:7.4f} ms/rhs/iter) "
                  f"[tK={tA*1e3:.1f} t2K={tB*1e3:.1f}]", flush=True)


if __name__ == "__main__":
    main()
