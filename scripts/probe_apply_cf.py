"""Batched fine apply in the channels-first (cf) layout — the candidate
fix for the batched-solve regression (PERF.md "isolation matrix").

probe_apply_hlo.py showed: under vmap, the planes-layout apply
(nc minor) gets re-lowered by XLA as convolutions (3 convs, 472 MiB
temps, 17.7x bytes) at ~0.37 ms/rhs/apply; a broadcast-eltwise
rewrite is even slower because nc=2 minor uses 2/128 vector lanes.
The cf layout (2, 2p, nc, Y, Xh) puts Xh on the lane axis — the same
reason the 2048^2 setup path moved to cf (cf.py module docstring).
This probe times the cf apply single vs vmapped with the marginal
K-vs-2K protocol.

Usage: python scripts/probe_apply_cf.py [L] [nrhs] [K]
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
    from qmg_tpu.lattice import Lattice2D
    from qmg_tpu.operators import Wilson2D
    from qmg_tpu.tpu_compat import host_to_planes
    from qmg_tpu.cf import (mat_planes_to_cf, hop_planes_to_cf,
                            stencil_apply_cf)
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
        shifts = np.stack([
            [complex(base.shift).real, complex(base.eo_shift).real,
             complex(base.dof_shift).real],
            [complex(base.shift).imag, complex(base.eo_shift).imag,
             complex(base.dof_shift).imag]]).astype(np.float32)
        v1 = host_to_planes(rng.gaussian_cv(lat))
        vN = np.stack([host_to_planes(rng.gaussian_cv(lat))
                       for _ in range(nrhs)])

    dev = jax.devices()[0]
    print(f"[probe] backend {dev.platform} ({dev.device_kind}), L={L}, "
          f"nrhs={nrhs}, K={K}", flush=True)

    def planes_field_to_cf(p):
        # (2p, Y, Xh, nc, 2) -> (2, 2p, nc, Y, Xh)
        return jnp.moveaxis(jnp.asarray(p), (4, 3), (0, 2))

    def mk_single(kk):
        def s(cl_p, hp_p, sh, v_p):
            cl = mat_planes_to_cf(jnp.asarray(cl_p))
            hp = hop_planes_to_cf(jnp.asarray(hp_p))
            v = planes_field_to_cf(v_p)

            def body(_, v):
                return stencil_apply_cf(cl, hp, sh, v) / jnp.float32(8.0)
            return lax.fori_loop(0, kk, body, v)
        return s

    def scalarize(stage):
        def f(*a):
            return jnp.sum(jnp.abs(stage(*a)))
        return f

    # Unrolled site matvec: explicit real-pair mul-adds over the tiny
    # nc axes — no einsum/dot for XLA to re-lower as convolution when a
    # batch axis appears; every op is elementwise over (Y, Xh)-minor
    # arrays (full 128-lane utilization).
    def site_matvec_unrolled(m, x):
        # m (2, 2p, no, ni, Y, Xh); x (2, 2p, ni, Y, Xh)
        no, ni = m.shape[2], m.shape[3]
        res, ims = [], []
        for i in range(no):
            re = im = None
            for j in range(ni):
                mr, mi = m[0, :, i, j], m[1, :, i, j]
                xr, xi = x[0, :, j], x[1, :, j]
                tr = mr * xr - mi * xi
                ti = mr * xi + mi * xr
                re = tr if re is None else re + tr
                im = ti if im is None else im + ti
            res.append(re)
            ims.append(im)
        return jnp.stack([jnp.stack(res, axis=1), jnp.stack(ims, axis=1)])

    from qmg_tpu.cf import cshift_cf, apply_shift_cf
    from qmg_tpu.lattice import DIR_XP1, DIR_YP1, DIR_XM1, DIR_YM1

    def mk_unrolled(kk):
        def s(cl_p, hp_p, sh, v_p):
            cl = mat_planes_to_cf(jnp.asarray(cl_p))
            hp = hop_planes_to_cf(jnp.asarray(hp_p))
            v = planes_field_to_cf(v_p)

            def body(_, v):
                out = apply_shift_cf(sh, v)
                out = out + site_matvec_unrolled(cl, v)
                for d in (DIR_XP1, DIR_YP1, DIR_XM1, DIR_YM1):
                    out = out + site_matvec_unrolled(hp[:, d],
                                                     cshift_cf(v, d))
                return out / jnp.float32(8.0)
            return lax.fori_loop(0, kk, body, v)
        return s

    # Wide K spread: the axon tunnel's dispatch constant varies by
    # +-200 ms run to run; a 2x spread at K=20 is below that noise.
    K2 = 8 * K
    jobs = [
        ("cf-single", mk_single, (cl_p, hp_p, shifts, v1), 1),
        (f"cf-vmap x{nrhs}",
         lambda kk: jax.vmap(mk_single(kk), in_axes=(None, None, None, 0)),
         (cl_p, hp_p, shifts, vN), nrhs),
        ("cf-unroll-single", mk_unrolled, (cl_p, hp_p, shifts, v1), 1),
        (f"cf-unroll-vmap x{nrhs}",
         lambda kk: jax.vmap(mk_unrolled(kk),
                             in_axes=(None, None, None, 0)),
         (cl_p, hp_p, shifts, vN), nrhs),
    ]
    only = sys.argv[4] if len(sys.argv) > 4 else ""
    for label, mk, args, b in jobs:
        if only and only not in label:
            continue
        fA = jax.jit(scalarize(mk(K)))
        cA = fA.lower(*args).compile()
        try:
            ca = cA.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            ma = cA.memory_analysis()
            print(f"[{label}] bytes {ca.get('bytes accessed', 0)/2**20:.0f}"
                  f" MiB, temp {ma.temp_size_in_bytes/2**20:.1f} MiB",
                  flush=True)
        except Exception as e:
            print(f"[{label}] static analysis unavailable: {e}")
        fB = jax.jit(scalarize(mk(K2)))
        tA = bench(fA, args)
        tB = bench(fB, args)
        marg = (tB - tA) / (K2 - K)
        print(f"[{label}] marginal {marg*1e3:7.3f} ms/apply "
              f"({marg*1e3/b:7.4f} ms/rhs/apply)  "
              f"[tK={tA*1e3:.1f} t2K={tB*1e3:.1f}]", flush=True)


if __name__ == "__main__":
    main()
