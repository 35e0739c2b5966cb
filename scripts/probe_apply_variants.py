"""A/B the fine stencil-apply formulations under vmap (VERDICT r3
item 3: the vmapped interleaved apply measured ~10-15x off bandwidth;
probe_apply_hlo.py showed XLA pattern-matching its batched einsum into
convolutions with 472 MiB of temps).

Variants, each timed with the marginal protocol (K vs 2K chained
applies, scalar-fetch sync, min over reps), single and vmapped x nrhs:

  stacked   - stencil.apply_M (one concatenated (5,...) einsum; the
              current solver apply)
  unstacked - apply_clover + apply_hopping + apply_shift (5 separate
              per-direction einsums)
  cf        - cf.stencil_apply_cf in channels-first real-pair layout
              (2, 2p, nc, Y, Xh): per-site matvecs are nc x nc
              elementwise plane multiply-adds - no batched dot for XLA
              to mis-pattern-match. Conversion to cf happens once per
              chain, outside the loop.

Usage: python scripts/probe_apply_variants.py [L] [nrhs] [K] [reps]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def bench(fn, args, reps):
    import jax
    import jax.numpy as jnp

    def scalar_fn(*a):
        return jnp.sum(jnp.abs(fn(*a)))

    f = jax.jit(scalar_fn)
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
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    import jax
    import jax.numpy as jnp
    from jax import lax
    from qmg_tpu.lattice import Lattice2D
    from qmg_tpu.operators import Wilson2D
    from qmg_tpu import stencil as stn
    from qmg_tpu import cf
    from qmg_tpu.tpu_compat import host_to_planes, from_planes
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
        sh_p = host_to_planes(np.asarray([
            complex(base.shift), complex(base.eo_shift),
            complex(base.dof_shift)]))
        v1 = host_to_planes(rng.gaussian_cv(lat))
        vN = np.stack([host_to_planes(rng.gaussian_cv(lat))
                       for _ in range(nrhs)])

    dev = jax.devices()[0]
    print(f"[probe] backend {dev.platform} ({dev.device_kind}), L={L}, "
          f"nrhs={nrhs}, K={K}, reps={reps}", flush=True)

    def coeffs_of(cl_p, hp_p, sh_p):
        sh = from_planes(sh_p)
        return base.replace(clover=from_planes(cl_p),
                            hopping=from_planes(hp_p),
                            shift=sh[0], eo_shift=sh[1], dof_shift=sh[2])

    def mk_stacked(k):
        def stage(cl_p, hp_p, sh_p, v_p):
            coeffs = coeffs_of(cl_p, hp_p, sh_p)
            v = from_planes(v_p)

            def body(_, v):
                return stn.apply_M(coeffs, v) / jnp.float32(8.0)
            return lax.fori_loop(0, k, body, v)
        return stage

    def mk_unstacked(k):
        def stage(cl_p, hp_p, sh_p, v_p):
            coeffs = coeffs_of(cl_p, hp_p, sh_p)
            v = from_planes(v_p)

            def body(_, v):
                out = (stn.apply_clover(coeffs, v)
                       + stn.apply_hopping(coeffs, v)
                       + stn.apply_shift(coeffs, v))
                return out / jnp.float32(8.0)
            return lax.fori_loop(0, k, body, v)
        return stage

    def mk_cf(k):
        def stage(cl_p, hp_p, sh_p, v_p):
            clover_cf = cf.mat_planes_to_cf(cl_p)
            hopping_cf = cf.hop_planes_to_cf(hp_p)
            shifts = jnp.transpose(sh_p)  # (3, 2) -> (2, 3)
            x = cf.planes_to_cf(v_p)

            def body(_, x):
                return (cf.stencil_apply_cf(clover_cf, hopping_cf,
                                            shifts, x)
                        / jnp.float32(8.0))
            return lax.fori_loop(0, k, body, x)
        return stage

    def mk_mulsum(k):
        # The einsum written as explicit multiply + reduce: no
        # dot_general for XLA-TPU to lower into base-dilated
        # convolutions (the measured batched pathology - see
        # /tmp HLO dumps and PERF.md).
        from qmg_tpu.stencil import ALL_DIRS
        from qmg_tpu.cshift import cshift_pull

        def stage(cl_p, hp_p, sh_p, v_p):
            coeffs = coeffs_of(cl_p, hp_p, sh_p)
            mats = jnp.concatenate([coeffs.clover[None], coeffs.hopping])

            v = from_planes(v_p)

            def body(_, v):
                nbrs = jnp.stack([v] + [cshift_pull(v, d)
                                        for d in ALL_DIRS])
                out = jnp.sum(mats * nbrs[..., None, :], axis=(0, -1))
                out = out + stn.apply_shift(coeffs, v)
                return out / jnp.float32(8.0)
            return lax.fori_loop(0, k, body, v)
        return stage

    def mk_cf_mulsum(k):
        def stage(cl_p, hp_p, sh_p, v_p):
            clover_cf = cf.mat_planes_to_cf(cl_p)    # (2,2p,i,j,Y,X)
            hopping_cf = cf.hop_planes_to_cf(hp_p)   # (2,4,2p,i,j,Y,X)
            shifts = jnp.transpose(sh_p)
            x = cf.planes_to_cf(v_p)                 # (2,2p,j,Y,X)

            def smatvec(m, xx):
                # complex per-site matvec as mul+sum over j (no dot).
                xr, xi = xx[0][:, None], xx[1][:, None]
                re = jnp.sum(m[0] * xr - m[1] * xi, axis=2)
                im = jnp.sum(m[0] * xi + m[1] * xr, axis=2)
                return jnp.stack([re, im])

            def body(_, x):
                out = cf.apply_shift_cf(shifts, x)
                out = out + smatvec(clover_cf, x)
                for d in (0, 1, 2, 3):
                    out = out + smatvec(hopping_cf[:, d],
                                        cf.cshift_cf(x, d))
                return out / jnp.float32(8.0)
            return lax.fori_loop(0, k, body, x)
        return stage

    for name, mk in (("stacked", mk_stacked), ("unstacked", mk_unstacked),
                     ("cf", mk_cf), ("mulsum", mk_mulsum),
                     ("cf-mulsum", mk_cf_mulsum)):
        a1 = (cl_p, hp_p, sh_p, v1)
        aN = (cl_p, hp_p, sh_p, vN)
        # Single applies are ~0.05-0.3 ms; 4K-vs-8K keeps the marginal
        # (4K applies) above the +-10-25 ms tunnel dispatch noise.
        k1 = 4 * K
        t1a = bench(mk(k1), a1, reps)
        t1b = bench(mk(2 * k1), a1, reps)
        d1 = (t1b - t1a) / k1
        vm_k = jax.vmap(mk(K), in_axes=(None, None, None, 0))
        vm_2k = jax.vmap(mk(2 * K), in_axes=(None, None, None, 0))
        tNa = bench(vm_k, aN, reps)
        tNb = bench(vm_2k, aN, reps)
        dN = (tNb - tNa) / (K * nrhs)
        ratio = dN / max(d1, 1e-9)
        print(f"[{name:9s}] single {d1*1e3:7.3f} ms/apply  "
              f"batched {dN*1e3:7.3f} ms/rhs/apply  per-rhs ratio "
              f"{ratio:6.2f}", flush=True)


if __name__ == "__main__":
    main()
