"""Micro-attribution of the outer-FGCR direction-store cost at 2048^2.

probe_2048_attrib measured one outer trip with precond=none at ~80-105
ms while its bandwidth-predicted cost is ~11 ms (fine apply 6.7 ms +
~3.3 GB of (R, n) store traffic at the 819 GB/s roofline).  This probe
times the store's constituent ops in isolation, each as a K-vs-2K
marginal chain inside one jit (scalar-fetch synced, min over reps), to
find which lowering is off:

  betas_c64     (R, n) c64 conj-matvec  (the `conj(aps) @ ap` projection)
  betas_real    same projection with the store held as (R, 2n) f32
                real-pairs (re<a,b> only; the layout candidate fix)
  corr_c64      ap - betas @ aps  +  z - betas @ ps   (2 store reads)
  dus_c64       dynamic_update_index_in_dim of one (n,) row into (R, n)
  trip_c64      one full synthetic GCR trip (betas + corr + dus + axpys),
                no matvec - the store composition's floor

All big operands ride the jit carry (axon rejects them as closed-over
MLIR constants).

Run: python scripts/probe_gcr_store.py [L] [R]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax


def timed_scalar(fn, reps=5):
    out = fn()
    float(np.asarray(jax.device_get(jnp.sum(jnp.abs(out[0])))))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(np.asarray(jax.device_get(jnp.sum(jnp.abs(out[0])))))
        best = min(best, time.perf_counter() - t0)
    return best


def marginal(body, carry, K=8):
    @jax.jit
    def c1(c):
        return lax.fori_loop(0, K, body, c)

    @jax.jit
    def c2(c):
        return lax.fori_loop(0, 2 * K, body, c)
    t1 = timed_scalar(lambda: c1(carry))
    t2 = timed_scalar(lambda: c2(carry))
    return (t2 - t1) / K


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 2 * L * L  # nc=2 Wilson fine vector length

    # Operands must be built INSIDE jit: eager complex ops on the axon
    # backend produce arrays whose values cannot be fetched (the same
    # UNIMPLEMENTED the verify skill documents for eager c64).
    @jax.jit
    def init():
        key = jax.random.PRNGKey(0)
        kr, ki, kv = jax.random.split(key, 3)
        aps = (jax.random.normal(kr, (R, n), jnp.float32)
               + 1j * jax.random.normal(ki, (R, n), jnp.float32)
               ).astype(jnp.complex64)
        v = (jax.random.normal(kv, (n,), jnp.float32)
             + 1j * jax.random.normal(kv, (n,), jnp.float32)
             ).astype(jnp.complex64)
        aps_r = jnp.concatenate(
            [jnp.real(aps), jnp.imag(aps)], axis=1)  # (R, 2n) f32
        v_r = jnp.concatenate([jnp.real(v), jnp.imag(v)])
        return aps, aps[::-1], v, aps_r, v_r

    aps, ps, v, aps_r, v_r = init()
    apsq = np.ones((R,), np.float32)

    gb = R * n * 8 / 2**30
    print(f"[gcr-store] L={L} R={R} n={n} store {gb:.2f} GiB/side")

    def betas_c64(i, c):
        v_, st = c
        b = (jnp.conj(st) @ v_) / apsq
        return (v_ * (1.0 + 1e-7 * jnp.real(b[0])), st)
    t = marginal(betas_c64, (v, aps))
    print(f"[gcr-store] betas_c64: {t*1e3:.2f} ms "
          f"(roofline {gb/819*1e3:.2f})", flush=True)

    def betas_real(i, c):
        v_, st = c
        b = (st @ v_) / apsq
        return (v_ * (1.0 + 1e-7 * b[0]), st)
    t = marginal(betas_real, (v_r, aps_r))
    print(f"[gcr-store] betas_real: {t*1e3:.2f} ms "
          f"(roofline {gb/819*1e3:.2f})", flush=True)

    def corr_c64(i, c):
        v_, w_, st1, st2 = c
        b0 = jnp.full((R,), 0.01 + 0.01j, jnp.complex64) * (i + 1)
        v2 = v_ - b0 @ st1
        w2 = w_ - b0 @ st2
        return (v2, w2, st1, st2)
    t = marginal(corr_c64, (v, v, aps, ps))
    print(f"[gcr-store] corr_c64 (2 sides): {t*1e3:.2f} ms "
          f"(roofline {2*gb/819*1e3:.2f})", flush=True)

    def dus_c64(i, c):
        st, v_ = c
        st = lax.dynamic_update_index_in_dim(st, v_, i % R, 0)
        return (st, v_ * 1.0000001)
    t = marginal(dus_c64, (aps, v))
    print(f"[gcr-store] dus_c64 (1 row write): {t*1e3:.2f} ms "
          f"(roofline {gb/R/819*1e3:.3f})", flush=True)

    def dus_real(i, c):
        st, v_ = c
        st = lax.dynamic_update_index_in_dim(st, v_, i % R, 0)
        return (st, v_ * 1.0000001)
    t = marginal(dus_real, (aps_r, v_r))
    print(f"[gcr-store] dus_real (1 f32 row write): {t*1e3:.2f} ms "
          f"(roofline {gb/R/819*1e3:.3f})", flush=True)

    # Full real-pair trip: stores held as (R, 2, n) f32; betas via ONE
    # matmul against a (2n, 2) rhs [v, swap(v)]; corrections via ONE
    # einsum with per-slot 2x2 rotation blocks - every correction pass
    # reads the store exactly once.
    @jax.jit
    def to_r2n(a):
        return jnp.stack([jnp.real(a), jnp.imag(a)], axis=1)  # (R,2,n)
    aps2 = to_r2n(aps)
    ps2 = to_r2n(ps)

    def trip_realpair(i, c):
        x, r, psb, apsb = c  # x,r: (2,n) f32; stores: (R,2,n)
        ap = r * 1.0000001
        # betas: re = <a,p>_r, im = <a, swap p> with swap = [im, -re]
        rhs = jnp.stack([ap.reshape(2 * n),
                         jnp.concatenate([ap[1], -ap[0]])], axis=1)
        bri = apsb.reshape(R, 2 * n) @ rhs  # (R, 2) [re, im]
        bri = bri / apsq[:, None]
        # correction: ap -= sum_j (beta_j * a_j) via (R,2,2) rotation
        rot = jnp.stack(
            [jnp.stack([bri[:, 0], -bri[:, 1]], axis=1),
             jnp.stack([bri[:, 1], bri[:, 0]], axis=1)], axis=1)
        ap = ap - jnp.einsum('jcd,jdn->cn', rot, apsb,
                             precision='highest')
        z = r - jnp.einsum('jcd,jdn->cn', rot, psb,
                           precision='highest')
        alr = jnp.sum(ap * r) / jnp.maximum(jnp.sum(ap * ap), 1e-30)
        x = x + alr * z
        r = r - alr * ap
        psb = lax.dynamic_update_index_in_dim(psb, z, i % R, 0)
        apsb = lax.dynamic_update_index_in_dim(apsb, ap, i % R, 0)
        return (x, r, psb, apsb)
    v2 = jnp.stack([v_r[:n], v_r[n:]])
    t = marginal(trip_realpair, (v2, v2, ps2, aps2))
    print(f"[gcr-store] trip_realpair (no matvec): {t*1e3:.2f} ms "
          f"(roofline ~{(3*gb + 6*gb/R)/819*1e3:.2f})", flush=True)

    def trip_c64(i, c):
        x, r, psb, apsb = c
        ap = r * 1.0000001
        b = (jnp.conj(apsb) @ ap) / apsq
        ap = ap - b @ apsb
        z = r - b @ psb
        al = jnp.vdot(ap, r) / jnp.maximum(
            jnp.real(jnp.vdot(ap, ap)), 1e-30)
        x = x + al * z
        r = r - al * ap
        psb = lax.dynamic_update_index_in_dim(psb, z, i % R, 0)
        apsb = lax.dynamic_update_index_in_dim(apsb, ap, i % R, 0)
        return (x, r, psb, apsb)
    t = marginal(trip_c64, (v, v, ps, aps))
    print(f"[gcr-store] trip_c64 (no matvec): {t*1e3:.2f} ms "
          f"(roofline ~{(3*gb + 6*gb/R)/819*1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()
