"""Bisect the real outer-FGCR trip cost at 2048^2.

probe_2048_attrib measures one outer trip (precond=none) at ~106 ms;
probe_gcr_store's synthetic replica of the same store arithmetic
(betas + corrections + 2 DUS + axpys) runs 13.8 ms and the fine matvec
6.9 ms. This probe closes the ~85 ms gap by driving the REAL
`solvers._gcr_impl` with a trivial matvec (no stencil, no planes
machinery) and then variants of its body structure:

  real_gcr      _gcr_impl(fixed_trips) marginal, matvec = x*(1+eps)
  real_gcr_mv0  same with matvec = identity (measures matvec share)
  nocond        local body copy WITHOUT the lax.cond restart branch
  nowhere       ... and WITHOUT the valid/broke where-masking
  fori          ... driven by fori_loop instead of while_loop

Marginal protocol: two fixed-trip solvers at k and 3k trips, scalar-
fetch synced, min over reps, (t3-t1)/(2k).

Run: python scripts/probe_outer_replica.py [L] [R]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from qmg_tpu import solvers


def timed_scalar(fn, reps=5):
    out = fn()
    float(np.asarray(jax.device_get(jnp.sum(jnp.abs(out)))))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(np.asarray(jax.device_get(jnp.sum(jnp.abs(out)))))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 2 * L * L
    shape = (2, L, L // 2, 2)  # cv-like 4-D shape, n elements

    @jax.jit
    def init():
        key = jax.random.PRNGKey(0)
        kr, ki = jax.random.split(key)
        return (jax.random.normal(kr, shape, jnp.float32)
                + 1j * jax.random.normal(ki, shape, jnp.float32)
                ).astype(jnp.complex64)

    b = init()
    matvec = lambda v: v * (1.0 + 1e-6j)

    def make(k):
        @jax.jit
        def run(b_):
            res, _ = solvers.gcr_var_precond_restart(
                matvec, b_, lambda r, c: (r, c), max_iter=k, tol=1e-30,
                restart_freq=R, precond_carry=None, fixed_trips=True)
            return res.x
        return run

    k = 2
    f1, f3 = make(k), make(3 * k)
    t1 = timed_scalar(lambda: f1(b))
    t3 = timed_scalar(lambda: f3(b))
    print(f"[replica] real_gcr (fixed_trips, while): "
          f"{(t3-t1)/(2*k)*1e3:.2f} ms/trip", flush=True)

    # ---- local body variants ----
    rdt = jnp.float32

    def variant(use_cond, use_where, use_while):
        def make_v(kmax):
            @jax.jit
            def run(b_):
                # body closes over the TRACED b_ (a closed-over device
                # array would be embedded as a 1 GB MLIR constant and
                # die on axon); store inits also built inside jit.
                def body(s):
                    x, r, rsq, ps, aps, apsq, j, kk = s
                    if use_cond:
                        def do_restart(args):
                            x_, r_, ps_, aps_, apsq_ = args
                            return (x_, b_ - matvec(x_),
                                    jnp.zeros_like(ps_),
                                    jnp.zeros_like(aps_),
                                    jnp.ones_like(apsq_))
                        need = j >= R
                        x, r, ps, aps, apsq = lax.cond(
                            need, do_restart, lambda a: a,
                            (x, r, ps, aps, apsq))
                        j = jnp.where(need, 0, j)
                    z = r
                    ap = matvec(z)
                    ap_flat = ap.reshape(n)
                    betas = (jnp.conj(aps) @ ap_flat) / apsq
                    if use_where:
                        betas = jnp.where(jnp.arange(R) < j, betas, 0.0)
                    ap = (ap_flat - betas @ aps).reshape(b_.shape)
                    z = (z.reshape(n) - betas @ ps).reshape(b_.shape)
                    apsq_new = solvers.norm2sq(ap)
                    if use_where:
                        broke = ~(apsq_new > jnp.asarray(
                            np.finfo(np.float32).tiny, rdt))
                        alpha = jnp.where(
                            broke, 0.0,
                            solvers.vdot(ap, r)
                            / jnp.where(broke, 1.0, apsq_new))
                    else:
                        alpha = solvers.vdot(ap, r) / apsq_new
                    x = x + alpha * z
                    r = r - alpha * ap
                    rsq = solvers.norm2sq(r)
                    ps = lax.dynamic_update_index_in_dim(
                        ps, z.reshape(n), j, 0)
                    aps = lax.dynamic_update_index_in_dim(
                        aps, ap.reshape(n), j, 0)
                    apsq = lax.dynamic_update_index_in_dim(
                        apsq, apsq_new, j, 0)
                    return (x, r, rsq, ps, aps, apsq, j + 1, kk + 1)

                ps0 = jnp.zeros((R, n), jnp.complex64)
                apsq0 = jnp.ones((R,), rdt)
                s0 = (jnp.zeros_like(b_), b_, solvers.norm2sq(b_), ps0,
                      jnp.zeros_like(ps0), apsq0, jnp.int32(0),
                      jnp.int32(0))
                if use_while:
                    out = lax.while_loop(lambda s: s[-1] < kmax, body, s0)
                else:
                    out = lax.fori_loop(0, kmax, lambda i, s: body(s), s0)
                return out[0]
            return run
        return make_v

    for name, (uc, uw, uwh) in {
            "full_local (cond+where+while)": (True, True, True),
            "nocond": (False, True, True),
            "nowhere": (True, False, True),
            "fori (cond+where)": (True, True, False),
            "bare (no cond/where, fori)": (False, False, False),
    }.items():
        mk = variant(uc, uw, uwh)
        f1, f3 = mk(k), mk(3 * k)
        t1 = timed_scalar(lambda: f1(b))
        t3 = timed_scalar(lambda: f3(b))
        print(f"[replica] {name}: {(t3-t1)/(2*k)*1e3:.2f} ms/trip",
              flush=True)


if __name__ == "__main__":
    main()
