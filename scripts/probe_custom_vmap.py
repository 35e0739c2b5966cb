"""Candidate FIX for the batched-apply regression: a custom_vmap rule
on the stacked stencil matvec (VERDICT r3 item 3, PERF.md "isolation
matrix" + probe_vmap_micro results).

Established so far (marginal K-vs-2K protocol, scalar-fetch sync):
  * vmapped elementwise/roll/chess bodies cost ~0 marginal -> the
    batched fori_loop carry and the rolls are FREE under vmap;
  * the real vmapped apply costs ~0.35 ms/rhs/apply (~10-15x off
    bandwidth) and the HLO census blames the batched site-matvec
    einsum being re-lowered as convolutions.

So the fix target is ONE function: the stacked per-site matvec
  out = einsum("s...ij,s...j->...i", mats, nbrs).
jax.custom_batching.custom_vmap lets us keep the single-rhs program
byte-identical while hand-writing the batched program. Variants:

  vmap-plain   - today's behavior (vmap's dot_general batching rule)
  vmap-bminor  - rule: move batch to the MINOR axis and contract as a
                 per-site (i,j)@(j,b) matmul, einsum
                 "s...ij,s...jb->...ib", then move batch back out
  vmap-eltwise - rule: unrolled multiply-add over (s,i,j) slices;
                 every op is elementwise over (Y,Xh)-minor planes with
                 the batch axis leading (the shape micro-probed at ~0
                 marginal cost)

Usage: python scripts/probe_custom_vmap.py [L] [nrhs] [K] [reps]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def bench(f, args, reps):
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
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 6

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.custom_batching import custom_vmap
    from qmg_tpu.lattice import Lattice2D
    from qmg_tpu.stencil import ALL_DIRS
    from qmg_tpu.cshift import cshift_pull
    from qmg_tpu.tpu_compat import host_to_planes, from_planes, to_planes
    from qmg_tpu.operators import Wilson2D
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
        v1 = host_to_planes(rng.gaussian_cv(lat))
        vN = np.stack([host_to_planes(rng.gaussian_cv(lat))
                       for _ in range(nrhs)])

    dev = jax.devices()[0]
    print(f"[probe] backend {dev.platform} ({dev.device_kind}), L={L}, "
          f"nrhs={nrhs}, K={K}, reps={reps}", flush=True)

    def make_stacked_matvec(kind):
        if kind == "plain":
            def mv(mats, nbrs):
                return jnp.einsum("s...ij,s...j->...i", mats, nbrs)
            return mv

        @custom_vmap
        def mv(mats, nbrs):
            return jnp.einsum("s...ij,s...j->...i", mats, nbrs)

        if kind == "bminor":
            @mv.def_vmap
            def _rule(axis_size, in_batched, mats, nbrs):
                mats_b, nbrs_b = in_batched
                assert nbrs_b and not mats_b
                # nbrs (b, s, ..., j) -> (s, ..., j, b)
                nb = jnp.moveaxis(nbrs, 0, -1)
                out = jnp.einsum("s...ij,s...jb->...ib", mats, nb)
                return jnp.moveaxis(out, -1, 0), True
        elif kind == "eltwise":
            @mv.def_vmap
            def _rule(axis_size, in_batched, mats, nbrs):
                mats_b, nbrs_b = in_batched
                assert nbrs_b and not mats_b
                ns, nc = mats.shape[0], mats.shape[-1]
                outs = []
                for i in range(nc):
                    acc = None
                    for s in range(ns):
                        for j in range(nc):
                            term = mats[s, ..., i, j] * nbrs[:, s, ..., j]
                            acc = term if acc is None else acc + term
                    outs.append(acc)
                return jnp.stack(outs, axis=-1), True
        else:
            raise ValueError(kind)
        return mv

    def mk_stage(kind, kk):
        mv = make_stacked_matvec(kind)

        def stage(cl_p, hp_p, v_p):
            clover = from_planes(cl_p)
            hopping = from_planes(hp_p)
            v = from_planes(v_p)
            mats = jnp.concatenate([clover[None], hopping])

            def body(_, v):
                nbrs = jnp.stack([v] + [cshift_pull(v, d)
                                        for d in ALL_DIRS])
                return mv(mats, nbrs) / jnp.float32(8.0)
            return to_planes(lax.fori_loop(0, kk, body, v))
        return stage

    def scalarize(stage):
        def f(*a):
            return jnp.sum(jnp.abs(stage(*a)))
        return f

    # Correctness first (CPU x64 reference not needed: compare batched
    # lane 0 against the single program on the same backend).
    f_single = jax.jit(mk_stage("plain", 3))
    outs = {"single": np.asarray(jax.device_get(
        f_single(cl_p, hp_p, vN[0])))}
    for kind in ("plain", "bminor", "eltwise"):
        fb = jax.jit(jax.vmap(mk_stage(kind, 3),
                              in_axes=(None, None, 0)))
        outs[kind] = np.asarray(jax.device_get(
            fb(cl_p, hp_p, vN)))[0]
    for kind in ("plain", "bminor", "eltwise"):
        d = np.max(np.abs(outs[kind] - outs["single"]))
        r = np.max(np.abs(outs["single"]))
        print(f"[check {kind}] lane0 vs single: max|d| {d:.3e} "
              f"(rel {d/r:.3e})", flush=True)

    K2 = 8 * K
    jobs = [("single", lambda kk: mk_stage("plain", kk),
             (cl_p, hp_p, v1), 1)]
    for kind in ("plain", "bminor", "eltwise"):
        jobs.append((
            f"vmap-{kind} x{nrhs}",
            lambda kk, kind=kind: jax.vmap(mk_stage(kind, kk),
                                           in_axes=(None, None, 0)),
            (cl_p, hp_p, vN), nrhs))
    for label, mk, args, b in jobs:
        fA = jax.jit(scalarize(mk(K)))
        fB = jax.jit(scalarize(mk(K2)))
        tA = bench(fA, args, reps)
        tB = bench(fB, args, reps)
        marg = (tB - tA) / (K2 - K)
        print(f"[{label}] marginal {marg*1e3:7.3f} ms/apply "
              f"({marg*1e3/b:7.4f} ms/rhs/apply)  "
              f"[tK={tA*1e3:.1f} t8K={tB*1e3:.1f}]", flush=True)


if __name__ == "__main__":
    main()
