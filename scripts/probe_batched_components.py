"""Component-level timing of the batched-vs-single K-cycle (VERDICT r3
item 3, continued).

The HLO census (probe_batched_hlo.py) showed the batched program's copy
BYTES per rhs are comparable to single (110 vs 136 MiB) and temp memory
scales linearly - the whole-program relayout hypothesis is NOT
confirmed. This probe times the individual pipeline stages under
jax.vmap to find which stage carries the ~3x per-rhs overhead:

  * fine Dslash apply (level 0, 256^2 nc=2)
  * coarse apply (level 1, 64^2 nc=8)
  * coarsest apply (level 2, 16^2 nc=8)
  * restrict+prolong round trip (level 0)
  * one full outer FGCR iteration (fixed-schedule 3 minus 1, halved)

Overhead subtraction (the round-4 census lesson): a single dispatch
on the axon tunnel carries a large CONSTANT cost (~50-230 ms) that
dwarfs the small stages - the 0.16-0.26 "per-rhs ratios" of the K-only
census mostly measured constant/(nrhs*constant). Each stage is
therefore timed at K and 2K applications in otherwise-identical
programs and the figure of merit uses the MARGINAL time
  dt = t(2K) - t(K)   (pure device-side per-K-applies cost)
  ratio = dt_batched / (nrhs * dt_single)
(1.0 = perfect linear scaling; < 1 = batching amortizes; > 1 = the
stage is where the regression lives).

Usage: python scripts/probe_batched_components.py [L] [nrhs] [K] [setup]
  setup: "host" (CPU hierarchy build, default) or "device" (the
  null-vector solves / Galerkin build run on the accelerator via
  setup_planes - keeps the probe host-light when the host CPU is
  busy elsewhere).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def bench(fn, args, iters=20):
    """Times iters dispatches of fn, scalarized on device.

    jax.block_until_ready does NOT reliably wait on the axon remote-TPU
    backend (an earlier revision of this probe used it and reported
    numbers ~30x off); sync by fetching a device-side scalar reduction
    of the output instead. The fetch is one f32 per call; the MIN over
    synced reps rejects host/tunnel dispatch noise.
    """
    import jax
    import jax.numpy as jnp

    def scalar_fn(*a):
        out = fn(*a)
        return jax.tree_util.tree_reduce(
            lambda acc, x: acc + jnp.sum(jnp.abs(x)), out,
            jnp.float32(0.0))

    f = jax.jit(scalar_fn)
    float(np.asarray(jax.device_get(f(*args))))  # warm / compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(jax.device_get(f(*args))))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nrhs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    setup_where = sys.argv[4] if len(sys.argv) > 4 else "host"
    direct = len(sys.argv) > 5 and sys.argv[5] == "direct"

    import jax
    import jax.numpy as jnp
    from jax import lax
    from qmg_tpu.lattice import Lattice2D
    from qmg_tpu.operators import Wilson2D
    from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
    from qmg_tpu.stencil import apply_M
    from qmg_tpu.tpu_compat import (make_planes_solver, host_to_planes,
                                    from_planes, to_planes)
    from qmg_tpu import u1
    from qmg_tpu.rng import QMGRandom

    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    cpu = jax.devices("cpu")[0]
    cfg = KCycleConfig(n_refine=2, coarse_dof=8, nullvec_tol=5e-4,
                       nullvec_max_iter=200, coarsest_direct=direct)
    with jax.default_device(cpu):
        gauge = jnp.asarray(u1.gauss_gauge_u1(lat, rng, 6.0),
                            dtype=jnp.complex64)
        op = Wilson2D(lat, -0.06, gauge, dtype=jnp.complex64)
        mg = build_kcycle_hierarchy(lat, op, cfg, rng,
                                    structure_only=setup_where == "device")
        if setup_where == "host":
            _, state = make_planes_solver(mg, tol=1e-5, max_iter=200,
                                          restart_freq=32)
        b1 = host_to_planes(rng.gaussian_cv(lat))
        bN = np.stack([host_to_planes(rng.gaussian_cv(lat))
                       for _ in range(nrhs)])
        # Coarse-level probe vectors.
        vc = [host_to_planes(
            np.asarray(rng.gaussian_cv(mg.get_lattice(l))
                       ).astype(np.complex64))
              for l in range(mg.get_num_levels())]
        vcN = [np.stack([host_to_planes(
            np.asarray(rng.gaussian_cv(mg.get_lattice(l))
                       ).astype(np.complex64)) for _ in range(nrhs)])
               for l in range(mg.get_num_levels())]
    if setup_where == "device":
        # Accelerator-resident setup (host does only the gaussian seeds).
        from qmg_tpu.setup_planes import (make_kcycle_setup_planes,
                                          gauss_seed_planes)
        setup_fn = make_kcycle_setup_planes(lat, cfg, -0.06)
        seeds = gauss_seed_planes(lat, cfg, QMGRandom(1337))
        state = setup_fn(host_to_planes(np.asarray(gauge)), *seeds)
        float(np.asarray(jax.device_get(
            jnp.sum(jnp.abs(state[f"nvb{cfg.n_refine - 1}"])))))
        print("[probe] device setup done", flush=True)

    dev = jax.devices()[0]
    print(f"[probe] backend {dev.platform} ({dev.device_kind}), L={L}, "
          f"nrhs={nrhs}, K={K}", flush=True)

    rows = []

    def report(label, mk_fn, a1, aN, k1=None):
        """mk_fn(k) -> stage closure doing k inner applications."""
        k1 = K if k1 is None else k1
        in_axes = tuple(None if i < len(a1) - 1 else 0
                        for i in range(len(a1)))
        tK1 = bench(mk_fn(k1), a1)
        t2K1 = bench(mk_fn(2 * k1), a1)
        tKN = bench(jax.vmap(mk_fn(k1), in_axes=in_axes), aN)
        t2KN = bench(jax.vmap(mk_fn(2 * k1), in_axes=in_axes), aN)
        d1 = max(t2K1 - tK1, 1e-9)
        dN = max(t2KN - tKN, 1e-9)
        ratio = dN / (nrhs * d1)
        rows.append((label, d1 * 1e3, dN * 1e3, ratio))
        print(f"[{label:18s}] marginal single {d1*1e3:8.2f} ms  "
              f"batched x{nrhs} {dN*1e3:8.2f} ms  "
              f"per-rhs ratio {ratio:5.2f}   "
              f"(raw K single {tK1*1e3:.1f} / batched {tKN*1e3:.1f})",
              flush=True)

    # --- per-level stencil applies -------------------------------------
    for lvl in range(mg.get_num_levels()):
        st = mg.get_stencil(lvl)
        cl_p = state.get(f"clover{lvl}")
        hp_p = state.get(f"hopping{lvl}")
        sh_p = state[f"shifts{lvl}"]
        base = st.coeffs

        def mk_stage(k, base=base):
            def stage(cl_p, hp_p, sh_p, v_p):
                sh = from_planes(sh_p)
                kw = {}
                if cl_p is not None:
                    kw["clover"] = from_planes(cl_p)
                if hp_p is not None:
                    kw["hopping"] = from_planes(hp_p)
                coeffs = base.replace(**kw, shift=sh[0], eo_shift=sh[1],
                                      dof_shift=sh[2])
                v = from_planes(v_p)

                def body(_, v):
                    v = apply_M(coeffs, v)
                    return v / jnp.float32(8.0)
                return to_planes(lax.fori_loop(0, k, body, v))
            return stage

        report(f"apply L{lvl} {st.lat.y_len}^2 nc{st.lat.nc}", mk_stage,
               (cl_p, hp_p, sh_p, vc[lvl]), (cl_p, hp_p, sh_p, vcN[lvl]))

    # --- transfer round trip at level 0 --------------------------------
    t = mg.get_transfer(0)
    nvb_p = state["nvb0"]
    saved_nvb = t._nvb

    def mk_xfer(k):
        def xfer(nvb_p, v_p):
            t._nvb = from_planes(nvb_p)
            try:
                v = from_planes(v_p)

                def body(_, v):
                    return (t.prolong_c2f(t.restrict_f2c(v))
                            / jnp.float32(4.0))
                return to_planes(lax.fori_loop(0, k, body, v))
            finally:
                t._nvb = saved_nvb
        return xfer

    report("restrict+prolong", mk_xfer, (nvb_p, vc[0]), (nvb_p, vcN[0]))

    # --- direct (dense-inverse) coarsest apply, if built ----------------
    if "cdinv" in state:
        cd_p = state["cdinv"]

        def mk_cd(k):
            def cd(cd_p, v_p):
                dinv = from_planes(cd_p)
                v = from_planes(v_p)
                shape = v.shape

                def body(_, v):
                    out = (dinv @ v.reshape(-1)).reshape(shape)
                    return out / jnp.float32(8.0)
                return to_planes(lax.fori_loop(0, k, body, v))
            return cd

        report("cdinv dense apply", mk_cd, (cd_p, vc[-1]),
               (cd_p, vcN[-1]), k1=3 * K)

    # --- full outer FGCR iterations (K-cycle precond included):
    # marginal = t(fixed 4) - t(fixed 2), per 2 outers. This is the
    # composition measurement the per-stage rows can't see (direction
    # stores, orthogonalization, inner-loop carries under vmap).
    def mk_outer(k):
        sp, _ = make_planes_solver(mg, tol=0.0, max_iter=k,
                                   restart_freq=32, fixed_outer_iters=k)
        return sp

    # k1=8 (8 vs 16 fixed outers): the tunnel's per-dispatch noise is
    # +-10-25 ms even under min-of-reps, so 2-outer marginals are mush
    # on the single side; 8-outer marginals put the single-side signal
    # near ~100 ms.
    report("outer FGCR x8", mk_outer, (state, b1), (state, bN), k1=8)
    print("[probe] outer row marginal = 8 steady outer iterations "
          "incl. K-cycle precond (overhead-free)", flush=True)


if __name__ == "__main__":
    main()
