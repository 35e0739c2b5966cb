"""Headline benchmark: Wilson Dslash effective HBM bandwidth on TPU.

The reference publishes no performance numbers (BASELINE.md); the driver
baseline target is "Dslash > 70% of v5e HBM roofline". The Dslash is
HBM-bound (arithmetic intensity < 1 flop/byte), so the honest headline is
effective bandwidth = minimum-traffic bytes / wall time:

    bytes/apply = clover + hopping + x(read) + out(write)
                = (nc^2 + 4 nc^2 + 2 nc) * V * sizeof(c64)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the fraction of the v5e HBM roofline (~819 GB/s).

TPU note: the axon backend cannot materialize complex buffers at jit
boundaries, so fields cross as float32 plane pairs (qmg_tpu.tpu_compat)
and the timed loop returns an f32 scalar checksum - which also forces
real synchronization for timing. Host-side setup is pure NumPy.
"""

import argparse
import json
import sys
import time

import numpy as np


from qmg_tpu.operators.wilson import wilson_coeffs_numpy


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=2048)
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--mode", choices=["dslash", "kcycle", "refine"],
                   default="dslash")
    p.add_argument("--kernel",
                   choices=["phase-r1", "phase-split", "phase", "pallas",
                            "split", "small", "xla"],
                   default="phase-r1",
                   help="interleaved rank-1 phase kernel (default), "
                        "split-layout rank-1 phase kernel, "
                        "interleaved phase-streaming Wilson kernel, "
                        "generic matrix Pallas kernel, row-parity-split "
                        "matrix kernel, VMEM-resident small-lattice "
                        "kernel, or the jnp/XLA path")
    p.add_argument("--tile", type=int, default=32,
                   help="Pallas Y-tile rows")
    p.add_argument("--setup", default="host", choices=["host", "device"],
                   help="kcycle mode: where the hierarchy setup runs. "
                        "'host' = eager CPU build (exact fp64-grade "
                        "flow); 'device' = the whole setup jitted onto "
                        "the accelerator (setup_planes), with a cheap "
                        "structure-only scaffold on the host - the only "
                        "practical path at >= 1024^2")
    p.add_argument("--coarse-apply", default="auto",
                   choices=["auto", "jnp", "gather", "small"],
                   help="kcycle mode: coarse-level ORIGINAL apply "
                        "formulation (auto: jnp for --kernel xla, "
                        "gather otherwise)")
    p.add_argument("--no-direct", action="store_true",
                   help="kcycle mode: keep the iterative coarsest solve "
                        "instead of the dense-inverse direct one")
    p.add_argument("--nrhs", type=int, default=1,
                   help="kcycle mode: solve this many right-hand sides "
                        "in ONE batched device program "
                        "(make_batched_planes_solver); reports ms/rhs")
    p.add_argument("--fixed-schedule", type=str, default=None,
                   metavar="OUTER[,INNER]",
                   help="kcycle --nrhs mode: fixed-trip-count schedule. "
                        "'12' = fixed outer + adaptive masked inner "
                        "(the measured-best batched config, PERF.md); "
                        "'12,4' = trip-count every level "
                        "(make_fixed_batched_planes_solver)")
    p.add_argument("--calibrated", action="store_true",
                   help="kcycle --nrhs mode: auto-calibrate the fixed "
                        "outer trip count from ONE masked probe solve "
                        "(make_calibrated_batched_planes_solver) and "
                        "assert the target tolerance is met without "
                        ">1 decade overshoot")
    p.add_argument("--channels-first", default="auto",
                   choices=["auto", "on", "off"],
                   help="kcycle --setup device: run the setup stages in "
                        "channels-first real-pair arithmetic (cf.py). "
                        "auto = on at >= 2048^2, where the standard "
                        "complex stages hit the XLA layout pathology "
                        "(PERF.md 'Device-resident setup')")
    p.add_argument("--outer", default="original",
                   choices=["original", "schur"],
                   help="kcycle mode: outer operator formulation. "
                        "'schur' = the n19 configuration (rbjacobi "
                        "null-vector generation, rbjacobi coarsening, "
                        "RIGHT_SCHUR solves at every level; reference "
                        "tests/n19_wilson_kcycle_precond); halves the "
                        "active coarse dimensions")
    p.add_argument("--deflate", type=int, default=0,
                   help="kcycle --setup device: deflate this many "
                        "low eigenpairs of the coarsest normal operator "
                        "(setup_planes deflate_low; reference "
                        "stateful_multigrid.h:613-696)")
    p.add_argument("--chain", type=int, default=0,
                   help="kcycle --nrhs mode: also measure the STEADY-"
                        "STATE device cost by chaining this many solves "
                        "inside one program (each rhs perturbed by the "
                        "previous solution) - removes the per-dispatch "
                        "tunnel overhead that dominates one-solve-per-"
                        "dispatch timings (PERF.md 'Batched steady-state "
                        "numbers RETRACTED'); the JSON metric then reports "
                        "the marginal per-rhs ms")
    p.add_argument("--hbm-roofline-gbs", type=float, default=819.0,
                   help="TPU v5e HBM bandwidth")
    args = p.parse_args(argv)
    return main_with_args(args)


def main_with_args(args):
    import jax
    # Register a CPU backend next to the TPU for host-side complex setup.
    try:
        import os as _os
        if _os.environ.get("JAX_PLATFORMS") == "axon":
            jax.config.update("jax_platforms", "axon,cpu")
    except Exception:
        pass
    # Persistent compilation cache: the 2048^2 programs cost minutes of
    # cold compile per process (PERF.md); repeat runs in this workspace
    # reuse the executables (VERDICT r3 item 7).
    try:
        from qmg_tpu.cache import enable_persistent_cache
        enable_persistent_cache()
    except Exception:
        pass
    # The remote-TPU tunnel can die outright (observed: axon register()
    # hangs forever inside native code when the relay endpoint is down -
    # not interruptible by Python-level signals). Probe backend init in
    # a SUBPROCESS with a hard timeout so the driver gets a clean
    # failure instead of an indefinite hang.
    if _os.environ.get("JAX_PLATFORMS", "").startswith("axon"):
        import subprocess as _sp
        try:
            _sp.run([sys.executable, "-c",
                     "import jax; jax.devices()"],
                    timeout=600, check=True, capture_output=True)
        except (_sp.TimeoutExpired, _sp.CalledProcessError) as _e:
            print("# FATAL: TPU backend initialization failed/timed out "
                  f"({type(_e).__name__}) - axon tunnel down? No "
                  "benchmark result.", file=sys.stderr)
            raise SystemExit(3)
    import jax.numpy as jnp
    from qmg_tpu.lattice import Lattice2D
    from qmg_tpu.stencil import apply_M, make_coeffs
    from qmg_tpu.tpu_compat import from_planes, host_to_planes
    from qmg_tpu import u1
    from qmg_tpu.rng import QMGRandom

    if args.mode == "kcycle":
        return bench_kcycle(args)
    if args.mode == "refine":
        return bench_refine(args)

    L = args.size
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)

    gauge_np = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    clover, hopping = wilson_coeffs_numpy(lat, gauge_np)
    clover_p = host_to_planes(clover)
    hopping_p = host_to_planes(hopping)
    x_p = host_to_planes(rng.gaussian_cv(lat))
    x_p /= np.sqrt(np.sum(x_p * x_p))
    mass = -0.075

    n_iters = args.iters

    def _fallback(e):
        fallback = {"phase-r1": "phase", "phase-split": "phase",
                    "phase": "pallas"}.get(
            args.kernel, "xla")
        print(f"# {args.kernel} kernel unavailable ({type(e).__name__}: "
              f"{e}); falling back to the {fallback} path", file=sys.stderr)
        args.kernel = fallback
        return main_with_args(args)

    if args.kernel == "phase-r1":
        # Interleaved-layout rank-1 phase kernel: the proven window/DMA
        # structure of "phase" with ONE complex multiply per direction
        # (w=1 rank-1 projectors) - ~40% fewer VPU ops.
        from qmg_tpu.pallas_wilson import make_pallas_wilson_rank1_shaped
        try:
            apply_fn = make_pallas_wilson_rank1_shaped(
                lat.y_len, lat.xh, 1.0, mass, tile=args.tile)
        except ValueError as e:
            return _fallback(e)
        u_half = -hopping[..., 0, 0]                 # 0.5 * U_d_eff
        ppl = np.stack([u_half.real, u_half.imag], axis=2).astype(
            np.float32)
        xpl = np.moveaxis(x_p, 3, 1)
        xpl = np.moveaxis(xpl, 4, 2).astype(np.float32)

        @jax.jit
        def chain(ppl, xpl):
            def body(_, v):
                y = apply_fn(ppl, v)
                return y / jnp.sqrt(jnp.sum(y * y))
            out = jax.lax.fori_loop(0, n_iters, body, xpl)
            return jnp.sum(jnp.abs(out))

        dev_args = [jax.device_put(a) for a in (ppl, xpl)]
    elif args.kernel == "phase-split":
        # Split-layout rank-1 variant of the phase kernel: pure-roll
        # pulls (no row-parity selects) and ONE complex multiply per
        # direction via the w=1 rank-1 projector factorization
        # (pallas_wilson.py). Same 64 B/site traffic as "phase".
        from qmg_tpu.pallas_wilson import make_pallas_wilson_split_shaped
        try:
            apply_fn = make_pallas_wilson_split_shaped(
                lat.y_len, lat.xh, 1.0, mass, tile=args.tile)
        except ValueError as e:
            return _fallback(e)
        u_half = -hopping[..., 0, 0]                 # 0.5 * U_d_eff
        # (4, 2p, Y, Xh) complex -> split (4, 2p, 2r, 2ri, Yh, Xh).
        v = u_half.reshape(4, 2, lat.y_len // 2, 2, lat.xh)
        v = v.transpose(0, 1, 3, 2, 4)
        ppl = np.stack([v.real, v.imag], axis=3).astype(np.float32)
        xc = np.asarray(x_p[..., 0] + 1j * x_p[..., 1])
        v = xc.reshape(2, lat.y_len // 2, 2, lat.xh, lat.nc)
        v = v.transpose(0, 2, 4, 1, 3)
        xpl = np.stack([v.real, v.imag], axis=3).astype(np.float32)

        @jax.jit
        def chain(ppl, xpl):
            def body(_, v):
                y = apply_fn(ppl, v)
                return y / jnp.sqrt(jnp.sum(y * y))
            out = jax.lax.fori_loop(0, n_iters, body, xpl)
            return jnp.sum(jnp.abs(out))

        dev_args = [jax.device_put(a) for a in (ppl, xpl)]
    elif args.kernel == "phase":
        # Wilson-specialized kernel: streams only the 4 U(1) phases per
        # site (the spin projectors are compile-time constants), cutting
        # HBM traffic from 192 to 64 B/site (pallas_wilson.py). The
        # effective-bandwidth metric keeps the generic-formulation
        # definition (192 B/site x sites/s), so values above the HBM
        # roofline mean the specialization beats the matrix kernel's
        # speed-of-light.
        from qmg_tpu.pallas_wilson import make_pallas_wilson_shaped
        try:
            apply_fn = make_pallas_wilson_shaped(lat.y_len, lat.xh, 1.0,
                                                 mass, tile=args.tile)
        except ValueError as e:
            return _fallback(e)
        u_half = -hopping[..., 0, 0]                 # 0.5 * U_d_eff
        ppl = np.stack([u_half.real, u_half.imag], axis=2).astype(
            np.float32)
        xpl = np.moveaxis(x_p, 3, 1)
        xpl = np.moveaxis(xpl, 4, 2).astype(np.float32)

        @jax.jit
        def chain(ppl, xpl):
            def body(_, v):
                y = apply_fn(ppl, v)
                return y / jnp.sqrt(jnp.sum(y * y))
            out = jax.lax.fori_loop(0, n_iters, body, xpl)
            return jnp.sum(jnp.abs(out))

        dev_args = [jax.device_put(a) for a in (ppl, xpl)]
    elif args.kernel in ("pallas", "split", "small"):
        # Channel planes on host: fold the mass into the clover diagonal.
        clover_m = clover.copy()
        clover_m[..., 0, 0] += mass
        clover_m[..., 1, 1] += mass
        try:
            if args.kernel == "pallas":
                from qmg_tpu.pallas_dslash import make_pallas_dslash_shaped
                apply_fn = make_pallas_dslash_shaped(
                    lat.nc, lat.y_len, lat.xh, tile=args.tile)
            elif args.kernel == "split":
                from qmg_tpu.pallas_dslash import \
                    make_pallas_dslash_split_shaped
                apply_fn = make_pallas_dslash_split_shaped(
                    lat.nc, lat.y_len, lat.xh, tile=args.tile)
            else:
                from qmg_tpu.pallas_dslash import \
                    make_pallas_dslash_small_shaped
                apply_fn = make_pallas_dslash_small_shaped(
                    lat.nc, lat.y_len, lat.xh)
        except ValueError as e:
            return _fallback(e)
        if args.kernel == "pallas":
            cpl = np.moveaxis(clover_m, (3, 4), (1, 2))
            cpl = np.stack([cpl.real, cpl.imag], axis=3).astype(np.float32)
            hpl = np.moveaxis(hopping, (4, 5), (2, 3))
            hpl = np.stack([hpl.real, hpl.imag], axis=4).astype(np.float32)
            # x planes (2, nc, 2, Y, Xh).
            xpl = np.moveaxis(x_p, 3, 1)            # (2, nc, Y, Xh, 2)
            xpl = np.moveaxis(xpl, 4, 2).astype(np.float32)
        else:
            # Row-parity-split layouts (pallas_dslash.py split kernels).
            def np_split_mat(z):
                p2, Y, Xh, n1, n2 = z.shape
                v = z.reshape(p2, Y // 2, 2, Xh, n1, n2)
                v = v.transpose(0, 2, 4, 5, 1, 3)
                return np.stack([v.real, v.imag], axis=-3).astype(
                    np.float32)
            cpl = np_split_mat(clover_m)
            hpl = np.stack([np_split_mat(h) for h in hopping])
            xc = np.asarray(x_p[..., 0] + 1j * x_p[..., 1])
            v = xc.reshape(2, lat.y_len // 2, 2, lat.xh, lat.nc)
            v = v.transpose(0, 2, 4, 1, 3)
            xpl = np.stack([v.real, v.imag], axis=3).astype(np.float32)

        @jax.jit
        def chain(cpl, hpl, xpl):
            def body(_, v):
                y = apply_fn(cpl, hpl, v)
                return y / jnp.sqrt(jnp.sum(y * y))
            out = jax.lax.fori_loop(0, n_iters, body, xpl)
            return jnp.sum(jnp.abs(out))

        dev_args = [jax.device_put(a) for a in (cpl, hpl, xpl)]
    else:
        @jax.jit
        def chain(clover_p, hopping_p, x_p):
            coeffs = make_coeffs(lat, clover=from_planes(clover_p),
                                 hopping=from_planes(hopping_p),
                                 shift=mass, dtype=jnp.complex64)
            x = from_planes(x_p)

            def body(_, x):
                y = apply_M(coeffs, x)
                return y / jnp.sqrt(jnp.sum(jnp.abs(y) ** 2))

            out = jax.lax.fori_loop(0, n_iters, body, x)
            return jnp.sum(jnp.abs(out))  # f32 scalar output

        dev_args = [jax.device_put(a)
                    for a in (clover_p, hopping_p, x_p)]
    try:
        for _ in range(args.warmup):
            float(chain(*dev_args))
    except Exception as e:  # pragma: no cover - robustness for the driver
        if args.kernel in ("phase-r1", "phase-split", "phase",
                           "pallas"):
            return _fallback(e)
        raise
    t0 = time.perf_counter()
    checksum = float(chain(*dev_args))
    dt = time.perf_counter() - t0

    nc = lat.nc
    itemsize = 8  # complex64
    bytes_per_apply = (nc * nc + 4 * nc * nc + 2 * nc) * lat.volume * itemsize
    # The renormalization adds one read+write of x; count it honestly.
    bytes_per_iter = bytes_per_apply + 2 * nc * lat.volume * itemsize
    gbs = bytes_per_iter * n_iters / dt / 1e9
    frac = gbs / args.hbm_roofline_gbs

    # Own-traffic accounting: the bytes THIS kernel actually moves per
    # iteration. The phase kernels stream 4 U(1) phases (4 x 8 = 32
    # B/site) instead of full matrices, plus the x read (16 B) and out
    # write (16 B), plus the renorm's out read + x write (32 B): 96
    # B/site total. Matrix/jnp formulations move the full 224 B/site.
    if args.kernel in ("phase-r1", "phase-split", "phase"):
        own_bytes_iter = (4 * 8 + 2 * nc * itemsize) * lat.volume \
            + 2 * nc * lat.volume * itemsize
    else:
        own_bytes_iter = bytes_per_iter
    own_gbs = own_bytes_iter * n_iters / dt / 1e9
    own_pct = 100.0 * own_gbs / args.hbm_roofline_gbs

    sites_per_sec = lat.volume * n_iters / dt
    print(f"# wilson dslash {L}x{L} {args.kernel}: {dt*1e3/n_iters:.3f} ms/"
          f"apply, {sites_per_sec/1e9:.3f} Gsites/s, {gbs:.1f} GB/s "
          f"({100*frac:.1f}% of {args.hbm_roofline_gbs} GB/s roofline), "
          f"own-traffic {own_gbs:.1f} GB/s = {own_pct:.1f}% roofline, "
          f"checksum={checksum:.4e} on {jax.devices()[0].device_kind}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "wilson_dslash_effective_bandwidth",
        "value": round(gbs, 2),
        "unit": "GB/s",
        "vs_baseline": round(frac, 4),
        "own_traffic_gbs": round(own_gbs, 2),
        "own_traffic_pct": round(own_pct, 2),
    }))


def bench_kcycle(args):
    """Full MG K-cycle solve on the TPU via the real-plane whole-solver
    wrapper (tpu_compat.make_planes_solver). Setup runs on the CPU
    backend (complex64); the solve jits onto the TPU. Reports solve wall
    time; vs_baseline carries ms per outer iteration."""
    import os
    import jax
    import jax.numpy as jnp
    from qmg_tpu.lattice import Lattice2D
    from qmg_tpu.operators import Wilson2D
    from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
    from qmg_tpu.tpu_compat import make_planes_solver, host_to_planes
    from qmg_tpu import u1
    from qmg_tpu.rng import QMGRandom

    L = args.size
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    tol = 1e-5  # f32 K-cycle target

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        path = ("/root/reference/tests/common_cfgs_u1/"
                f"l{L}t{L}b60_heatbath.dat")
        if os.path.exists(path):
            gauge = jnp.asarray(u1.read_gauge_u1(lat, path),
                                dtype=jnp.complex64)
        else:
            gauge = jnp.asarray(u1.gauss_gauge_u1(lat, rng, 6.0),
                                dtype=jnp.complex64)
        op = Wilson2D(lat, -0.06, gauge, dtype=jnp.complex64)
        # Depth scales with L so the coarsest level stays tiny: the
        # direct coarsest densify probes the full coarsest basis, and
        # a 64^2 x nc8 coarsest (L=1024 at n_refine=2) would mean
        # 32768 probes + an 8 GB dense inverse.
        n_refine = 2 if L <= 256 else (3 if L <= 1024 else 4)
        # At 2048^2 the preallocated flat (R, n) GCR direction stores
        # dominate HBM (outer R=32 store = 4 GiB; the level-1 inner
        # store gets lane-padded 4x by XLA layout on the loop carry =
        # another 4 GiB) and the solve program exceeds the 16 GB chip.
        # The actual trajectories never reach those depths (~10 outer
        # iters, inner tol 0.2 stops in <8), so right-size the stores.
        restart = 16 if L >= 2048 else 32
        inner_restart = 8 if L >= 2048 else 32
        outer_type = None
        schur_kw = {}
        if args.outer == "schur":
            # n19 configuration (reference tests/n19_wilson_kcycle_
            # precond/wilson_kcycle_precond.cpp:107,171,290): rbjacobi
            # null-vector generation + coarsening, RIGHT_SCHUR solves
            # at every level. The Schur system lives on the even
            # half-space, halving every coarse level's active
            # dimension - the measurement of interest at production
            # sizes, where the K-cycle is coarse-level latency-bound.
            from qmg_tpu.stencil import StencilType
            from qmg_tpu.operators.coarse import CoarseOperator2D
            outer_type = StencilType.RIGHT_SCHUR
            schur_kw = dict(
                fine_stencil_app=StencilType.RIGHT_SCHUR,
                coarsest_stencil_app=StencilType.RIGHT_SCHUR,
                nullvec_stype=StencilType.RIGHT_JACOBI,
                nullvec_solver="gcr_restart",
                precond_coarsen_rbjacobi=True,
                build_extra=CoarseOperator2D.BUILD_RBJACOBI)
        if args.deflate:
            # Deflation projects the NORMAL coarsest op's low modes
            # (reference stateful_multigrid.h:613-696): the coarsest
            # solve becomes CG on Mdag M, and direct is off (deflation
            # accelerates the iterative coarsest; the dense inverse
            # would make it moot).
            from qmg_tpu.stencil import StencilType as _ST
            schur_kw["coarsest_stencil_app"] = _ST.MDAGGER_M
        cfg = KCycleConfig(n_refine=n_refine, coarse_dof=8,
                           nullvec_tol=5e-4, nullvec_max_iter=200,
                           inner_restart_freq=inner_restart,
                           coarsest_restart_freq=restart,
                           coarsest_direct=(not args.no_direct
                                            and not args.deflate),
                           **schur_kw)
        mg = build_kcycle_hierarchy(lat, op, cfg, rng,
                                    structure_only=args.setup == "device")
        # Fine-Dslash routing (measured, PERF.md round 2): below 512^2
        # the whole solve is coarse-level latency-bound and the planes
        # layout conversions at the kernel boundary cost more than the
        # kernel saves - jnp wins (256^2: 64 ms jnp vs 108 ms kernel).
        # From 512^2 up the fine share is big enough for the rank-1
        # phase kernel to pay (512^2: 138 ms vs 151 ms jnp). The gather
        # coarse apply measured slower than jnp at 128^2-512^2; it
        # remains selectable via --coarse-apply.
        if args.kernel == "xla" or L < 512:
            use_pallas, kind = False, "matrix"
        elif lat.xh % 128 == 0 and lat.y_len % 8 == 0:
            use_pallas = True
            kind = {"split": "matrix-split", "pallas": "matrix",
                    "phase": "wilson-phase",
                    "phase-r1": "wilson-r1",
                    "phase-split": "wilson-r1"}.get(args.kernel, "matrix")
        elif lat.xh % 64 == 0 and lat.y_len % 2 == 0:
            use_pallas, kind = True, "small"
        else:
            use_pallas, kind = False, "matrix"
        if args.nrhs > 1:
            # Batched multi-RHS throughput mode (jnp fine apply; the
            # Pallas kernels are single-field).
            if args.calibrated:
                if args.fixed_schedule:
                    raise SystemExit("--calibrated picks its own outer "
                                     "trip count; drop --fixed-schedule")
                from qmg_tpu.tpu_compat import (
                    make_calibrated_batched_planes_solver)
                probe_b = host_to_planes(rng.gaussian_cv(lat))
                solve_planes, state, outer_cal = (
                    make_calibrated_batched_planes_solver(
                        mg, probe_b, tol=tol, max_iter=200,
                        restart_freq=restart,
                        coarse_apply=("jnp" if args.coarse_apply == "auto"
                                      else args.coarse_apply)))
                print(f"# calibrated fixed outer trips: {outer_cal}",
                      file=sys.stderr)
            elif args.fixed_schedule:
                from qmg_tpu.tpu_compat import (
                    make_fixed_batched_planes_solver)
                parts = [int(p) for p in args.fixed_schedule.split(",")]
                outer_it = parts[0]
                masked_inner = len(parts) == 1
                if not masked_inner:
                    # 'OUTER,INNER': trip-count every level.
                    for lvl in range(1, mg.get_num_levels() - 1):
                        ls = mg.get_level_solve(lvl)
                        ls.fixed_trips = True
                        ls.intermediate_iters = parts[1]
                # 'OUTER' alone: fixed outer + adaptive (masked) inner -
                # the measured-best batched configuration (PERF.md).
                solve_planes, state = make_fixed_batched_planes_solver(
                    mg, outer_iters=outer_it, tol=tol,
                    restart_freq=restart,
                    allow_masked_inner=masked_inner,
                    coarse_apply=("jnp" if args.coarse_apply == "auto"
                                  else args.coarse_apply))
            else:
                from qmg_tpu.tpu_compat import make_batched_planes_solver
                solve_planes, state = make_batched_planes_solver(
                    mg, tol=tol, max_iter=200, restart_freq=restart,
                    coarse_apply=("jnp" if args.coarse_apply == "auto"
                                  else args.coarse_apply))
            b_p = jnp.stack([host_to_planes(rng.gaussian_cv(lat))
                             for _ in range(args.nrhs)])
        else:
            solve_planes, state = make_planes_solver(
                mg, tol=tol, max_iter=200, restart_freq=restart,
                use_pallas_fine=use_pallas and outer_type is None,
                pallas_kind=kind, pallas_tile=args.tile,
                outer_type=outer_type,
                coarse_apply=("jnp" if args.coarse_apply == "auto"
                              else args.coarse_apply))
            b_p = host_to_planes(rng.gaussian_cv(lat))

    solve_jit = jax.jit(solve_planes)
    if args.deflate and args.setup != "device":
        # Silently ignoring the flag once produced a no-op deflation
        # measurement; refuse instead.
        raise SystemExit("--deflate requires --setup device (deflation "
                         "is computed inside the device-resident setup)")
    if args.setup == "device":
        # Device-resident setup: null-vector solves, block ortho, the
        # Galerkin coarse build and the dense coarsest inverse all jit
        # onto the accelerator; only gaussian seeds come from the host
        # rng stream (setup_planes.py).
        from qmg_tpu.setup_planes import (make_kcycle_setup_planes,
                                          gauss_seed_planes)
        cf = (L >= 2048 if args.channels_first == "auto"
              else args.channels_first == "on")
        setup_fn = make_kcycle_setup_planes(lat, cfg, -0.06,
                                            channels_first=cf,
                                            deflate_low=args.deflate)
        seeds = gauss_seed_planes(lat, cfg, rng)
        gauge_p = host_to_planes(np.asarray(gauge))
        t0 = time.perf_counter()
        state = setup_fn(gauge_p, *seeds)
        state = {k: (v.block_until_ready()
                     if hasattr(v, "block_until_ready") else v)
                 for k, v in state.items()}
        # axon's block_until_ready does not reliably sync; force one
        # scalar readback for honest timing.
        float(jnp.sum(jnp.abs(state[f"nvb{cfg.n_refine - 1}"])))
        t_setup = time.perf_counter() - t0
        # Warm setup: the per-configuration rebuild cost of an n16-style
        # measurement stream (compile cached, fresh seeds).
        seeds2 = gauss_seed_planes(lat, cfg, QMGRandom(7))
        t0 = time.perf_counter()
        state2 = setup_fn(gauge_p, *seeds2)
        float(jnp.sum(jnp.abs(state2[f"nvb{cfg.n_refine - 1}"])))
        t_setup2 = time.perf_counter() - t0
        print(f"# kcycle {L}x{L} device setup (incl. compile): "
              f"{t_setup:.1f} s; warm setup (per-config rebuild): "
              f"{t_setup2:.2f} s", file=sys.stderr)
        del state2
        state_dev = state
    else:
        state_dev = jax.device_put(state)
    b_dev = jax.device_put(b_p)
    xp, iters, res_sq = solve_jit(state_dev, b_dev)
    int(np.max(np.asarray(iters)))  # sync warmup
    t0 = time.perf_counter()
    xp, iters, res_sq = solve_jit(state_dev, b_dev)
    n_it = int(np.max(np.asarray(iters)))
    dt = time.perf_counter() - t0

    if args.nrhs > 1:
        sched = (f" fixed-schedule {args.fixed_schedule}"
                 if args.fixed_schedule else "")
        print(f"# wilson kcycle {L}x{L} c64 x{args.nrhs} rhs{sched}: "
              f"per-rhs iters {np.asarray(iters).tolist()} "
              f"(worst res_sq {float(np.max(np.asarray(res_sq))):.2e}, "
              f"target {tol}) in "
              f"{dt*1e3:.1f} ms total = {dt*1e3/args.nrhs:.1f} ms/rhs "
              f"on {jax.devices()[0].device_kind}", file=sys.stderr)
        if args.calibrated:
            # Calibration contract: every rhs meets the tolerance and
            # none overshoots it by more than a decade in residual norm
            # (res_sq is ||r||^2, target tol^2 * ||b||^2 per rhs).
            bsq = np.sum(np.abs(np.asarray(b_p)) ** 2,
                         axis=tuple(range(1, np.asarray(b_p).ndim)))
            rsq = np.asarray(res_sq, np.float64)
            rel = rsq / (tol ** 2 * bsq)
            assert np.max(rel) <= 1.0, (
                f"calibrated schedule MISSED tolerance: worst "
                f"rel res_sq {np.max(rel):.2f}x target")
            assert np.max(rel) >= 1e-2, (
                f"calibrated schedule overshoots >1 decade: best "
                f"rel res_sq {np.max(rel):.2e}x target")
            print(f"# calibrated: rel res_sq in "
                  f"[{np.min(rel):.3f}, {np.max(rel):.3f}] of target "
                  "(met, <=1 decade overshoot)", file=sys.stderr)
        if args.chain > 1:
            # Steady-state device cost: chain K solves inside one
            # program; the k=K minus k=1 marginal removes dispatch
            # overhead and pipeline fill.
            from jax import lax

            def chained(k):
                def run(state, b):
                    def body(_, carry):
                        b_cur, acc = carry
                        x, _, rsq = solve_planes(state, b_cur)
                        return b + jnp.float32(1e-3) * x, acc + jnp.sum(rsq)
                    _, acc = lax.fori_loop(
                        0, k, body, (b, jnp.float32(0.0)))
                    return acc
                return jax.jit(run)

            c1, ck = chained(1), chained(args.chain)
            float(np.asarray(c1(state_dev, b_dev)))
            float(np.asarray(ck(state_dev, b_dev)))  # warm both
            t0 = time.perf_counter()
            float(np.asarray(c1(state_dev, b_dev)))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(np.asarray(ck(state_dev, b_dev)))
            tk = time.perf_counter() - t0
            per_solve = (tk - t1) / (args.chain - 1)
            print(f"# steady-state (chain {args.chain}): "
                  f"{per_solve*1e3:.1f} ms/solve = "
                  f"{per_solve*1e3/args.nrhs:.2f} ms/rhs; per-dispatch "
                  f"overhead ~{(t1-per_solve)*1e3:.0f} ms",
                  file=sys.stderr)
            print(json.dumps({
                "metric": "wilson_kcycle_batched_steady_ms_per_rhs",
                "value": round(per_solve * 1e3 / args.nrhs, 2),
                "unit": "ms",
                "vs_baseline": args.nrhs,
            }))
            return
        print(json.dumps({
            "metric": "wilson_kcycle_batched_ms_per_rhs",
            "value": round(dt * 1e3 / args.nrhs, 2),
            "unit": "ms",
            "vs_baseline": args.nrhs,
        }))
        return
    print(f"# wilson kcycle {L}x{L} c64: {n_it} outer iters to {tol} in "
          f"{dt*1e3:.1f} ms ({dt*1e3/max(n_it,1):.1f} ms/iter), "
          f"res_sq={float(res_sq):.3e} on {jax.devices()[0].device_kind}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "wilson_kcycle_solve_time",
        "value": round(dt * 1e3, 2),
        "unit": "ms",
        "vs_baseline": round(dt * 1e3 / max(n_it, 1), 3),
    }))


def bench_refine(args):
    """The n13 fp64 contract on the TPU (VERDICT r2 item 2): c64 planes
    K-cycle inner solves + host-fp64 defect correction to TRUE relative
    residual 1e-10 (tpu_compat.make_refined_planes_solver). Reports
    total wall time; vs_baseline carries the outer (refinement) pass
    count."""
    import os
    import jax
    import jax.numpy as jnp
    from qmg_tpu.lattice import Lattice2D
    from qmg_tpu.operators import Wilson2D
    from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
    from qmg_tpu.tpu_compat import make_refined_planes_solver
    from qmg_tpu import u1
    from qmg_tpu.rng import QMGRandom

    L = args.size
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        path = ("/root/reference/tests/common_cfgs_u1/"
                f"l{L}t{L}b60_heatbath.dat")
        if os.path.exists(path):
            gauge = jnp.asarray(u1.read_gauge_u1(lat, path),
                                dtype=jnp.complex64)
        else:
            gauge = jnp.asarray(u1.gauss_gauge_u1(lat, rng, 6.0),
                                dtype=jnp.complex64)
        op = Wilson2D(lat, -0.06, gauge, dtype=jnp.complex64)
        n_refine = 2 if L <= 256 else (3 if L <= 1024 else 4)
        cfg = KCycleConfig(n_refine=n_refine, coarse_dof=8,
                           nullvec_tol=5e-4, nullvec_max_iter=200,
                           coarsest_direct=not args.no_direct)
        mg = build_kcycle_hierarchy(lat, op, cfg, rng)
        solve, state = make_refined_planes_solver(
            mg, tol=1e-10, inner_tol=1e-5, max_iter=200, restart_freq=32)
        b = np.asarray(rng.gaussian_cv(lat))

    state_dev = jax.device_put(state)
    res = solve(b, state=state_dev)  # warmup incl. compile
    t0 = time.perf_counter()
    res = solve(b, state=state_dev)
    dt = time.perf_counter() - t0
    print(f"# wilson refined {L}x{L}: {res.outer_iters} outer passes, "
          f"{res.inner_iters} inner iters, TRUE fp64 resid "
          f"{res.rel_resid:.3e} (target 1e-10, converged={res.converged}) "
          f"in {dt*1e3:.1f} ms on {jax.devices()[0].device_kind}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "wilson_refined_1e10_solve_time",
        "value": round(dt * 1e3, 2),
        "unit": "ms",
        "vs_baseline": res.outer_iters,
    }))


if __name__ == "__main__":
    main()
