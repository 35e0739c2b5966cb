"""Real-plane boundaries for TPU execution.

The axon TPU backend computes complex64 fine *inside* a compiled
program, but cannot materialize complex device buffers at program
boundaries (eager c64 ops, c64 jit inputs/outputs, and c64 host
transfers all fail UNIMPLEMENTED). The adapter here keeps every jit
boundary real: complex arrays travel as float32 plane-pairs
(..., 2) = (real, imag) and are reassembled with lax.complex inside the
computation.

``to_planes`` / ``from_planes`` convert at the jit boundary;
``make_planes_solver`` below wraps the whole MG-preconditioned solve
this way.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["to_planes", "from_planes", "host_to_planes",
           "mg_state_planes", "make_planes_solver", "shard_planes_state"]


def to_planes(x):
    """Complex array -> real (..., 2) plane pair (f32 for c64)."""
    x = jnp.asarray(x)
    return jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1)


def host_to_planes(x, dtype=np.float32) -> np.ndarray:
    """NumPy version for preparing TPU inputs on host."""
    x = np.asarray(x)
    return np.stack([x.real, x.imag], axis=-1).astype(dtype)


def from_planes(p):
    """Real (..., 2) plane pair -> complex array."""
    return jax.lax.complex(p[..., 0], p[..., 1])


# ---------------------------------------------------------------------------
# Whole-solver wrapper: run the full MG-preconditioned solve on a TPU that
# only accepts real jit boundaries. All complex state (stencil coefficient
# pytrees at every level, blocked null vectors, deflation vectors) is
# plane-encoded once on host; one jitted function decodes and solves.
# ---------------------------------------------------------------------------

def mg_state_planes(mg, dtype=np.float32):
    """Extract every complex array of a StatefulMultigridMG hierarchy as a
    flat dict of ``dtype`` plane arrays (host numpy)."""
    state = {}
    for lvl in range(mg.get_num_levels()):
        st = mg.get_stencil(lvl)
        c = st.coeffs
        if c.clover is not None:
            state[f"clover{lvl}"] = host_to_planes(np.asarray(c.clover),
                                                   dtype)
        if c.hopping is not None:
            state[f"hopping{lvl}"] = host_to_planes(np.asarray(c.hopping),
                                                    dtype)
        state[f"shifts{lvl}"] = host_to_planes(np.asarray(
            [complex(c.shift), complex(c.eo_shift), complex(c.dof_shift)]),
            dtype)
    for lvl in range(mg.get_num_levels() - 1):
        t = mg.get_transfer(lvl)
        state[f"nvb{lvl}"] = host_to_planes(np.asarray(t._nvb), dtype)
    if mg.coarsest_dinv is not None:
        state["cdinv"] = host_to_planes(np.asarray(mg.coarsest_dinv), dtype)
    if mg.coarsest_evecs is not None:
        # Coarsest deflation state (reference stateful_multigrid.h:613-696)
        # rides the planes boundary so the TPU solve applies the same
        # initial-guess projection (:895-908) as the eager path.
        state["cevals"] = host_to_planes(np.asarray(mg.coarsest_evals),
                                         dtype)
        state["cevecs"] = host_to_planes(np.asarray(mg.coarsest_evecs),
                                         dtype)
    return state


def _derived_need(mg, outer_type):
    """Map level -> {"rbj", "fused"} for the derived coefficient sets the
    configured solve will apply (rbjacobi B^-1 / fused Schur composition).

    These are the EXPENSIVE derived builds (batched QR inverses, stencil-
    stencil composition); when the planes state ships them precomputed,
    each solve call skips re-deriving them from the traced coefficients.
    Measured (PERF.md round 5): the 512^2 n19 Schur solve spent 590 ms
    per CALL on this re-derivation vs an 11 ms/outer Krylov marginal.
    The cheap elementwise derived sets (dagger conjugations) stay lazy.
    """
    from .stencil import StencilType
    need = {}

    def add(lvl, t):
        t = StencilType(t)
        if t in (StencilType.RIGHT_JACOBI, StencilType.RBJ_DAGGER,
                 StencilType.RBJ_M_MDAGGER, StencilType.RBJ_MDAGGER_M):
            need.setdefault(lvl, set()).add("rbj")
        elif t == StencilType.RIGHT_SCHUR:
            need.setdefault(lvl, set()).update(("rbj", "fused"))

    n_levels = mg.get_num_levels()
    if outer_type is not None:
        add(0, outer_type)
    if hasattr(mg, "get_level_solve"):
        for lvl in range(n_levels - 1):
            add(lvl, mg.get_level_solve(lvl).fine_stencil_app)
        add(n_levels - 1, mg.coarsest_solve.coarsest_stencil_app)
    return need


def derived_state_planes(mg, outer_type=None, dtype=np.float32):
    """Planes dict of the precomputed derived sets ``_derived_need``
    selects: per level ``rbjcinv{lvl}`` ((clover+mass)^-1),
    ``rbjh{lvl}``/``rbjt{lvl}``/``rbjc{lvl}`` (rbjacobi hopping/twolink/
    corner) and ``schurf{lvl}`` (the 9 composed even-half Schur
    coefficient matrices, stacked). Built eagerly from the hierarchy's
    concrete coefficients — call at state-construction time (per
    configuration), NOT per solve."""
    state = {}
    for lvl, kinds in _derived_need(mg, outer_type).items():
        st = mg.get_stencil(lvl)
        rbj = st.build_rbjacobi_stencil()
        state[f"rbjcinv{lvl}"] = host_to_planes(np.asarray(rbj.cinv), dtype)
        for name, arr in (("rbjh", rbj.coeffs.hopping),
                          ("rbjt", rbj.coeffs.twolink),
                          ("rbjc", rbj.coeffs.corner)):
            if arr is not None:
                state[f"{name}{lvl}"] = host_to_planes(np.asarray(arr),
                                                       dtype)
        if ("fused" in kinds and rbj.coeffs.hopping is not None
                and st.lat.volume > 1):
            from .stencil import build_rbj_schur_fused
            fused = st._rbj_schur_fused
            if fused is None:
                fused = build_rbj_schur_fused(rbj)
            f9 = np.concatenate([np.asarray(fused.clover)[None],
                                 np.asarray(fused.twolink),
                                 np.asarray(fused.corner)])
            state[f"schurf{lvl}"] = host_to_planes(f9, dtype)
    return state


def _patch_hierarchy(mg, state):
    """Patch decoded complex arrays from a planes state dict into the
    hierarchy for tracing. Returns a token for _restore_hierarchy.

    Shifts ride the planes state too: a concrete scalar would make
    derived builds (rbjacobi QR etc.) evaluate eagerly at trace time and
    embed complex constants the axon backend cannot transfer. Shipped
    derived sets (rbjcinv/rbjh/rbjt/rbjc/schurf, see
    derived_state_planes) are decoded instead of re-derived.
    """
    n_levels = mg.get_num_levels()
    saved = []
    for lvl in range(n_levels):
        st = mg.get_stencil(lvl)
        saved.append((st, st.coeffs, st._dagger, st._rbjacobi,
                      st._rbj_dagger, st._rbj_schur_fused))
        kw = {}
        if f"clover{lvl}" in state:
            kw["clover"] = from_planes(state[f"clover{lvl}"])
        if f"hopping{lvl}" in state:
            kw["hopping"] = from_planes(state[f"hopping{lvl}"])
        sh = from_planes(state[f"shifts{lvl}"])
        st.coeffs = st.coeffs.replace(
            **kw, shift=sh[0], eo_shift=sh[1], dof_shift=sh[2])
        st.invalidate_derived()
        if f"rbjcinv{lvl}" in state:
            from .stencil import RBJacobiSet, SchurFused
            from . import linalg as _linalg
            cinv = from_planes(state[f"rbjcinv{lvl}"])
            zero = jnp.zeros((), cinv.dtype)
            kwr = dict(clover=_linalg.identity_like(cinv),
                       hopping=None, twolink=None, corner=None,
                       shift=zero, eo_shift=zero, dof_shift=zero)
            for name, key in (("hopping", f"rbjh{lvl}"),
                              ("twolink", f"rbjt{lvl}"),
                              ("corner", f"rbjc{lvl}")):
                if key in state:
                    kwr[name] = from_planes(state[key])
            st._rbjacobi = RBJacobiSet(
                coeffs=st.coeffs.replace(**kwr), cinv=cinv)
            if f"schurf{lvl}" in state:
                f9 = from_planes(state[f"schurf{lvl}"])
                st._rbj_schur_fused = SchurFused(
                    clover=f9[0], twolink=f9[1:5], corner=f9[5:9])
    saved_nvb = []
    for lvl in range(n_levels - 1):
        t = mg.get_transfer(lvl)
        saved_nvb.append((t, t._nvb))
        t._nvb = from_planes(state[f"nvb{lvl}"])
    saved_dinv = mg.coarsest_dinv
    if "cdinv" in state:
        mg.coarsest_dinv = from_planes(state["cdinv"])
    saved_defl = (mg.coarsest_evals, mg.coarsest_evecs)
    if "cevecs" in state:
        mg.coarsest_evals = from_planes(state["cevals"])
        mg.coarsest_evecs = from_planes(state["cevecs"])
    return (saved, saved_nvb, saved_dinv, saved_defl)


def _restore_hierarchy(mg, token):
    saved, saved_nvb, saved_dinv, saved_defl = token
    for (st, coeffs, dag, rbj, rbjd, rbjsf) in saved:
        st.coeffs = coeffs
        st._dagger, st._rbjacobi, st._rbj_dagger = dag, rbj, rbjd
        st._rbj_schur_fused = rbjsf
        st.apply_override = None
    for (t, nvb) in saved_nvb:
        t._nvb = nvb
    mg.coarsest_dinv = saved_dinv
    mg.coarsest_evals, mg.coarsest_evecs = saved_defl


def _planes_component_chain(mg, state, b_planes, component, K):
    """Trace a K-long dependent chain of ONE solve component on the
    decoded planes state - the profiling primitive behind
    scripts/probe_2048_attrib.py (marginal K-vs-2K timing isolates the
    component from the state decode).

    Components: 'fine' (level-0 ORIGINAL apply), 'transfer'
    (restrict->prolong roundtrip through level 1), 'smooth2' (2-iter
    MinRes smoother on the fine operator), 'precond' (one full K-cycle
    call). Returns a scalar depending on every chain step.
    """
    from jax import lax
    from .stencil import apply_M as _apply_M
    from . import solvers as _solvers

    token = _patch_hierarchy(mg, state)
    try:
        import contextlib
        with contextlib.ExitStack() as stack:
            stack.enter_context(jax.default_matmul_precision("highest"))
            v0 = from_planes(b_planes)
            fine_coeffs = mg.get_stencil(0).coeffs

            if component == "fine":
                def body(_, v):
                    out = _apply_M(fine_coeffs, v)
                    return out / jnp.sqrt(norm2sq_c(out) + 1.0)
            elif component == "transfer":
                def body(_, v):
                    vc = mg.restrict_f2c(v, 0)
                    out = mg.prolong_c2f(vc, 0)
                    return out / jnp.sqrt(norm2sq_c(out) + 1.0)
            elif component == "smooth2":
                def body(_, v):
                    res = _solvers.minres(
                        lambda u: _apply_M(fine_coeffs, u), v,
                        max_iter=2, tol=0.0, omega=0.85)
                    return res.x / jnp.sqrt(norm2sq_c(res.x) + 1.0)
            elif component == "precond":
                precond = mg.make_preconditioner(0)
                n_levels = mg.get_num_levels()
                carry0 = {"counts": jnp.zeros((n_levels, 4), jnp.int32),
                          "iters": jnp.zeros((n_levels,), jnp.int32)}

                def body(_, v):
                    z, _c = precond(v, carry0)
                    return z / jnp.sqrt(norm2sq_c(z) + 1.0)
            else:
                raise ValueError(f"unknown component {component!r}")

            out = lax.fori_loop(0, K, body, v0)
            return jnp.sum(jnp.abs(out)).astype(jnp.float32)
    finally:
        _restore_hierarchy(mg, token)


def norm2sq_c(v):
    return jnp.real(jnp.vdot(v, v))


def make_planes_solver(mg, tol=1e-8, max_iter=400, restart_freq=32,
                       use_pallas_fine: bool = False, pallas_tile: int = 16,
                       pallas_interpret: bool = False,
                       pallas_coeff_dtype=None,
                       pallas_kind: str = "matrix",
                       coarse_apply: str = "jnp",
                       outer_type=None,
                       mesh=None,
                       fixed_outer_iters=None,
                       precond_mode: str = "mg"):
    """Returns (solve_planes, state) where solve_planes(state, b_planes)
    -> (x_planes, iters, res_sq) is fully real at the jit boundary.

    The hierarchy's complex state is swapped in from the plane encoding at
    trace time (one decode pass per solve - negligible vs the Krylov
    work), so the same StatefulMultigridMG drives CPU fp64 and TPU c64.
    ``outer_type`` selects the outer operator (e.g. RIGHT_SCHUR for the
    n19 configuration); prepare_M/reconstruct_M run inside the jit, so
    callers still pass the plain rhs planes and get full-space x planes.
    On the TPU backend, wrap the returned function in ``jax.jit`` -
    complex64 is only supported inside jit, so eager execution fails
    with an opaque UNIMPLEMENTED error.

    ``use_pallas_fine`` routes the fine level's ORIGINAL apply (the hot
    Dslash inside the outer FGCR and the level-0 smoothers) through the
    fused Pallas kernel; kernel channel planes are computed once per
    solve, and per-apply layout conversions fuse into neighboring ops.
    ``pallas_kind`` options: "matrix" (interleaved windowed kernel),
    "matrix-split" (row-parity-split windowed kernel - pure-roll pulls),
    "small" (VMEM-resident split kernel, covers Xh = 64),
    "wilson-phase" (phase-streaming Wilson specialization),
    "wilson-r1" (phase-streaming with the w=1 rank-1 projector
    factorization - fastest fine-level kernel, pallas_wilson.py).

    ``coarse_apply`` selects the COARSE levels' ORIGINAL apply
    formulation - the K-cycle at production sizes is coarse-level
    latency-bound (PERF.md):
      * "jnp": the stacked-einsum apply (default);
      * "gather": static-neighbor-table gather + one einsum (~4 ops
        per apply instead of ~10, stencil.build_gather_apply);
      * "small": the VMEM-resident Pallas kernel where operands fit
        (lane padding limits it to ~16^2 at nc=8).
    Levels whose shapes don't qualify silently keep the jnp apply.

    ``mesh`` (a 2D ("y", "x") jax Mesh) makes the whole solve
    multi-chip: the fine level's Dslash runs through the explicit
    shard_map + ppermute halo exchange (qmg_tpu.shard_dslash) and the
    caller places the fine-level state/rhs planes on the mesh
    (shard_planes_state below); coarse levels replicate, Krylov
    reductions become all-reduces under SPMD. Combine with
    ``use_pallas_fine`` + ``pallas_kind='wilson-r1'`` to run the fused
    rank-1 phase kernel per shard with ppermute y-halo exchange
    (shard_dslash.make_sharded_pallas_wilson; needs an x-unsharded
    (ny, 1) mesh); other kernel kinds remain single-chip-only.
    """
    from . import solvers
    from .stencil import StencilType

    if precond_mode not in ("mg", "none"):
        raise ValueError(f"unknown precond_mode {precond_mode!r} "
                         "(expected 'mg' or 'none')")
    state = mg_state_planes(mg)
    _need = _derived_need(mg, outer_type)
    if _need:
        # Ship the expensive derived sets (rbjacobi QR inverses, fused
        # Schur composition) in the state, built ONCE here instead of
        # re-derived from traced coefficients inside every solve call
        # (measured 590 ms/call at 512^2 Schur, PERF.md round 5).
        state.update(derived_state_planes(mg, outer_type))
    n_levels = mg.get_num_levels()
    sharded_pallas = False
    if mesh is not None:
        if use_pallas_fine:
            if pallas_kind != "wilson-r1":
                raise ValueError(
                    "mesh + use_pallas_fine requires pallas_kind="
                    "'wilson-r1' (the sharded fused kernel, "
                    "shard_dslash.make_sharded_pallas_wilson); other "
                    "kernels are single-chip")
            sharded_pallas = True
        from . import parallel
        parallel.validate_mg_sharding(mg, mesh)

    if pallas_coeff_dtype is not None and not use_pallas_fine:
        raise ValueError("pallas_coeff_dtype requires use_pallas_fine=True "
                         "(reduced-precision coefficients only exist on the "
                         "Pallas kernel path)")
    pallas_apply = None
    wilson_w = 1.0
    if sharded_pallas:
        lat0 = mg.get_lattice(0)
        if lat0.nc != 2:
            raise ValueError("pallas_kind='wilson-r1' needs the fine "
                             "operator to be Wilson (nc=2)")
        wilson_w = float(getattr(mg.get_stencil(0), "wilson_coeff", 1.0))
        sharded_mass = float(np.real(np.asarray(
            mg.get_stencil(0).coeffs.shift)))
    elif use_pallas_fine:
        lat0 = mg.get_lattice(0)
        if pallas_kind in ("wilson-phase", "wilson-r1"):
            # Wilson-specialized phase-streaming kernel (pallas_wilson.py):
            # the spin projectors are compile-time constants; only the 4
            # U(1) phases stream, derived from the hopping matrices at
            # trace time.
            if pallas_coeff_dtype is not None:
                raise ValueError("pallas_coeff_dtype applies to the "
                                 "matrix kernel (pallas_kind='matrix')")
            if lat0.nc != 2:
                raise ValueError("pallas_kind='wilson-phase' needs the "
                                 "fine operator to be Wilson (nc=2)")
            from .pallas_wilson import (
                make_pallas_wilson_shaped, make_pallas_wilson_rank1_shaped)
            wilson_w = float(getattr(mg.get_stencil(0), "wilson_coeff",
                                     1.0))
            mass0 = float(np.real(np.asarray(
                mg.get_stencil(0).coeffs.shift)))
            mk = (make_pallas_wilson_rank1_shaped
                  if pallas_kind == "wilson-r1"
                  else make_pallas_wilson_shaped)
            pallas_apply = mk(
                lat0.y_len, lat0.xh, wilson_w, mass0, tile=pallas_tile,
                interpret=pallas_interpret)
        elif pallas_kind == "matrix":
            from .pallas_dslash import make_pallas_dslash_shaped
            pallas_apply = make_pallas_dslash_shaped(
                lat0.nc, lat0.y_len, lat0.xh, tile=pallas_tile,
                interpret=pallas_interpret,
                coeff_dtype=pallas_coeff_dtype or jnp.float32)
        elif pallas_kind == "matrix-split":
            from .pallas_dslash import make_pallas_dslash_split_shaped
            pallas_apply = make_pallas_dslash_split_shaped(
                lat0.nc, lat0.y_len, lat0.xh, tile=pallas_tile,
                interpret=pallas_interpret,
                coeff_dtype=pallas_coeff_dtype or jnp.float32)
        elif pallas_kind == "small":
            from .pallas_dslash import make_pallas_dslash_small_shaped
            pallas_apply = make_pallas_dslash_small_shaped(
                lat0.nc, lat0.y_len, lat0.xh, interpret=pallas_interpret,
                coeff_dtype=pallas_coeff_dtype or jnp.float32)
        else:
            raise ValueError(f"unknown pallas_kind {pallas_kind!r}")

    def solve_planes(state, b_planes):
        # TPU matmuls default to reduced-precision bf16 passes, which
        # silently costs ~3 digits through the rbjacobi QR / B^-1 chains
        # (measured: true residual 9e-3 vs 2.6e-6 at identical speed -
        # the K-cycle is latency-bound, not matmul-bound). Pin full f32.
        import contextlib
        prec = jax.default_matmul_precision("highest")
        with contextlib.ExitStack() as _stack:
            _stack.enter_context(prec)
            # Mesh-sharded solves must keep geometric carries: the
            # solvers' flat-carry layout fix (solvers.flat_carries)
            # collapses fields to (n,), which the SPMD partitioner
            # cannot shard (it would all-gather every carry).
            _stack.enter_context(solvers.flat_carries(mesh is None))
            return _solve_impl(state, b_planes)

    def _solve_impl(state, b_planes):
        token = _patch_hierarchy(mg, state)
        try:
            b = from_planes(b_planes)
            fine_st = mg.get_stencil(0)
            from .stencil import apply_M as _apply_M
            fine_coeffs = fine_st.coeffs
            otype = (StencilType.ORIGINAL if outer_type is None
                     else StencilType(outer_type))
            # Build every derived set (dagger/rbjacobi/fused Schur) the
            # configured solve needs at the TOP trace level. With traced
            # coefficients, a lazy build first triggered inside a Krylov
            # while_loop body would be re-executed every iteration -
            # measured as the n19 Schur 512^2 solve costing ~9x the
            # standard one per outer (PERF.md round 5).
            if hasattr(mg, "prebuild_derived_stencils"):
                mg.prebuild_derived_stencils(otype)
            if otype == StencilType.ORIGINAL:
                # The OUTER matvec stays exact (bypasses any kernel
                # override): a reduced-precision fine apply is only
                # legitimate inside the preconditioner, where flexible
                # GCR absorbs the error.
                matvec = lambda v: _apply_M(fine_coeffs, v)
            else:
                matvec = lambda v: fine_st.apply_M(v, otype)
            if sharded_pallas:
                from .shard_dslash import make_sharded_pallas_wilson
                fine_st.apply_override = make_sharded_pallas_wilson(
                    fine_st.coeffs, mesh, mass=sharded_mass, w=wilson_w,
                    tile=pallas_tile, interpret=pallas_interpret)
            elif mesh is not None:
                from .shard_dslash import make_sharded_dslash
                fine_st.apply_override = make_sharded_dslash(
                    fine_st.coeffs, mesh)
            elif pallas_apply is not None and pallas_kind in (
                    "wilson-phase", "wilson-r1"):
                from .pallas_dslash import x_to_planes, x_from_planes
                u_half = (-fine_st.coeffs.hopping[..., 0, 0]
                          .astype(jnp.complex64) / wilson_w)
                ph = jnp.stack([jnp.real(u_half), jnp.imag(u_half)],
                               axis=2)
                fine_st.apply_override = (
                    lambda v: x_from_planes(pallas_apply(
                        ph, x_to_planes(v))).astype(v.dtype))
            elif pallas_apply is not None and pallas_kind in (
                    "matrix-split", "small"):
                from .pallas_dslash import (_channels_from_coeffs_split,
                                            x_to_planes_split,
                                            x_from_planes_split)
                ck, hk = _channels_from_coeffs_split(fine_st.coeffs)
                if pallas_coeff_dtype is not None:
                    ck = ck.astype(pallas_coeff_dtype)
                    hk = hk.astype(pallas_coeff_dtype)
                fine_st.apply_override = (
                    lambda v: x_from_planes_split(pallas_apply(
                        ck, hk, x_to_planes_split(v))).astype(v.dtype))
            elif pallas_apply is not None:
                from .pallas_dslash import (_channels_from_coeffs,
                                            x_to_planes, x_from_planes)
                # Channel planes computed once per solve (traced outside
                # the Krylov loops, so XLA hoists them).
                ck, hk = _channels_from_coeffs(fine_st.coeffs)
                if pallas_coeff_dtype is not None:
                    ck = ck.astype(pallas_coeff_dtype)
                    hk = hk.astype(pallas_coeff_dtype)
                fine_st.apply_override = (
                    lambda v: x_from_planes(pallas_apply(
                        ck, hk, x_to_planes(v))).astype(v.dtype))
            if coarse_apply == "gather":
                from .stencil import build_gather_apply
                for lvl in range(1, n_levels):
                    st_l = mg.get_stencil(lvl)
                    st_l.apply_override = build_gather_apply(st_l.coeffs)
            elif coarse_apply == "small":
                from .pallas_dslash import (
                    make_pallas_dslash_small_shaped,
                    _channels_from_coeffs_split, x_to_planes_split,
                    x_from_planes_split)
                for lvl in range(1, n_levels):
                    st_l = mg.get_stencil(lvl)
                    lat_l = st_l.lat
                    if st_l.coeffs.hopping is None or lat_l.volume <= 1:
                        continue
                    try:
                        fn = make_pallas_dslash_small_shaped(
                            lat_l.nc, lat_l.y_len, lat_l.xh,
                            interpret=pallas_interpret)
                    except ValueError:
                        continue  # odd Y / too big: keep the jnp apply
                    ckl, hkl = _channels_from_coeffs_split(st_l.coeffs)
                    st_l.apply_override = (
                        lambda v, fn=fn, ckl=ckl, hkl=hkl:
                        x_from_planes_split(fn(
                            ckl, hkl, x_to_planes_split(v))).astype(
                                v.dtype))
            elif coarse_apply != "jnp":
                raise ValueError(f"unknown coarse_apply {coarse_apply!r}")
            # precond_mode="none" replaces the K-cycle with the identity
            # (plain restarted GCR on the fine operator). Diagnostic knob
            # for the batched-regression isolation probes (PERF.md): it
            # separates the outer FGCR direction-store composition from
            # the preconditioner's inner loops under vmap.
            if precond_mode == "none":
                precond = lambda r, carry: (r, carry)
            else:
                precond = mg.make_preconditioner(0)
            carry = {"counts": jnp.zeros((n_levels, 4), jnp.int32),
                     "iters": jnp.zeros((n_levels,), jnp.int32)}
            rhs = (b if otype == StencilType.ORIGINAL
                   else fine_st.prepare_M(b, otype))
            if fixed_outer_iters:
                # Fixed-schedule outer: exactly fixed_outer_iters FGCR
                # trips, predicate on the trip counter only (vmap
                # batches with no masking; see make_batched_planes_
                # solver). tol still sets the reported res_sq target.
                res, carry = solvers.gcr_var_precond_restart(
                    matvec, rhs, precond, max_iter=int(fixed_outer_iters),
                    tol=tol, restart_freq=restart_freq,
                    precond_carry=carry, fixed_trips=True)
            else:
                res, carry = solvers.gcr_var_precond_restart(
                    matvec, rhs, precond, max_iter=max_iter, tol=tol,
                    restart_freq=restart_freq, precond_carry=carry)
            x = (res.x if otype == StencilType.ORIGINAL
                 else fine_st.reconstruct_M(res.x, b, otype))
            return (to_planes(x), res.iters,
                    jnp.real(res.res_sq).astype(jnp.float32))
        finally:
            _restore_hierarchy(mg, token)

    return solve_planes, state


def make_batched_planes_solver(mg, **solver_kw):
    """Multi-RHS (batched) planes solver: ``solve(state, B_planes)``
    with ``B_planes`` carrying a leading rhs axis ``(nrhs, *cv, 2)``;
    returns per-rhs ``(x_planes, iters, res_sq)`` stacked on the same
    axis.

    TPU-first throughput mode with NO reference counterpart: the
    reference streams one propagator solve per source per config
    (tests/n15_wilson_goldstone/wilson_goldstone.cpp source loop); here
    the whole MG K-cycle is ``jax.vmap``-ed over the rhs axis, so every
    level's matvecs/einsums gain a batch dimension (MXU-friendly,
    amortizing the coarse-level dispatch latency that dominates small
    lattices) and ONE device program solves all sources. Per-rhs
    semantics are exact: XLA's while_loop batching masks carry updates
    per lane, so each rhs follows its own trajectory, stops at its own
    iteration count, and keeps its converged solution frozen while
    other lanes finish (wall time = slowest rhs).

    ``solver_kw`` forwards to make_planes_solver. Kernel routing note:
    the Pallas fine kernels are written for single-field shapes; use
    the default jnp fine apply (``use_pallas_fine=False``) under vmap.
    """
    if solver_kw.get("use_pallas_fine"):
        raise ValueError("batched solves use the jnp fine apply; the "
                         "Pallas kernels are single-field (vmap would "
                         "fall back to slow per-lane dispatch)")
    solve_planes, state = make_planes_solver(mg, **solver_kw)
    return jax.vmap(solve_planes, in_axes=(None, 0)), state


def make_fixed_batched_planes_solver(mg, outer_iters: int,
                                     allow_masked_inner: bool = False,
                                     **solver_kw):
    """Fixed-schedule batched multi-RHS solver: like
    make_batched_planes_solver, but the OUTER FGCR runs exactly
    ``outer_iters`` trips - removing the outer while_loop's per-lane
    masking over the (R, n) direction-store carries. NOTE on measured
    value: under properly-synced timing (PERF.md "Batched steady-state
    numbers RETRACTED"), neither this mode nor the masked one has yet
    beaten sequential per-rhs dispatches on the TPU at 256^2/nrhs 8;
    the regression is isolated to the batched solver composition and
    remains a round-5 perf item. The per-lane-exact semantics and the
    single-dispatch amortization (one program for all sources) stand.

    By default the INNER schedule must also be trip-counted (build the
    hierarchy with KCycleConfig(inner_fixed_iters=...) and a direct
    coarsest) - then NO loop anywhere has a data-dependent predicate.
    ``allow_masked_inner=True`` keeps the adaptive (tolerance-stopping)
    inner K-cycle loops instead: their masked carries are small
    coarse-level fields, measured cheap under vmap, and the adaptive
    inner typically does LESS work than a conservatively calibrated
    fixed inner count.

    Calibrate ``outer_iters`` from one adaptive solve (the returned
    res_sq reports the achieved residual so under-shooting is visible).
    """
    if not allow_masked_inner:
        if not (mg.coarsest_solve.direct and mg.coarsest_dinv is not None):
            raise ValueError(
                "fixed-schedule batched solves need a direct coarsest "
                "(prepare_direct_coarsest / KCycleConfig("
                "coarsest_direct=True)): the iterative coarsest keeps a "
                "tolerance loop that re-introduces per-lane masking; or "
                "pass allow_masked_inner=True")
        for lvl in range(1, mg.get_num_levels() - 1):
            if not mg.get_level_solve(lvl).fixed_trips:
                raise ValueError(
                    f"level-{lvl} intermediate solve is not fixed_trips "
                    "- build the hierarchy with KCycleConfig("
                    "inner_fixed_iters=k), or pass "
                    "allow_masked_inner=True")
    solve_planes, state = make_planes_solver(
        mg, fixed_outer_iters=int(outer_iters), **solver_kw)
    return jax.vmap(solve_planes, in_axes=(None, 0)), state


def make_calibrated_batched_planes_solver(mg, probe_b_planes, margin: int = 1,
                                          **solver_kw):
    """Fixed-outer batched solver auto-calibrated by ONE masked probe
    solve (VERDICT r4 item 4).

    Runs the single-rhs masked (adaptive) solver once on
    ``probe_b_planes`` - a representative rhs in planes layout - reads
    its outer iteration count, and builds the fixed-outer batched
    solver at ``iters + margin`` trips with the adaptive masked inner
    (the measured-best fixed configuration; the flexible-GCR tolerance
    contract keeps the reported res_sq honest, quantum-linalg
    minv_vector_gcr_var_precond / reference stateful_multigrid.h:916).

    Returns ``(solve, state, outer_iters)``. Callers should check the
    returned per-rhs res_sq against the tolerance: statistically a
    same-distribution rhs converges within +-1 outer of the probe, so
    margin=1 meets the target without the >1-decade overshoot a
    guessed schedule produces (PERF.md round 4, "12,4 OVERSHOOTS").
    """
    import numpy as _np
    probe_solve, _ = make_planes_solver(mg, **solver_kw)
    state = None  # reuse the state from the fixed build below
    _, iters, _ = jax.jit(probe_solve)(mg_state_planes(mg), probe_b_planes)
    outer = int(_np.asarray(jax.device_get(iters))) + int(margin)
    solve, state = make_fixed_batched_planes_solver(
        mg, outer, allow_masked_inner=True, **solver_kw)
    return solve, state, outer


def make_refined_planes_solver(mg, tol: float = 1e-10,
                               inner_tol: float = 1e-5,
                               max_iter: int = 400, restart_freq: int = 32,
                               max_outer: int = 12, **solver_kw):
    """The reference's fp64 1e-10 contract on a c64-only TPU.

    Wraps ``make_planes_solver`` (the c64 MG K-cycle) as the correction
    step of a host-fp64 defect-correction loop (refine.py): the TRUE
    residual is accumulated in complex128 NumPy against the fine
    operator's fp64 coefficients, the device solves the correction
    equation in c64 to ``inner_tol``, and the loop repeats until the
    fp64 relative residual clears ``tol`` - the n13 outer contract
    (tests/n13_wilson_kcycle/wilson_kcycle.cpp:104-106) that a bare c64
    solve cannot reach.

    Returns ``(solve, state)``; ``solve(b[, state=...]) -> RefineResult``
    with a NumPy complex128 solution. ``solver_kw`` forwards to
    make_planes_solver (kernel routing, outer_type, mesh); with a mesh,
    pass the shard-placed state explicitly per call.
    """
    from .refine import HostStencil, refine_solve

    host_op = HostStencil(mg.get_stencil(0))
    solve_planes, state = make_planes_solver(
        mg, tol=inner_tol, max_iter=max_iter, restart_freq=restart_freq,
        **solver_kw)
    jitted = jax.jit(solve_planes)

    def solve(b, state=state, tol=tol, max_outer=max_outer):
        def inner(r):
            r_p = host_to_planes(np.asarray(r, np.complex64))
            x_p, iters, _ = jitted(state, r_p)
            xp = np.asarray(jax.device_get(x_p))
            return xp[..., 0] + 1j * xp[..., 1], int(iters)

        return refine_solve(host_op, inner, b, tol=tol,
                            max_outer=max_outer)

    return solve, state


def shard_planes_state(state, mesh, b_planes=None):
    """Place a planes-solver state dict (mg_state_planes layout) on a
    2D ("y", "x") mesh: fine-level (level 0) clover/hopping planes and
    the rhs shard over the lattice axes, everything else replicates.

    Plane layouts: clover planes (2, Y, Xh, nc, nc, 2), hopping planes
    (4, 2, Y, Xh, nc, nc, 2), field planes (2, Y, Xh, nc, 2).

    Returns the placed state (and the placed rhs when ``b_planes`` is
    given).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    placed = {}
    for k, v in state.items():
        if k == "clover0":
            placed[k] = put(v, P(None, "y", "x", None, None, None))
        elif k == "hopping0":
            placed[k] = put(v, P(None, None, "y", "x", None, None, None))
        else:
            placed[k] = put(v, P())
    if b_planes is None:
        return placed
    b_placed = put(b_planes, P(None, "y", "x", None, None))
    return placed, b_placed
