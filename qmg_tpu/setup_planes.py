"""Device-resident (jittable) K-cycle setup.

The eager build (setup.build_kcycle_hierarchy) orchestrates null-vector
solves, transfer orthonormalization and the Galerkin coarse build on the
host backend. That is fine at reference sizes, but at large lattices the
setup dwarfs the solve (measured: a 1024^2 c64 setup exceeds 50 min of
eager CPU while the solve itself is ~0.3 s on the TPU), and on TPU
backends eager complex ops are unavailable altogether (axon rejects
complex at jit boundaries; tpu_compat.py).

Here the ENTIRE setup traces into one jittable function with f32-plane
boundaries: Wilson coefficient build from the gauge field, per-level
null-vector generation (lax.while_loop BiCGstab(l)/GCR on the level's
own operator), chiral doubling, transfer block orthonormalization,
distance-1 Galerkin coarse build, and the dense coarsest inverse -
emitting exactly the state dict that tpu_compat.make_planes_solver
consumes. Host-side randomness (the reference's mt19937 stream,
n13:64) stays on the host: gaussian seeds enter as inputs.

Reference flow being reproduced: tests/n13_wilson_kcycle/
wilson_kcycle.cpp:233-416 (setup phase), with the device/host split
being the TPU-native redesign.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .lattice import Lattice2D
from .linalg import orthogonal
from .stencil import StencilType
from .setup import KCycleConfig, chiral_double
from .stateful import StatefulMultigridMG, LevelSolveMG, CoarsestSolveMG
from .transfer import TransferMG, DoublingType
from .tpu_compat import to_planes, from_planes, host_to_planes
from . import solvers


def _level_lattices(lat0: Lattice2D, cfg: KCycleConfig):
    lats = [lat0]
    cur_x, cur_y = lat0.x_len, lat0.y_len
    for _ in range(cfg.n_refine):
        cur_x //= cfg.x_block
        cur_y //= cfg.y_block
        lats.append(Lattice2D(cur_x, cur_y, cfg.coarse_dof))
    return lats


def gauss_seed_planes(lat0: Lattice2D, cfg: KCycleConfig, rng):
    """Host-side gaussian seeds for the null-vector solves, one stacked
    (n_half, cv_shape) array per level, as f32 planes - drawn in the
    reference's order (per level, per vector)."""
    lats = _level_lattices(lat0, cfg)
    n_half = cfg.coarse_dof // 2
    out = []
    for i in range(1, cfg.n_refine + 1):
        g = np.stack([rng.gaussian_cv(lats[i - 1]) for _ in range(n_half)])
        out.append(host_to_planes(g))
    return out


def _direct_coarsest_dinv_traced(mg: StatefulMultigridMG, dtype):
    """Traced analog of StatefulMultigridMG.prepare_direct_coarsest:
    densify the coarsest operator by probing the full basis (lax.map)
    and invert on-device. Dead padding rows/cols (volume-1 parity slot)
    get identity so the inverse is well-defined."""
    cs = mg.coarsest_solve
    st = mg.get_stencil(mg.get_num_levels() - 1)
    matvec = st.get_apply_function(StencilType(cs.coarsest_stencil_app))
    shape = st.lat.cv_shape()
    n = int(np.prod(shape))
    basis = jnp.eye(n, dtype=dtype).reshape((n,) + tuple(shape))
    cols = jax.lax.map(lambda v: matvec(v).reshape(n), basis,
                       batch_size=min(n, 256))
    mat = cols.T
    dead = ((jnp.abs(mat).sum(axis=1) == 0)
            & (jnp.abs(mat).sum(axis=0) == 0))
    mat = mat + jnp.diag(dead.astype(mat.dtype))
    return jnp.linalg.inv(mat)


def make_kcycle_setup_planes(lat0: Lattice2D, cfg: KCycleConfig, mass,
                             w: float = 1.0, dtype=jnp.complex64,
                             per_level_jit: bool = True):
    """Returns ``setup_fn(gauge_planes, *gauss_planes) -> state`` -- the
    n13 setup running on-device, producing the make_planes_solver state
    dict.

    ``gauge_planes``: (2, 2, Y, Xh, 2) f32 planes of the U(1) links.
    ``gauss_planes``: one (n_half, cv_shape..., 2) f32 plane array per
    refinement level (gauss_seed_planes above).

    ``per_level_jit`` (default): setup_fn is a host-side driver calling
    one jitted stage per refinement level (plus one for the coarsest
    inverse); only f32 planes cross stage boundaries, intermediates stay
    on device. This keeps each XLA module small - the monolithic
    whole-setup jit (per_level_jit=False) crashed the remote TPU
    compiler at 1024^2 and costs ~9 min of compile at 512^2. With
    per_level_jit the returned setup_fn must NOT be wrapped in jax.jit.

    Pair it with a cheap *structure* hierarchy on the host
    (setup.build_kcycle_hierarchy(..., structure_only=True)) that gives
    make_planes_solver its static shape information; every complex array
    in that structure is replaced by this function's output at solve
    time.
    """
    if lat0.nc != 2:
        raise ValueError("make_kcycle_setup_planes builds the Wilson n13 "
                         f"flow; fine nc must be 2, got {lat0.nc}")
    lats = _level_lattices(lat0, cfg)
    if cfg.coarsest_direct:
        from .stencil import StencilType as _ST
        if _ST(cfg.coarsest_stencil_app) == _ST.RIGHT_SCHUR:
            raise ValueError(
                "coarsest_direct with a RIGHT_SCHUR coarsest app is not "
                "supported (the Schur apply acts on the even half; the "
                "dense inverse probes the full space) - use "
                "coarsest_direct=False for the n19 configuration")
        ncoarsest = int(np.prod(lats[-1].cv_shape()))
        if ncoarsest > 4096:
            raise ValueError(
                f"coarsest dimension {ncoarsest} too large for the "
                "device-resident direct inverse (densify probes the "
                "full basis; an 8 GB dense inverse at dim 32768 is "
                "infeasible) - use a deeper hierarchy (larger "
                "n_refine) or coarsest_direct=False")
    n_half = cfg.coarse_dof // 2
    from .operators.wilson import Wilson2D
    from .operators.coarse import CoarseOperator2D
    from .stencil import Stencil2D, make_coeffs, DefaultChirality
    from .multigrid import PRECOND_RIGHT_BLOCK_JACOBI, PRECOND_ORIGINAL

    def _solve_null_vectors(fine_st, gauss):
        """Reference n13:338-371 null-vector flow on one level."""
        matvec = fine_st.get_apply_function(StencilType(cfg.nullvec_stype))
        vecs = []
        for k in range(n_half):
            g = gauss[k]
            for v in vecs:
                g = orthogonal(g, v)
            rhs = -matvec(g)
            if cfg.nullvec_solver == "bicgstab_l":
                res = solvers.bicgstab_l(
                    matvec, rhs, max_iter=cfg.nullvec_max_iter,
                    tol=cfg.nullvec_tol)
            elif cfg.nullvec_solver == "gcr_restart":
                res = solvers.gcr_restart(
                    matvec, rhs, max_iter=cfg.nullvec_max_iter,
                    tol=cfg.nullvec_tol, restart_freq=64)
            else:
                raise ValueError(
                    f"unknown null-vector solver {cfg.nullvec_solver}")
            v = g + res.x
            for wv in vecs:
                v = orthogonal(v, wv)
            vecs.append(v)
        return vecs

    def _level_outputs(i, fine_st, gauss):
        """Null vectors + transfer + Galerkin coarse build for level i;
        returns (nvb_planes, coarse_clover_p, coarse_hopping_p,
        coarse_shifts_p)."""
        vecs = _solve_null_vectors(fine_st, gauss)
        raw = chiral_double(fine_st, jnp.stack(vecs))
        transfer = TransferMG(lats[i - 1], lats[i], raw,
                              do_block_ortho=True,
                              doubling=DoublingType.PROJECTION)
        coarse = CoarseOperator2D(
            lats[i], fine_st, transfer, is_chiral=True,
            use_rbjacobi=cfg.precond_coarsen_rbjacobi,
            build_extra=cfg.build_extra)
        cc = coarse.coeffs
        return (to_planes(transfer._nvb.astype(dtype)),
                to_planes(cc.clover.astype(dtype)),
                to_planes(cc.hopping.astype(dtype)),
                to_planes(jnp.stack([jnp.asarray(cc.shift, dtype),
                                     jnp.asarray(cc.eo_shift, dtype),
                                     jnp.asarray(cc.dof_shift, dtype)])))

    def _reconstruct_stencil(lvl, clover_p, hopping_p, shifts_p):
        """checkpoint.py's __new__ reconstruction: a CoarseOperator2D
        from its coefficient planes (chirality metadata is static)."""
        sh = from_planes(shifts_p)
        st = CoarseOperator2D.__new__(CoarseOperator2D)
        Stencil2D.__init__(st, make_coeffs(
            lats[lvl], clover=from_planes(clover_p).astype(dtype),
            hopping=from_planes(hopping_p).astype(dtype),
            shift=sh[0], eo_shift=sh[1], dof_shift=sh[2], dtype=dtype))
        st.is_chiral = True
        st.use_rbjacobi = cfg.precond_coarsen_rbjacobi
        st.in_transfer = None
        st._default_chirality = DefaultChirality.GAMMA_5
        st._sigma_1_L = None
        st._sigma_1_R = None
        return st

    if per_level_jit:
        def _level1_fn(gauge_planes, gauss_p):
            gauge = from_planes(gauge_planes).astype(dtype)
            op = Wilson2D(lat0, mass, gauge, wilson_coeff=w, dtype=dtype)
            gs = from_planes(gauss_p).astype(dtype)
            outs = _level_outputs(1, op, gs)
            return (to_planes(op.coeffs.clover.astype(dtype)),
                    to_planes(op.coeffs.hopping.astype(dtype))) + outs

        def _mk_level_fn(i):
            def _level_fn(clover_p, hopping_p, shifts_p, gauss_p):
                fine_st = _reconstruct_stencil(i - 1, clover_p, hopping_p,
                                               shifts_p)
                gs = from_planes(gauss_p).astype(dtype)
                return _level_outputs(i, fine_st, gs)
            return _level_fn

        def _cdinv_fn(clover_p, hopping_p, shifts_p):
            st = _reconstruct_stencil(cfg.n_refine, clover_p, hopping_p,
                                      shifts_p)
            cs_app = StencilType(cfg.coarsest_stencil_app)
            matvec = st.get_apply_function(cs_app)
            shape = lats[-1].cv_shape()
            n = int(np.prod(shape))
            basis = jnp.eye(n, dtype=dtype).reshape((n,) + tuple(shape))
            cols = jax.lax.map(lambda v: matvec(v).reshape(n), basis,
                               batch_size=min(n, 256))
            mat = cols.T
            dead = ((jnp.abs(mat).sum(axis=1) == 0)
                    & (jnp.abs(mat).sum(axis=0) == 0))
            mat = mat + jnp.diag(dead.astype(mat.dtype))
            return to_planes(jnp.linalg.inv(mat))

        level1_jit = jax.jit(_level1_fn)
        level_jits = [jax.jit(_mk_level_fn(i))
                      for i in range(2, cfg.n_refine + 1)]
        cdinv_jit = jax.jit(_cdinv_fn)

        def setup_fn(gauge_planes, *gauss_planes):
            if len(gauss_planes) != cfg.n_refine:
                raise ValueError(f"need {cfg.n_refine} gauss seed arrays, "
                                 f"got {len(gauss_planes)}")
            state = {}
            state["shifts0"] = host_to_planes(np.asarray(
                [complex(mass), 0j, 0j], np.complex64))
            (state["clover0"], state["hopping0"], state["nvb0"],
             state["clover1"], state["hopping1"],
             state["shifts1"]) = level1_jit(gauge_planes, gauss_planes[0])
            for i in range(2, cfg.n_refine + 1):
                (state[f"nvb{i - 1}"], state[f"clover{i}"],
                 state[f"hopping{i}"], state[f"shifts{i}"]) = \
                    level_jits[i - 2](
                        state[f"clover{i - 1}"], state[f"hopping{i - 1}"],
                        state[f"shifts{i - 1}"], gauss_planes[i - 1])
            if cfg.coarsest_direct:
                n = cfg.n_refine
                state["cdinv"] = cdinv_jit(
                    state[f"clover{n}"], state[f"hopping{n}"],
                    state[f"shifts{n}"])
            return state

        return setup_fn

    def setup_fn(gauge_planes, *gauss_planes):
        if len(gauss_planes) != cfg.n_refine:
            raise ValueError(f"need {cfg.n_refine} gauss seed arrays, "
                             f"got {len(gauss_planes)}")
        gauge = from_planes(gauge_planes).astype(dtype)
        op = Wilson2D(lat0, mass, gauge, wilson_coeff=w, dtype=dtype)
        coarsest = CoarsestSolveMG(
            coarsest_stencil_app=cfg.coarsest_stencil_app,
            coarsest_tol=cfg.coarsest_tol,
            coarsest_iters=cfg.coarsest_max_iter,
            coarsest_restart_freq=cfg.coarsest_restart_freq)
        mg = StatefulMultigridMG(lat0, op, coarsest)

        for i in range(1, cfg.n_refine + 1):
            st = mg.get_stencil(i - 1)
            matvec = st.get_apply_function(StencilType(cfg.nullvec_stype))
            gs = from_planes(gauss_planes[i - 1]).astype(dtype)
            vecs = []
            for k in range(n_half):
                g = gs[k]
                for v in vecs:
                    g = orthogonal(g, v)
                rhs = -matvec(g)
                if cfg.nullvec_solver == "bicgstab_l":
                    res = solvers.bicgstab_l(
                        matvec, rhs, max_iter=cfg.nullvec_max_iter,
                        tol=cfg.nullvec_tol)
                elif cfg.nullvec_solver == "gcr_restart":
                    res = solvers.gcr_restart(
                        matvec, rhs, max_iter=cfg.nullvec_max_iter,
                        tol=cfg.nullvec_tol, restart_freq=64)
                else:
                    raise ValueError(
                        f"unknown null-vector solver {cfg.nullvec_solver}")
                v = g + res.x
                for wv in vecs:
                    v = orthogonal(v, wv)
                vecs.append(v)
            raw = chiral_double(st, jnp.stack(vecs))
            transfer = TransferMG(lats[i - 1], lats[i], raw,
                                  do_block_ortho=True,
                                  doubling=DoublingType.PROJECTION)
            level_solve = LevelSolveMG(
                fine_stencil_app=cfg.fine_stencil_app,
                intermediate_tol=cfg.inner_tol,
                intermediate_iters=cfg.inner_max_iter,
                intermediate_restart_freq=cfg.inner_restart_freq,
                pre_tol=cfg.pre_smooth_tol, pre_iters=cfg.n_pre_smooth,
                post_tol=cfg.post_smooth_tol,
                post_iters=cfg.n_post_smooth)
            mg.push_level(
                lats[i], transfer, level_solve, build_stencil=True,
                is_chiral=True,
                build_stencil_from=(PRECOND_RIGHT_BLOCK_JACOBI
                                    if cfg.precond_coarsen_rbjacobi
                                    else PRECOND_ORIGINAL),
                build_extra=cfg.build_extra, nvecs=raw)

        state = {}
        for lvl in range(mg.get_num_levels()):
            c = mg.get_stencil(lvl).coeffs
            if c.clover is not None:
                state[f"clover{lvl}"] = to_planes(c.clover.astype(dtype))
            if c.hopping is not None:
                state[f"hopping{lvl}"] = to_planes(c.hopping.astype(dtype))
            state[f"shifts{lvl}"] = to_planes(jnp.stack(
                [jnp.asarray(c.shift, dtype),
                 jnp.asarray(c.eo_shift, dtype),
                 jnp.asarray(c.dof_shift, dtype)]))
        for lvl in range(mg.get_num_levels() - 1):
            state[f"nvb{lvl}"] = to_planes(
                mg.get_transfer(lvl)._nvb.astype(dtype))
        if cfg.coarsest_direct:
            state["cdinv"] = to_planes(
                _direct_coarsest_dinv_traced(mg, dtype))
        return state

    return setup_fn
