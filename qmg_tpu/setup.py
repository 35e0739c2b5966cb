"""MG setup: null-vector generation and hierarchy construction.

The reference's setup phase lives in its test mains (the de-facto user
API); this module packages the same flows:

  * ``generate_null_vectors``: gaussian -> orthogonalize -> residual-
    equation solve with BiCGstab(l) -> re-orthogonalize
    (reference tests/n13_wilson_kcycle/wilson_kcycle.cpp:338-371).
  * ``chiral_double``: split each vector into +-chirality halves and
    normalize (reference :375-384).
  * ``build_kcycle_hierarchy``: the full n13 ladder - per refinement
    level, generate vectors on the current coarsest stencil, double,
    build a TransferMG, and push a built Galerkin level with solve config.
"""

from __future__ import annotations

import dataclasses
import jax.numpy as jnp

from .lattice import Lattice2D
from .stencil import Stencil2D, StencilType
from .transfer import TransferMG, DoublingType
from .stateful import (StatefulMultigridMG, LevelSolveMG, CoarsestSolveMG,
                       DSLASH_NULLVEC)
from . import solvers
from .linalg import normalize, orthogonal


def generate_null_vectors(stencil: Stencil2D, n_vec: int, rng,
                          max_iter: int = 500, tol: float = 5e-5,
                          l: int = 6,
                          stype: StencilType = StencilType.ORIGINAL,
                          solver: str = "bicgstab_l"):
    """Algebraic near-null vectors via the residual equation.

    For each vector: gaussian guess g, orthogonalize against previous,
    solve M e = -M g with BiCGstab(l) (or restarted GCR, the n19 variant,
    reference n19:237), return v = g + e (so M v ~ 0), re-orthogonalize
    (reference n13:338-371). Returns (vectors (n_vec, cv_shape),
    total_ops) - ops feed the NULLVEC tracker.
    """
    lat = stencil.lat
    matvec = stencil.get_apply_function(stype)
    vecs = []
    total_ops = 0
    for _ in range(n_vec):
        g = jnp.asarray(rng.gaussian_cv(lat))
        for v in vecs:
            g = orthogonal(g, v)
        rhs = -matvec(g)
        total_ops += 1
        if solver == "bicgstab_l":
            res = solvers.bicgstab_l(matvec, rhs, max_iter=max_iter,
                                     tol=tol, l=l)
        elif solver == "gcr_restart":
            res = solvers.gcr_restart(matvec, rhs, max_iter=max_iter,
                                      tol=tol, restart_freq=64)
        else:
            raise ValueError(f"unknown null-vector solver {solver}")
        total_ops += int(res.ops_count)
        v = g + res.x
        for w in vecs:
            v = orthogonal(v, w)
        vecs.append(v)
    return jnp.stack(vecs), total_ops


def chiral_double(stencil: Stencil2D, vectors):
    """Chiral doubling: n vectors -> 2n, ups first then downs, normalized
    (reference n13:375-384)."""
    ups, downs = [], []
    for i in range(vectors.shape[0]):
        up, down = stencil.chiral_projection_both(vectors[i])
        ups.append(normalize(up))
        downs.append(normalize(down))
    return jnp.stack(ups + downs)


@dataclasses.dataclass
class KCycleConfig:
    """The n13 parameter block (reference n13:86-122)."""
    x_block: int = 4
    y_block: int = 4
    coarse_dof: int = 8          # after doubling
    n_refine: int = 2
    # outer solve
    tol: float = 1e-10
    max_iter: int = 1000
    restart_freq: int = 32
    # intermediate (K-cycle Krylov)
    inner_tol: float = 0.2
    inner_max_iter: int = 1000
    inner_restart_freq: int = 32
    # smoothers
    n_pre_smooth: int = 2
    pre_smooth_tol: float = 1e-15
    n_post_smooth: int = 2
    post_smooth_tol: float = 1e-15
    # coarsest
    coarsest_tol: float = 0.2
    coarsest_max_iter: int = 1000
    coarsest_restart_freq: int = 32
    # null vector generation
    nullvec_max_iter: int = 500
    nullvec_tol: float = 5e-5
    nullvec_solver: str = "bicgstab_l"
    nullvec_stype: StencilType = StencilType.ORIGINAL
    fine_stencil_app: StencilType = StencilType.ORIGINAL
    coarsest_stencil_app: StencilType = StencilType.ORIGINAL
    # What to coarsen / pre-build on each coarse level (the n19 Schur path
    # coarsens the rbjacobi stencil and pre-builds its rbjacobi form).
    precond_coarsen_rbjacobi: bool = False
    build_extra: int = 0
    free_null_vectors: bool = False  # geometric per-spin constants (do_free)
    # TPU-native: invert the (tiny) coarsest operator at setup and solve
    # it with one dense matvec per K-cycle visit (stateful.py).
    coarsest_direct: bool = False


def build_kcycle_hierarchy(lat0: Lattice2D, fine_op: Stencil2D,
                           cfg: KCycleConfig, rng,
                           is_chiral: bool = True) -> StatefulMultigridMG:
    """Construct the full n13 hierarchy (reference n13:233-416)."""
    coarsest = CoarsestSolveMG(
        coarsest_stencil_app=cfg.coarsest_stencil_app,
        coarsest_tol=cfg.coarsest_tol,
        coarsest_iters=cfg.coarsest_max_iter,
        coarsest_restart_freq=cfg.coarsest_restart_freq)
    mg = StatefulMultigridMG(lat0, fine_op, coarsest)

    cur_x, cur_y = lat0.x_len, lat0.y_len
    lat_prev = lat0
    for i in range(1, cfg.n_refine + 1):
        cur_x //= cfg.x_block
        cur_y //= cfg.y_block
        lat_i = Lattice2D(cur_x, cur_y, cfg.coarse_dof)
        stencil = mg.get_stencil(i - 1)

        if cfg.free_null_vectors:
            # Exact geometric null vectors: constant per spin component
            # (reference n13:264-277, do_free path; the reference pairs
            # do_free with coarse_dof=2 = n_spin, n13:91-94).
            nc = lat_prev.nc
            if cfg.coarse_dof > nc:
                raise ValueError(
                    f"free_null_vectors gives only {nc} independent "
                    f"per-spin constants at level {i - 1}; coarse_dof="
                    f"{cfg.coarse_dof} would duplicate vectors and make "
                    "the block Gram matrix singular (reference do_free "
                    "uses coarse_dof = n_spin, n13:91-94)")
            nv = jnp.zeros((cfg.coarse_dof,) + lat_prev.cv_shape(),
                           dtype=jnp.complex128)
            for c in range(cfg.coarse_dof):
                nv = nv.at[c, ..., c % nc].set(1.0)
            raw = nv
        else:
            vecs, ops = generate_null_vectors(
                stencil, cfg.coarse_dof // 2, rng,
                max_iter=cfg.nullvec_max_iter, tol=cfg.nullvec_tol,
                stype=cfg.nullvec_stype, solver=cfg.nullvec_solver)
            mg.add_tracker_count(DSLASH_NULLVEC, ops, i - 1)
            raw = chiral_double(stencil, vecs)

        transfer = TransferMG(lat_prev, lat_i, raw, do_block_ortho=True,
                              doubling=DoublingType.PROJECTION)
        level_solve = LevelSolveMG(
            fine_stencil_app=cfg.fine_stencil_app,
            intermediate_tol=cfg.inner_tol,
            intermediate_iters=cfg.inner_max_iter,
            intermediate_restart_freq=cfg.inner_restart_freq,
            pre_tol=cfg.pre_smooth_tol, pre_iters=cfg.n_pre_smooth,
            post_tol=cfg.post_smooth_tol, post_iters=cfg.n_post_smooth)
        from .multigrid import PRECOND_RIGHT_BLOCK_JACOBI, PRECOND_ORIGINAL
        mg.push_level(
            lat_i, transfer, level_solve, build_stencil=True,
            is_chiral=is_chiral,
            build_stencil_from=(PRECOND_RIGHT_BLOCK_JACOBI
                                if cfg.precond_coarsen_rbjacobi
                                else PRECOND_ORIGINAL),
            build_extra=cfg.build_extra, nvecs=raw)
        lat_prev = lat_i
    if cfg.coarsest_direct:
        mg.prepare_direct_coarsest()
    return mg
