"""Batched right-hand sides: vmapping a solver amortizes the coefficient
HBM traffic across the batch (the production serving pattern - the
operator is read once per batched apply). Each lane must converge to its
own solution, lockstep-masked by the while_loop."""

import numpy as np
import jax
import jax.numpy as jnp

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import Wilson2D
from qmg_tpu import u1, solvers
from qmg_tpu.rng import QMGRandom
from qmg_tpu.linalg import norm2sq


def test_vmapped_bicgstab_l_matches_individual():
    lat = Lattice2D(16, 16, 2)
    rng = QMGRandom(1337)
    g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    op = Wilson2D(lat, -0.03, g)
    bs = jnp.stack([jnp.asarray(rng.gaussian_cv(lat)) for _ in range(4)])

    batched = jax.jit(jax.vmap(
        lambda b: solvers.bicgstab_l(op.get_apply_function(), b,
                                     max_iter=2000, tol=1e-9, l=4).x))
    xs = batched(bs)
    for i in range(4):
        resid = float(jnp.sqrt(norm2sq(bs[i] - op.apply_M(xs[i]))
                               / norm2sq(bs[i])))
        assert resid < 1e-8, f"rhs {i}: {resid}"


def test_vmapped_cg_batched_matvec_reads_coeffs_once():
    """The compiled batched matvec must contain a single batched einsum
    over the coefficients (coefficients not re-read per lane): check the
    batch dimension rides the rhs operand."""
    lat = Lattice2D(16, 16, 1)
    rng = QMGRandom(7)
    g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    from qmg_tpu.operators import GaugedLaplace2D
    op = GaugedLaplace2D(lat, 0.02, g)
    bs = jnp.stack([jnp.asarray(rng.gaussian_cv(lat)) for _ in range(8)])
    batched = jax.jit(jax.vmap(
        lambda b: solvers.cg(op.get_apply_function(), b, max_iter=500,
                             tol=1e-10).x))
    xs = batched(bs)
    for i in range(8):
        resid = float(jnp.sqrt(norm2sq(bs[i] - op.apply_M(xs[i]))
                               / norm2sq(bs[i])))
        assert resid < 1e-9


def test_vmapped_mg_kcycle():
    """The entire MG-preconditioned FGCR vmaps over a batch of right-hand
    sides (multi-source propagators in one launch)."""
    from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
    from qmg_tpu.stencil import StencilType
    from qmg_tpu import solvers as S

    lat = Lattice2D(16, 16, 2)
    rng = QMGRandom(1337)
    g = u1.unit_gauge_u1(lat)
    op = Wilson2D(lat, 0.1, g)
    from qmg_tpu.setup import KCycleConfig
    cfg = KCycleConfig(n_refine=1, coarse_dof=2, free_null_vectors=True)
    mg = build_kcycle_hierarchy(lat, op, cfg, rng)
    bs = jnp.stack([jnp.asarray(rng.gaussian_cv(lat)) for _ in range(3)])

    matvec = op.get_apply_function()
    precond = mg.make_preconditioner(0)

    def single(b):
        carry = {"counts": jnp.zeros((2, 4), jnp.int32),
                 "iters": jnp.zeros((2,), jnp.int32)}
        res, _ = S.gcr_var_precond_restart(matvec, b, precond,
                                           max_iter=100, tol=1e-8,
                                           restart_freq=32,
                                           precond_carry=carry)
        return res.x

    xs = jax.jit(jax.vmap(single))(bs)
    for i in range(3):
        resid = float(jnp.sqrt(norm2sq(bs[i] - op.apply_M(xs[i]))
                               / norm2sq(bs[i])))
        assert resid < 1e-7, f"rhs {i}: {resid}"
