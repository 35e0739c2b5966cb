"""Vector and batched per-site matrix primitives.

TPU-native counterpart of the quantum-linalg BLAS surface the reference
depends on (reconstructed from call sites; see SURVEY.md section 2.9:
blas/generic_vector.h, blas/generic_local_matrix.h). Most entries are thin
jnp one-liners; they exist so the rest of the framework reads like the
reference's math, and so reduction orders are centralized (Krylov
trajectories are sensitive to them).

Fields are arrays of any shape; "cv" fields are (2, Y, Xh, nc) and "cm"
fields (2, Y, Xh, nc, nc) with [..., c1, c2], c1 = row.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "vdot", "norm2sq", "norm", "diffnorm2sq", "norminf", "normalize",
    "orthogonal", "site_matvec", "site_matvec_accum", "site_matmul",
    "site_conjtrans", "site_inv", "site_inv_qr", "identity_like",
]


# --- global reductions (blas/generic_vector.h equivalents) ---

def vdot(a, b):
    """<a, b> = sum conj(a) * b over all elements."""
    return jnp.sum(jnp.conj(a) * b)


def norm2sq(a):
    return jnp.sum(jnp.real(jnp.conj(a) * a))


def norm(a):
    return jnp.sqrt(norm2sq(a))


def diffnorm2sq(a, b):
    d = a - b
    return jnp.sum(jnp.real(jnp.conj(d) * d))


def norminf(a):
    return jnp.max(jnp.abs(a))


def normalize(a):
    return a / norm(a)


def orthogonal(a, b):
    """a -= <b, a>/<b, b> * b (quantum-linalg ``orthogonal``)."""
    return a - (vdot(b, a) / norm2sq(b)) * b


# --- batched per-site matrix ops (blas/generic_local_matrix.h equivalents) ---

def site_matvec(mat, vec):
    """Per-site y = A x: (..., nc, nc) x (..., nc) -> (..., nc).

    Equivalent of cMATxy; cMATxpy is site_matvec_accum.
    """
    return jnp.einsum("...ij,...j->...i", mat, vec)


def site_matvec_accum(mat, vec, acc):
    """Per-site acc += A x (cMATxpy)."""
    return acc + site_matvec(mat, vec)


def site_matmul(a, b):
    """Per-site C = A B (cMATxtMATyMATz_square)."""
    return jnp.einsum("...ij,...jk->...ik", a, b)


def site_conjtrans(mat):
    """Per-site conjugate transpose (cMATcopy_conjtrans_square)."""
    return jnp.conj(jnp.swapaxes(mat, -1, -2))


def site_inv(mat):
    """Per-site inverse of square matrices (batched)."""
    return jnp.linalg.inv(mat)


def site_inv_qr(mat):
    """Per-site inverse via batched QR.

    Mirrors the reference's cMATx_do_qr_square + cMATqr_do_xinv_square path
    (used for the rbjacobi clover inverse, stencil/stencil_2d.h:1532-1537)
    for numerical robustness on ill-conditioned site blocks.
    """
    q, r = jnp.linalg.qr(mat)
    n = mat.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=mat.dtype), mat.shape)
    rinv = jnp.linalg.solve_triangular(r, eye, lower=False) if hasattr(
        jnp.linalg, "solve_triangular") else jnp.linalg.solve(r, eye)
    return site_matmul(rinv, site_conjtrans(q))


def identity_like(mat_field):
    """Per-site identity matrices with the shape/dtype of a cm field."""
    n = mat_field.shape[-1]
    eye = jnp.eye(n, dtype=mat_field.dtype)
    return jnp.broadcast_to(eye, mat_field.shape)
