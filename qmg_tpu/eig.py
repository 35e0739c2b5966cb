"""Eigensolvers: dense full-spectrum and iterative partial-spectrum.

TPU-native counterpart of the quantum-linalg ARPACK interface the
reference uses (interfaces/arpack/generic_arpack.h via SURVEY.md 2.9):
``arpack_dcn`` full-spectrum calls (get_entire_eigensystem) happen on
lattices small enough to densify, so the oracle here is vmapped
operator-densification + LAPACK eig; partial spectra use an implicitly
restarted Arnoldi in JAX (falls back to the dense path for small n).

Selectors mirror ARPACK_SMALLEST_REAL / SMALLEST_MAGNITUDE / LARGEST_REAL.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

SMALLEST_REAL = "SR"
SMALLEST_MAGNITUDE = "SM"
LARGEST_REAL = "LR"
LARGEST_MAGNITUDE = "LM"

_DENSE_CUTOFF = 4096


def densify(matvec, shape, dtype=jnp.complex128) -> np.ndarray:
    """Materialize the operator matrix by applying it to a basis (vmapped).

    Column j of the result is matvec(e_j) - the same probing idea as the
    reference coarse builder, over the full basis.
    """
    n = int(np.prod(shape))
    basis = jnp.eye(n, dtype=dtype).reshape((n,) + tuple(shape))
    cols = jax.lax.map(lambda v: matvec(v).reshape(n), basis,
                       batch_size=min(n, 256))
    return np.asarray(cols).T  # (n, n), columns = images


def dense_eigensystem(matvec, shape, dtype=jnp.complex128):
    """Full spectrum: returns (evals (n,), evecs (n, *shape)) sorted by
    ascending real part (the reference prints in that order)."""
    mat = densify(matvec, shape, dtype)
    evals, evecs = np.linalg.eig(mat)
    order = np.argsort(evals.real)
    evals = evals[order]
    evecs = evecs[:, order].T.reshape((-1,) + tuple(shape))
    return evals, evecs


def _select(evals, which, nev):
    if which in (SMALLEST_REAL, "SR"):
        order = np.argsort(evals.real)
    elif which in (LARGEST_REAL, "LR"):
        order = np.argsort(-evals.real)
    elif which in (SMALLEST_MAGNITUDE, "SM"):
        order = np.argsort(np.abs(evals))
    elif which in (LARGEST_MAGNITUDE, "LM"):
        order = np.argsort(-np.abs(evals))
    else:
        raise ValueError(f"unknown selector {which}")
    return order[:nev]


def arnoldi_eigensystem(matvec, shape, nev: int, which=SMALLEST_MAGNITUDE,
                        ncv: int = None, max_restarts: int = 200,
                        tol: float = 1e-8, seed: int = 7,
                        dtype=jnp.complex128):
    """Partial spectrum via restarted Arnoldi with shift-invert-free
    selection. For small problems (n <= 4096) defers to the dense path -
    the reference's coarsest deflation targets exactly such sizes.

    Returns (evals (nev,), evecs (nev, *shape)).
    """
    n = int(np.prod(shape))
    if n <= _DENSE_CUTOFF:
        evals, evecs = dense_eigensystem(matvec, shape, dtype)
        sel = _select(evals, which, nev)
        return evals[sel], evecs[sel]

    ncv = ncv or min(max(3 * nev, 20), n)
    rng = np.random.default_rng(seed)
    v0 = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    v = jnp.asarray(v0, dtype=dtype)
    v = v / jnp.sqrt(jnp.sum(jnp.abs(v) ** 2))

    def arnoldi_factorization(v1, V=None, H=None, k0=0):
        """Extend an Arnoldi factorization to ncv vectors."""
        if V is None:
            V = jnp.zeros((ncv + 1,) + tuple(shape), dtype=dtype)
            H = np.zeros((ncv + 1, ncv), dtype=np.complex128)
            V = V.at[0].set(v1)
        for j in range(k0, ncv):
            w = matvec(V[j])
            for i in range(j + 1):
                h = jnp.sum(jnp.conj(V[i]) * w)
                H[i, j] = complex(h)
                w = w - h * V[i]
            # reorthogonalize once (classical GS twice).
            for i in range(j + 1):
                h = jnp.sum(jnp.conj(V[i]) * w)
                H[i, j] += complex(h)
                w = w - h * V[i]
            beta = float(jnp.sqrt(jnp.sum(jnp.abs(w) ** 2)))
            H[j + 1, j] = beta
            if beta < 1e-14:
                break
            V = V.at[j + 1].set(w / beta)
        return V, H

    V, H = arnoldi_factorization(v)
    for _ in range(max_restarts):
        Hm = H[:ncv, :ncv]
        evals, S = np.linalg.eig(Hm)
        sel = _select(evals, which, nev)
        resid = np.abs(H[ncv, ncv - 1]) * np.abs(S[ncv - 1, sel])
        if np.all(resid < tol * np.maximum(np.abs(evals[sel]), 1e-30)):
            break
        # Thick (Krylov-Schur) restart: keep the nev wanted Ritz vectors.
        # From A V = V H + f e_k^T with f = V[ncv] * H[ncv, ncv-1]:
        # A (V Q) = (V Q)(Q^H H Q) + f (e_k^T Q).
        Q = np.linalg.qr(S[:, sel])[0]
        Vk = jnp.tensordot(jnp.asarray(Q.T), V[:ncv], axes=1)
        newH = np.zeros_like(H)
        newH[:nev, :nev] = Q.conj().T @ Hm @ Q
        newH[nev, :nev] = H[ncv, ncv - 1] * Q[ncv - 1, :]
        V = V.at[:nev].set(Vk)
        V = V.at[nev].set(V[ncv])
        H = newH
        V, H = arnoldi_factorization(None, V, H, k0=nev)

    Hm = H[:ncv, :ncv]
    evals, S = np.linalg.eig(Hm)
    sel = _select(evals, which, nev)
    vecs = jnp.tensordot(jnp.asarray(S[:, sel].T), V[:ncv], axes=1)
    nrm = jnp.sqrt(jnp.sum(jnp.abs(vecs) ** 2,
                           axis=tuple(range(1, vecs.ndim)), keepdims=True))
    return evals[sel], vecs / nrm
