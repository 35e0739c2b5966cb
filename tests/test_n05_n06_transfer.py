"""Transfer operators (reference tests n05 + n06).

n05 (tests/n05_prolong_restrict_test): after block ortho, P^dag P = 1 on
the coarse space (restrict-of-prolong preserves coarse vectors) and
P P^dag fixes the null-vector span; also the asymmetric R != P^dag pair.

n06 (tests/n06_transfer_decomp): the captured Cholesky / LU factors match
the explicit Gram-Schmidt relation orig = ortho @ R (and the restrict side
against L^dag).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.transfer import TransferMG, DoublingType
from qmg_tpu.rng import QMGRandom
from qmg_tpu.linalg import norm, diffnorm2sq

FINE = Lattice2D(16, 16, 2)
COARSE = Lattice2D(4, 4, 4)  # 4x4 blocking, 4 null vectors


def _null_vectors(lat, nvec, seed=5):
    rng = QMGRandom(seed)
    return jnp.stack([jnp.asarray(rng.gaussian_cv(lat))
                      for _ in range(nvec)])


def test_restrict_of_prolong_is_identity():
    nv = _null_vectors(FINE, COARSE.nc)
    t = TransferMG(FINE, COARSE, nv, do_block_ortho=True)
    rng = QMGRandom(11)
    xc = jnp.asarray(rng.gaussian_cv(COARSE))
    rt = t.restrict_f2c(t.prolong_c2f(xc))
    assert float(diffnorm2sq(rt, xc)) < 1e-22 * float(norm(xc)) ** 2


def test_prolong_of_restrict_fixes_null_space():
    nv = _null_vectors(FINE, COARSE.nc)
    t = TransferMG(FINE, COARSE, nv, do_block_ortho=True)
    for i in range(COARSE.nc):
        v = t.null_vectors[i]
        pv = t.prolong_c2f(t.restrict_f2c(v))
        assert float(diffnorm2sq(pv, v)) < 1e-20


def test_block_orthonormality():
    nv = _null_vectors(FINE, COARSE.nc)
    t = TransferMG(FINE, COARSE, nv, do_block_ortho=True)
    # Per-block Gram matrix of the orthonormalized vectors == identity.
    nvb = t._nvb
    gram = jnp.einsum("icbyx,jcbyx->cyxij", jnp.conj(nvb), nvb)
    eye = jnp.eye(COARSE.nc)
    assert float(jnp.max(jnp.abs(gram - eye))) < 1e-12


def test_asymmetric_bi_ortho():
    """R != P^dagger support (reference n05:119-139, second ctor)."""
    pv = _null_vectors(FINE, COARSE.nc, seed=5)
    rv = _null_vectors(FINE, COARSE.nc, seed=6)
    t = TransferMG(FINE, COARSE, pv, do_block_ortho=True,
                   restrict_null_vectors=rv)
    assert not t.is_symmetric()
    # Bi-orthonormality: <r_i, p_j>_block = delta_ij.
    gram = jnp.einsum("icbyx,jcbyx->cyxij", jnp.conj(t._restrict_nvb),
                      t._nvb)
    assert float(jnp.max(jnp.abs(gram - jnp.eye(COARSE.nc)))) < 1e-10
    # restrict(prolong(x)) = x still holds.
    xc = jnp.asarray(QMGRandom(12).gaussian_cv(COARSE))
    rt = t.restrict_f2c(t.prolong_c2f(xc))
    assert float(diffnorm2sq(rt, xc)) < 1e-18 * float(norm(xc)) ** 2


def test_cholesky_capture_matches_gram_schmidt():
    """n06 oracle: orig_blocked = ortho_blocked @ R (upper triangular)."""
    nv = _null_vectors(FINE, COARSE.nc)
    t = TransferMG(FINE, COARSE, nv, do_block_ortho=True, save_decomp=True)
    assert t.has_decompositions()
    chol = t.block_cholesky  # (..., j, i) upper triangular
    # Upper triangularity.
    tri = np.asarray(chol)
    assert np.max(np.abs(np.tril(tri, -1))) < 1e-14
    orig_blocked = t._to_blocked_batch(nv)  # (nvec, 2c, B, Yc, Xhc)
    recon = jnp.einsum("jcbyx,cyxji->icbyx", t._nvb, chol)
    assert float(jnp.max(jnp.abs(recon - orig_blocked))) < 1e-10


def test_lu_capture_matches_bi_gram_schmidt():
    """n06 LU oracle: P_orig = P_ortho @ U and R_orig = R_ortho @ L^dag."""
    pv = _null_vectors(FINE, COARSE.nc, seed=5)
    rv = _null_vectors(FINE, COARSE.nc, seed=6)
    t = TransferMG(FINE, COARSE, pv, do_block_ortho=True, save_decomp=True,
                   restrict_null_vectors=rv)
    assert t.has_decompositions()
    L, U = t.block_L, t.block_U
    assert np.max(np.abs(np.tril(np.asarray(U), -1))) < 1e-14
    assert np.max(np.abs(np.triu(np.asarray(L), 1))) < 1e-14
    p_orig = t._to_blocked_batch(pv)
    r_orig = t._to_blocked_batch(rv)
    p_recon = jnp.einsum("jcbyx,cyxji->icbyx", t._nvb, U)
    ldag = jnp.conj(jnp.swapaxes(L, -1, -2))
    r_recon = jnp.einsum("jcbyx,cyxji->icbyx", t._restrict_nvb, ldag)
    assert float(jnp.max(jnp.abs(p_recon - p_orig))) < 1e-10
    assert float(jnp.max(jnp.abs(r_recon - r_orig))) < 1e-10


def test_point_coarse_lattice():
    """Coarsening all the way to 1x1 (n13 with n_refine -> 1^2)."""
    fine = Lattice2D(4, 4, 2)
    coarse = Lattice2D(1, 1, 4)
    nv = _null_vectors(fine, 4)
    t = TransferMG(fine, coarse, nv, do_block_ortho=True)
    xc = jnp.zeros((2, 1, 1, 4), dtype=jnp.complex128).at[0, 0, 0].set(
        jnp.arange(1.0, 5.0))
    rt = t.restrict_f2c(t.prolong_c2f(xc))
    assert float(diffnorm2sq(rt, xc)) < 1e-20
