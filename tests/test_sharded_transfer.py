"""Sharded transfer: shard-local blocking, no fine-level all-gathers.

Round 1 implemented the fine<->blocked layout change as a flat
permutation gather, which XLA's SPMD partitioner can only serve by
all-gathering the fine field. The reshape/transpose formulation keeps
restrict/prolong shard-local whenever the MG blocking tiles the shard
grid (validated by parallel.validate_mg_sharding); this file pins both
the exactness (vs the permutation oracle) and the collective-free HLO.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.transfer import TransferMG, _block_permutation
from qmg_tpu import parallel
from qmg_tpu.rng import QMGRandom


@pytest.fixture(scope="module", autouse=True)
def _clear_jit_caches():
    # See test_sharded_dslash.py: large SPMD compiles late in the
    # session can segfault XLA's CPU compiler; start from empty caches.
    jax.clear_caches()
    yield


@pytest.mark.parametrize("fine,coarse", [
    ((16, 16, 2), (4, 4, 8)),     # the n13 4x4 blocking
    ((8, 16, 3), (4, 4, 6)),      # rectangular, odd nc
    ((8, 8, 2), (1, 1, 4)),       # point coarse level
    ((12, 12, 1), (6, 6, 2)),     # bx = 2
    ((12, 12, 1), (4, 4, 2)),     # bx = 3: odd block, gather fallback
])
def test_blocking_matches_permutation_oracle(fine, coarse):
    fl, cl = Lattice2D(*fine), Lattice2D(*coarse)
    rng = QMGRandom(5)
    nv = jnp.stack([jnp.asarray(rng.gaussian_cv(fl))
                    for _ in range(cl.nc)])
    t = TransferMG(fl, cl, nv, do_block_ortho=False)
    perm, inv_perm, B = _block_permutation(fl, cl)
    f = jnp.asarray(rng.gaussian_cv(fl))
    got = t._to_blocked(f)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(f.reshape(-1)[perm]))
    np.testing.assert_array_equal(np.asarray(t._from_blocked(got)),
                                  np.asarray(f))


def _collective_lines(txt):
    return [ln.strip() for ln in txt.splitlines()
            if "all-gather" in ln or "all-to-all" in ln]


def test_sharded_restrict_prolong_no_fine_allgather():
    """With the fine field sharded over the (y, x) mesh and blocks
    aligned to shards, restrict and prolong must compile with NO
    all-gather / all-to-all (the blocked layout change is local; only
    the tiny coarse field may reshard)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    fl, cl = Lattice2D(32, 32, 2), Lattice2D(8, 8, 8)
    rng = QMGRandom(5)
    nv = jnp.stack([jnp.asarray(rng.gaussian_cv(fl)) for _ in range(8)])
    t = TransferMG(fl, cl, nv)
    mesh = parallel.make_mesh(8)
    f = parallel.shard_field(jnp.asarray(rng.gaussian_cv(fl)), mesh)

    txt = jax.jit(t.restrict_f2c).lower(f).compile().as_text()
    assert not _collective_lines(txt), _collective_lines(txt)[:3]

    # Prolong: coarse (replicated) -> fine (sharded out).
    c = parallel.replicate(t.restrict_f2c(f), mesh)
    out_sh = jax.tree_util.tree_map(lambda x: x.sharding, f)
    pro = jax.jit(t.prolong_c2f, out_shardings=out_sh)
    txt = pro.lower(c).compile().as_text()
    assert not _collective_lines(txt), _collective_lines(txt)[:3]
    # And the sharded results equal the unsharded ones.
    np.testing.assert_allclose(np.asarray(pro(c)),
                               np.asarray(t.prolong_c2f(c)), atol=1e-13)
