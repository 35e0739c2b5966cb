"""ArrayStorageMG pool semantics (reference storage/array_storage.h:23-155).

Under XLA the pool is a no-op for buffer management (the runtime owns
lifetimes), but the check-out/check-in discipline the reference enforces
(:91-112) is real API surface: these tests pin it.
"""

import jax.numpy as jnp
import pytest

from qmg_tpu.storage import ArrayStorageMG


def test_check_out_returns_zeroed_array():
    pool = ArrayStorageMG((2, 4, 2, 3), count=2, dtype=jnp.complex128)
    h, v = pool.check_out()
    assert v.shape == (2, 4, 2, 3)
    assert v.dtype == jnp.complex128
    assert float(jnp.abs(v).sum()) == 0.0
    pool.check_in(h)


def test_pool_grows_on_demand():
    # Reference :70-88: checking out past the preallocated count grows.
    pool = ArrayStorageMG((4,), count=2)
    hs = [pool.check_out()[0] for _ in range(5)]
    assert pool.get_number_allocated() == 5
    assert pool.get_number_checked() == 5
    for h in hs:
        pool.check_in(h)
    assert pool.get_number_checked() == 0


def test_foreign_check_in_rejected():
    # Reference :91-112 warns on check-in of a foreign vector; here it
    # raises (SURVEY.md section 5: warnings become exceptions).
    pool = ArrayStorageMG((4,), count=1)
    with pytest.raises(ValueError, match="not from this pool"):
        pool.check_in(99)


def test_double_check_in_rejected():
    pool = ArrayStorageMG((4,), count=1)
    h, _ = pool.check_out()
    pool.check_in(h)
    with pytest.raises(ValueError, match="double check_in"):
        pool.check_in(h)


def test_consolidate_frees_unused():
    # Reference consolidate(min) :128-154: frees unused slots down to a
    # floor, never touching checked-out ones.
    pool = ArrayStorageMG((4,), count=6)
    h, _ = pool.check_out()
    pool.consolidate(min_keep=2)
    assert pool.get_number_checked() == 1
    # Allocated never drops below max(min_keep, checked-out).
    remaining = len(pool._all)
    assert remaining == 2
    pool.check_in(h)
