"""Vector-pool shim for API parity with the reference.

The reference's ArrayStorageMG (storage/array_storage.h:23-155) is a
check-out/check-in pool of preallocated flat vectors, needed because the
C++ code manages buffers manually. Under XLA the runtime owns buffer
lifetimes and jit reuses/donates device buffers, so this class is
functionally a no-op - it exists so reference-shaped user code ports
directly, and it still validates check-in discipline (the reference warns
on foreign check-ins, :91-112).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp


class ArrayStorageMG:
    def __init__(self, shape, count: int = 6, dtype=jnp.complex128):
        self.shape = tuple(shape)
        self.dtype = dtype
        self._free: List[int] = list(range(count))
        self._all = set(self._free)
        self._next_id = count

    def check_out(self):
        """Returns (handle, zeroed array). Grows on demand
        (reference :70-88)."""
        if self._free:
            h = self._free.pop()
        else:
            h = self._next_id
            self._next_id += 1
            self._all.add(h)
        return h, jnp.zeros(self.shape, dtype=self.dtype)

    def check_in(self, handle: int):
        if handle not in self._all:
            raise ValueError(
                "check_in of a vector not from this pool "
                "(reference storage/array_storage.h:91-112)")
        if handle in self._free:
            raise ValueError("double check_in")
        self._free.append(handle)

    def get_number_allocated(self) -> int:
        return len(self._all)

    def get_number_checked(self) -> int:
        return len(self._all) - len(self._free)

    def consolidate(self, min_keep: int = 0):
        """Free unused slots down to min_keep (reference :128-154)."""
        keep = max(min_keep, self.get_number_checked())
        drop = min(len(self._free), self._next_id - keep)
        for _ in range(drop):
            self._all.discard(self._free.pop())
