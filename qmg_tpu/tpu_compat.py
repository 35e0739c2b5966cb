"""Real-plane boundaries for TPU execution.

The axon TPU backend computes complex64 fine *inside* a compiled
program, but cannot materialize complex device buffers at program
boundaries (eager c64 ops, c64 jit inputs/outputs, and c64 host
transfers all fail UNIMPLEMENTED). The adapter here keeps every jit
boundary real: complex arrays travel as float32 plane-pairs
(..., 2) = (real, imag) and are reassembled with lax.complex inside the
computation.

Use ``realize(fn)`` to wrap any pytree->pytree complex function into a
planes->planes function suitable for jit on the TPU; ``to_planes`` /
``from_planes`` convert at the host boundary.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["to_planes", "from_planes", "realize", "host_to_planes"]


def _is_complex(x):
    return jnp.issubdtype(jnp.asarray(x).dtype, jnp.complexfloating)


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


def _encode(tree):
    return jax.tree_util.tree_map(
        lambda x: to_planes(x) if _is_complex(x) else x, tree)


def _decode(tree, spec):
    """spec: matching tree of bools (was complex)."""
    return jax.tree_util.tree_map(
        lambda x, c: from_planes(x) if c else x, tree, spec)


def realize(fn: Callable) -> Callable:
    """Wrap a complex-valued function into a real-boundary function.

    ``realize(fn)(*planes_args)`` = planes of ``fn(*complex_args)``.
    Positional args that are real stay untouched; complex-ness of each
    input is inferred from a trailing axis of size 2 added by to_planes,
    so callers must encode inputs with to_planes/host_to_planes and pass
    ``complex_args`` markers when ambiguous.
    """

    def wrapped(args_planes, complex_spec):
        args = _decode(args_planes, complex_spec)
        out = fn(*args)
        return jax.tree_util.tree_map(
            lambda x: to_planes(x) if _is_complex(x) else x, out)

    return wrapped


def encode_args(*args):
    """Returns (planes_tree, complex_spec) for feeding realize(fn)."""
    spec = jax.tree_util.tree_map(lambda x: bool(_is_complex(x)), list(args))
    planes = _encode(list(args))
    return planes, spec
