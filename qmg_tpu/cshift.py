"""Periodic nearest-neighbor shifts on eo-packed fields.

TPU-native counterpart of the reference cshift layer
(reference: cshift/cshift_2d.h:45-236), which is the reference's entire
communication story (its periodic-wrap loops are marked "Becomes MPI",
cshift/cshift_2d.h:72,89,101,114).

Semantics (decoded from cshift_2d.h): ``cshift(lhs, rhs, FROM_D, parity)``
is a *pull*: for destination sites (the opposite parity of the source for
distance-1 shifts), ``lhs[site] = rhs[site + D]`` with periodic wrap.

On the (2, Y, X/2, dof...) eo layout this lowers to pure rolls + row-parity
selects - no gathers, no halo indexing:

  * +-y shifts: a roll along the Y axis with a parity swap.
  * +-x shifts: within each destination row, either a direct copy or a
    roll by one along the packed-x axis, depending on the row parity
    (because eo-packing halves the x stride - the same alternation the
    reference hand-codes at cshift/cshift_2d.h:60-93).

When the lattice is sharded over a device mesh (parallel.py), XLA lowers
the wrapped rows/columns of these rolls to collective-permutes over ICI.
"""

from __future__ import annotations

import jax.numpy as jnp

from .lattice import DIR_XP1, DIR_YP1, DIR_XM1, DIR_YM1

__all__ = [
    "cshift_pull", "cshift_pull_half", "DIR_XP1", "DIR_YP1", "DIR_XM1",
    "DIR_YM1", "ALL_DIRS",
]

ALL_DIRS = (DIR_XP1, DIR_YP1, DIR_XM1, DIR_YM1)


def _row_parity_mask(y_len: int, q: int, dof_ndim: int):
    """Boolean (Y, 1, [1]*dof_ndim) mask of rows with y % 2 == q."""
    y = jnp.arange(y_len) % 2 == (q % 2)
    return y.reshape((y_len, 1) + (1,) * dof_ndim)


def _pull_x_half(src, q: int, sign: int):
    """Pull along +-x from parity (1-q) source half into parity-q slots.

    src: (Y, Xh, dof...) array living on parity 1-q.
    Returns (Y, Xh, dof...) array of values at dest_site +- xhat, aligned to
    parity-q packed slots.

    Derivation: dest x = 2*xh + (y+q)%2. For +x (sign=+1) the source column
    is xh when (y+q)%2 == 0 (i.e. y%2 == q) else xh+1; for -x (sign=-1) it
    is xh when (y+q)%2 == 1 else xh-1.
    """
    y_len = src.shape[0]
    dof_ndim = src.ndim - 2
    if sign > 0:
        rolled = jnp.roll(src, -1, axis=1)
        direct_rows = _row_parity_mask(y_len, q, dof_ndim)
    else:
        rolled = jnp.roll(src, 1, axis=1)
        direct_rows = _row_parity_mask(y_len, 1 - q, dof_ndim)
    return jnp.where(direct_rows, src, rolled)


def cshift_pull(field, direction: int):
    """Full-lattice pull-shift: out[site] = field[site + direction].

    field: (2, Y, Xh, dof...) eo-packed array. Returns same shape. The
    destination parity-q half is sourced from the parity-(1-q) half, exactly
    as the reference's paired cshift_from_even/cshift_from_odd calls with
    QMG_EO_FROM_EVENODD (cshift/cshift_2d.h:225-236).
    """
    if direction == DIR_YP1:
        # out[q, y] = field[1-q, y+1]
        swapped = field[::-1]
        return jnp.roll(swapped, -1, axis=1)
    if direction == DIR_YM1:
        swapped = field[::-1]
        return jnp.roll(swapped, 1, axis=1)
    if direction == DIR_XP1:
        return jnp.stack(
            [_pull_x_half(field[1], 0, +1), _pull_x_half(field[0], 1, +1)])
    if direction == DIR_XM1:
        return jnp.stack(
            [_pull_x_half(field[1], 0, -1), _pull_x_half(field[0], 1, -1)])
    raise ValueError(f"unsupported cshift direction {direction}")


def cshift_pull_half(src_half, src_parity: int, direction: int):
    """Half-lattice pull-shift for even-odd preconditioned operators.

    src_half: (Y, Xh, dof...) array on parity ``src_parity``. Returns the
    pulled values aligned to parity ``1 - src_parity`` packed slots:
    out[dest_site] = src[dest_site + direction].

    Used by the Schur/eo paths (e.g. apply_M_eo reads the odd half and
    writes the even half, reference stencil/stencil_2d.h:706-733) without
    materializing the unused half.
    """
    q = 1 - src_parity
    if direction == DIR_YP1:
        return jnp.roll(src_half, -1, axis=0)
    if direction == DIR_YM1:
        return jnp.roll(src_half, 1, axis=0)
    if direction == DIR_XP1:
        return _pull_x_half(src_half, q, +1)
    if direction == DIR_XM1:
        return _pull_x_half(src_half, q, -1)
    raise ValueError(f"unsupported cshift direction {direction}")
