"""Timeslice reductions and wall sources (measurement support).

TPU-native counterpart of reference reductions/reductions.h:24-162.

On the (2, Y, Xh, nc) eo layout, a "timeslice" (fixed y) reduction is
simply a sum over the (parity, xh, color) axes - the reference has to
walk flat indices through cv_index_to_coord instead (reductions.h:35-40).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .lattice import Lattice2D

__all__ = ["norm2sq_timeslice", "redot_timeslice", "dot_timeslice",
           "gaussian_wall_source"]


def norm2sq_timeslice(cv):
    """Per-y |cv|^2 sums -> (Y,) real (reference norm2sq_cv_timeslice)."""
    return jnp.sum(jnp.abs(cv) ** 2, axis=(0, 2, 3))


def redot_timeslice(cv1, cv2):
    """Per-y Re<cv1, cv2> -> (Y,) real (reference redot_cv_timeslice)."""
    return jnp.sum(jnp.real(jnp.conj(cv1) * cv2), axis=(0, 2, 3))


def dot_timeslice(cv1, cv2):
    """Per-y <cv1, cv2> -> (Y,) complex (reference dot_cv_timeslice)."""
    return jnp.sum(jnp.conj(cv1) * cv2, axis=(0, 2, 3))


def gaussian_wall_source(lat: Lattice2D, timeslice: int, color: int, rng,
                         deviation: float = 1.0, mean: float = 0.0
                         ) -> np.ndarray:
    """Real gaussian source on one timeslice and color
    (reference gaussian_wall_source, reductions.h:90-162).

    Draws are made in flat eo order over the wall's sites, matching the
    reference's index-ordered fill.
    """
    if timeslice >= lat.y_len:
        raise ValueError("timeslice must be < Ny")
    if color >= lat.nc:
        raise ValueError("color must be < Nc")
    src = np.zeros(lat.cv_shape(), dtype=np.complex128)
    vals = rng.gaussian_real((2, lat.xh), deviation) + mean
    src[:, timeslice, :, color] = vals
    return src
