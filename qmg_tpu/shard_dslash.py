"""Explicitly-sharded Dslash: shard_map + ppermute halo exchange.

The jit auto-sharding path (parallel.py) lets XLA's SPMD partitioner
derive the collectives from jnp.roll. This module is the hand-scheduled
production alternative: the lattice block lives per-device, boundary
slices move over ICI with lax.ppermute, and the interior math is the
same stencil apply - the TPU-native realization of the halo exchange the
reference marks "Becomes MPI" (cshift/cshift_2d.h:72,89,101,114).

The (Y, Xh) axes shard over a ("y", "x") mesh; local extents must keep
Y_loc even (so global row parity equals local row parity) and the
blocked MG transfer aligned. Works for any distance-1 stencil.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.7 location
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from .lattice import DIR_XP1, DIR_YP1, DIR_XM1, DIR_YM1
from .stencil import StencilCoeffs, apply_shift
from . import linalg


def _halo_roll(a, shift: int, axis: int, axis_name: str, n_shards: int):
    """Global periodic roll of a sharded axis: local roll + boundary
    slice exchanged with the ring neighbor over ICI."""
    rolled = jnp.roll(a, shift, axis=axis)
    if n_shards == 1:
        return rolled
    size = a.shape[axis]
    if shift == -1:
        # pull from +axis: my last slot needs the neighbor's first slice.
        edge = lax.slice_in_dim(a, 0, 1, axis=axis)
        perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        recv = lax.ppermute(edge, axis_name, perm)
        return lax.dynamic_update_slice_in_dim(rolled, recv, size - 1,
                                               axis=axis)
    if shift == 1:
        edge = lax.slice_in_dim(a, size - 1, size, axis=axis)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        recv = lax.ppermute(edge, axis_name, perm)
        return lax.dynamic_update_slice_in_dim(rolled, recv, 0, axis=axis)
    raise ValueError("only distance-1 shifts")


def _row_parity_mask(y_loc: int, q: int, dof_ndim: int):
    y = jnp.arange(y_loc) % 2 == (q % 2)
    return y.reshape((y_loc, 1) + (1,) * dof_ndim)


def _pull_x_half_sharded(src, q: int, sign: int, nx: int):
    """Sharded version of cshift._pull_x_half: the packed-x roll crosses
    the x-shard boundary. Valid when Y_loc is even (global row parity ==
    local row parity)."""
    dof_ndim = src.ndim - 2
    if sign > 0:
        rolled = _halo_roll(src, -1, 1, "x", nx)
        direct = _row_parity_mask(src.shape[0], q, dof_ndim)
    else:
        rolled = _halo_roll(src, 1, 1, "x", nx)
        direct = _row_parity_mask(src.shape[0], 1 - q, dof_ndim)
    return jnp.where(direct, src, rolled)


def _cshift_pull_sharded(field, direction: int, ny: int, nx: int):
    """cshift.cshift_pull on a local (2, Y_loc, Xh_loc, dof...) block with
    ppermute halo exchange on the wrapped rows/columns."""
    if direction == DIR_YP1:
        return _halo_roll(field[::-1], -1, 1, "y", ny)
    if direction == DIR_YM1:
        return _halo_roll(field[::-1], 1, 1, "y", ny)
    if direction == DIR_XP1:
        return jnp.stack([_pull_x_half_sharded(field[1], 0, +1, nx),
                          _pull_x_half_sharded(field[0], 1, +1, nx)])
    if direction == DIR_XM1:
        return jnp.stack([_pull_x_half_sharded(field[1], 0, -1, nx),
                          _pull_x_half_sharded(field[0], 1, -1, nx)])
    raise ValueError(f"unsupported direction {direction}")


def make_sharded_dslash(coeffs: StencilCoeffs, mesh: Mesh):
    """Returns a jittable x -> M x with explicit halo exchange.

    The returned function takes/returns global arrays (jit handles the
    device placement via the mesh shardings); inside, shard_map runs the
    per-device block stencil with ppermute for the four halos.
    """
    lat = coeffs.lat
    ny, nx = mesh.devices.shape
    if lat.y_len % ny or lat.xh % nx:
        raise ValueError(f"lattice ({lat.y_len}, {lat.xh}) does not tile "
                         f"the mesh {mesh.devices.shape}")
    if (lat.y_len // ny) % 2:
        raise ValueError("Y_loc must be even so local row parity equals "
                         "global row parity")

    fspec = P(None, "y", "x", None)
    cspec = P(None, "y", "x", None, None)
    hspec = P(None, None, "y", "x", None, None)

    def local_apply(clover, hopping, x):
        out = jnp.zeros_like(x)
        if clover is not None:
            out = out + linalg.site_matvec(clover, x)
        if hopping is not None:
            for d in (DIR_XP1, DIR_YP1, DIR_XM1, DIR_YM1):
                pulled = _cshift_pull_sharded(x, d, ny, nx)
                out = out + linalg.site_matvec(hopping[d], pulled)
        # Shifts are diagonal and parity-local: Y_loc even keeps the
        # global eo pattern intact per block.
        out = out + apply_shift(coeffs.replace(clover=None, hopping=None),
                                x)
        return out

    sharded = shard_map(
        local_apply, mesh=mesh,
        in_specs=(cspec if coeffs.clover is not None else P(),
                  hspec if coeffs.hopping is not None else P(),
                  fspec),
        out_specs=fspec)

    def apply_fn(x):
        return sharded(coeffs.clover, coeffs.hopping, x)

    return apply_fn


def make_sharded_pallas_wilson(coeffs: StencilCoeffs, mesh: Mesh,
                               mass: float, w: float = 1.0,
                               tile: int = 32, interpret: bool = False):
    """The rank-1 phase-streaming Wilson kernel inside shard_map
    (VERDICT r2 item 3): per-shard fused Pallas Dslash on the local
    y-slab, with 8-row y halos exchanged over ICI by ppermute feeding
    the kernel's +-y window DMAs through a halo frame
    (pallas_wilson.make_pallas_wilson_rank1_shaped(halo_frame=True)).

    Requires an x-unsharded ("y"-only) mesh: the kernel streams full
    rows along the lane axis, so +-x pulls stay intra-shard lane rolls
    (the natural decomposition for this kernel - X is the vector axis).
    ``mass``/``w`` are the operator's static scalars (compile-time
    constants of the kernel, as in the single-chip path).
    """
    lat = coeffs.lat
    ny, nx = mesh.devices.shape
    if nx != 1:
        raise ValueError(
            "sharded pallas wilson needs an x-unsharded mesh (ny, 1): "
            "the kernel streams full rows on the lane axis; shard y only")
    if lat.nc != 2:
        raise ValueError("sharded pallas wilson needs a Wilson fine "
                         f"operator (nc=2), got nc={lat.nc}")
    if lat.y_len % ny:
        raise ValueError(f"Y={lat.y_len} does not tile {ny} y-shards")
    y_loc = lat.y_len // ny
    if y_loc % 8:
        raise ValueError(
            f"local row count {y_loc} must be a multiple of 8 (the halo "
            "window DMA granule); use fewer y-shards")
    from .pallas_wilson import (make_pallas_wilson_rank1_shaped,
                                wilson_phases_from_coeffs)
    kernel = make_pallas_wilson_rank1_shaped(
        y_loc, lat.xh, w, mass, tile=tile, interpret=interpret,
        halo_frame=True)
    phases = wilson_phases_from_coeffs(coeffs, w)
    from .pallas_dslash import x_to_planes, x_from_planes

    up_perm = [(i, (i + 1) % ny) for i in range(ny)]
    dn_perm = [(i, (i - 1) % ny) for i in range(ny)]

    def local_apply(ph_loc, xp_loc):
        # Halo frame: rows [0, 8) = the previous shard's LAST 8 rows
        # (global y0-8..y0), rows [y_loc+8, y_loc+16) = the next shard's
        # first 8 - the ICI realization of the kernel's periodic window.
        if ny > 1:
            top = lax.ppermute(xp_loc[:, :, :, -8:, :], "y", up_perm)
            bot = lax.ppermute(xp_loc[:, :, :, :8, :], "y", dn_perm)
        else:
            top = xp_loc[:, :, :, -8:, :]
            bot = xp_loc[:, :, :, :8, :]
        frame = jnp.concatenate([top, xp_loc, bot], axis=3)
        return kernel(ph_loc, frame)

    pspec = P(None, None, None, "y", None)
    # check_vma=False: pallas_call does not annotate its outputs with
    # varying-mesh-axes metadata, so shard_map's vma check (the
    # replication checker) rejects any kernel-in-shard_map composition.
    # Correctness is covered by the trajectory/equivalence tests.
    try:
        sharded = shard_map(local_apply, mesh=mesh,
                            in_specs=(pspec, pspec), out_specs=pspec,
                            check_vma=False)
    except TypeError:  # older shard_map signature
        sharded = shard_map(local_apply, mesh=mesh,
                            in_specs=(pspec, pspec), out_specs=pspec)

    def apply_fn(x):
        out = sharded(phases, x_to_planes(x))
        return x_from_planes(out).astype(x.dtype)

    return apply_fn
