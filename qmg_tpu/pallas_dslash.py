"""Fused Dslash as a Pallas TPU kernel.

The hot path of the whole framework is the distance-1 stencil apply
(reference stencil/stencil_2d.h:706-841 - 4 cshifts + 4 batched nc x nc
complex matvecs + clover + mass, called inside every Krylov iteration).
XLA already fuses the jnp formulation well; this kernel exists to close
the remaining gap by

  * reading x exactly once (the jnp form re-reads it per direction),
  * doing the neighbor shifts in-register (pltpu.roll on the lane axis,
    sublane-shifted row windows for +-y) instead of materialized rolls,
  * streaming the coefficient fields (the dominant traffic) through the
    standard Pallas double-buffered pipeline.

Layout: complex fields travel as float32 channel planes with the lattice
last: x is (2p, nc, 2ri, Y, Xh); hopping (4d, 2p, nc, nc, 2ri, Y, Xh);
clover (2p, nc, nc, 2ri, Y, Xh) with the mass/eo/dof shifts pre-folded
into the clover diagonal (stencil.mass_pattern), so the kernel computes
out = clover x + sum_d hop_d shift_d(x). Xh is the lane axis; Y tiles
over the grid with a manually-DMA'd (T+2)-row x window for the +-y halo.

The same kernel drives Wilson (nc=2), staggered/Laplace (nc=1) and any
coarse operator (nc=8, 16, ...); nc is static and the spin loops unroll.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lattice import DIR_XP1, DIR_YP1, DIR_XM1, DIR_YM1
from .stencil import StencilCoeffs, mass_pattern


def _channels_from_coeffs(coeffs: StencilCoeffs):
    """Fold shifts into the clover; return (clover_pl, hopping_pl) channel
    planes (f32) shaped (2, nc, nc, 2, Y, Xh) and (4, 2, nc, nc, 2, Y, Xh).
    """
    lat = coeffs.lat
    clover = mass_pattern(coeffs).astype(jnp.complex64)
    if coeffs.clover is not None:
        clover = clover + coeffs.clover.astype(jnp.complex64)
    hopping = coeffs.hopping.astype(jnp.complex64)

    def planes(z, move_from):
        # (..., Y, Xh, nc, nc) -> (..., nc, nc, 2, Y, Xh)
        z = jnp.moveaxis(z, (move_from, move_from + 1), (-2, -1))
        return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-3)

    # clover: (2, Y, Xh, nc, nc) -> (2, nc, nc, 2ri, Y, Xh)
    c = jnp.moveaxis(clover, (3, 4), (1, 2))
    c = jnp.stack([jnp.real(c), jnp.imag(c)], axis=3)
    # hopping: (4, 2, Y, Xh, nc, nc) -> (4, 2, nc, nc, 2ri, Y, Xh)
    h = jnp.moveaxis(hopping, (4, 5), (2, 3))
    h = jnp.stack([jnp.real(h), jnp.imag(h)], axis=4)
    return c, h


def x_to_planes(x):
    """(2, Y, Xh, nc) complex -> (2, nc, 2, Y, Xh) f32."""
    v = jnp.moveaxis(x.astype(jnp.complex64), 3, 1)
    return jnp.stack([jnp.real(v), jnp.imag(v)], axis=2)


def x_from_planes(p):
    """(2, nc, 2, Y, Xh) f32 -> (2, Y, Xh, nc) complex64."""
    v = jax.lax.complex(p[:, :, 0], p[:, :, 1])
    return jnp.moveaxis(v, 1, 3)


def _dslash_kernel(nc: int, tile: int, y_len: int, double_buffer: bool,
                   x_hbm, clover_ref, hopping_ref, out_ref,
                   xwin, sems):
    """One Y-tile of the fused Dslash.

    x_hbm:    (2, nc, 2, Y, Xh) in ANY/HBM - windowed by manual DMA.
    clover:   (2, nc, nc, 2, T, Xh) VMEM block.
    hopping:  (4, 2, nc, nc, 2, T, Xh) VMEM block.
    out:      (2, nc, 2, T, Xh) VMEM block.
    xwin:     (2, nc, 2, T+16, Xh) VMEM scratch laid out as
              [8 rows ending at y0) | body T rows | 8 rows from y0+T) -
              all three DMAs start at sublane-tile-aligned (x8) offsets,
              which Mosaic requires for memref slices; halo reads are
              value slices at offsets 7/9, which lower to cheap shifts.
    """
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    def window_dmas(slot, tile_idx):
        """The three x-window DMAs for a tile (dn halo, body, up halo).
        multiple_of: the wrap modulo defeats Mosaic's divisibility
        analysis for the x8 sublane-tile DMA alignment it must prove."""
        y0 = tile_idx * tile
        dn_start = pl.multiple_of((y0 - 8) % y_len, 8)
        body_start = pl.multiple_of(y0 % y_len, 8)
        up_start = pl.multiple_of((y0 + tile) % y_len, 8)
        return (
            pltpu.make_async_copy(
                x_hbm.at[:, :, :, pl.ds(dn_start, 8), :],
                xwin.at[slot, :, :, :, pl.ds(0, 8), :], sems.at[slot, 0]),
            pltpu.make_async_copy(
                x_hbm.at[:, :, :, pl.ds(body_start, tile), :],
                xwin.at[slot, :, :, :, pl.ds(8, tile), :],
                sems.at[slot, 1]),
            pltpu.make_async_copy(
                x_hbm.at[:, :, :, pl.ds(up_start, 8), :],
                xwin.at[slot, :, :, :, pl.ds(8 + tile, 8), :],
                sems.at[slot, 2]),
        )

    if double_buffer:
        slot = t % 2
        next_slot = (t + 1) % 2

        # Warm-up: the first tile issues its own window synchronously.
        @pl.when(t == 0)
        def _():
            for dma in window_dmas(0, 0):
                dma.start()

        # Prefetch the next tile's window while this tile computes.
        @pl.when(t + 1 < n_tiles)
        def _():
            for dma in window_dmas(next_slot, t + 1):
                dma.start()

        for dma in window_dmas(slot, t):
            dma.wait()
        xwin = xwin.at[slot]
    else:
        for dma in window_dmas(0, t):
            dma.start()
        for dma in window_dmas(0, t):
            dma.wait()
        xwin = xwin.at[0]

    xh_len = out_ref.shape[-1]
    y0 = t * tile
    # Row-parity masks over the tile: rows with global y % 2 == q.
    rows = y0 + jax.lax.broadcasted_iota(jnp.int32, (tile, xh_len), 0)
    row_par = rows % 2

    def cmul_acc(acc_re, acc_im, hr, hi, xr, xi):
        return (acc_re + hr * xr - hi * xi, acc_im + hr * xi + hi * xr)

    for q in (0, 1):
        p = 1 - q
        direct = (row_par == q)
        # Hoist the shifted neighbor planes out of the output-row loop:
        # computed once per source color j, reused for every i.
        pulled = []  # [(j, clover_xr, clover_xi, [(d, sr, si) x4])]
        for j in range(nc):
            xr = xwin[q, j, 0, 8:tile + 8, :]
            xi = xwin[q, j, 1, 8:tile + 8, :]
            same_re = xwin[p, j, 0, 8:tile + 8, :]
            same_im = xwin[p, j, 1, 8:tile + 8, :]
            up_re = xwin[p, j, 0, 9:tile + 9, :]    # y+1
            up_im = xwin[p, j, 1, 9:tile + 9, :]
            dn_re = xwin[p, j, 0, 7:tile + 7, :]    # y-1
            dn_im = xwin[p, j, 1, 7:tile + 7, :]
            # pltpu.roll requires non-negative shifts; xh_len-1 == -1.
            rolm_re = pltpu.roll(same_re, xh_len - 1, 1)  # xh+1
            rolm_im = pltpu.roll(same_im, xh_len - 1, 1)
            rolp_re = pltpu.roll(same_re, 1, 1)           # xh-1
            rolp_im = pltpu.roll(same_im, 1, 1)
            xp_re = jnp.where(direct, same_re, rolm_re)   # pull +x
            xp_im = jnp.where(direct, same_im, rolm_im)
            xm_re = jnp.where(direct, rolp_re, same_re)   # pull -x
            xm_im = jnp.where(direct, rolp_im, same_im)
            dirs = ((DIR_XP1, xp_re, xp_im), (DIR_YP1, up_re, up_im),
                    (DIR_XM1, xm_re, xm_im), (DIR_YM1, dn_re, dn_im))
            pulled.append((xr, xi, dirs))

        for i in range(nc):
            acc_re = jnp.zeros((tile, xh_len), jnp.float32)
            acc_im = jnp.zeros((tile, xh_len), jnp.float32)
            for j, (xr, xi, dirs) in enumerate(pulled):
                # .astype: coefficients may stream as bf16 (mixed-
                # precision preconditioner path); accumulate in f32.
                acc_re, acc_im = cmul_acc(
                    acc_re, acc_im,
                    clover_ref[q, i, j, 0].astype(jnp.float32),
                    clover_ref[q, i, j, 1].astype(jnp.float32), xr, xi)
                for d, sr, si in dirs:
                    acc_re, acc_im = cmul_acc(
                        acc_re, acc_im,
                        hopping_ref[d, q, i, j, 0].astype(jnp.float32),
                        hopping_ref[d, q, i, j, 1].astype(jnp.float32),
                        sr, si)
            out_ref[q, i, 0] = acc_re
            out_ref[q, i, 1] = acc_im


def make_pallas_dslash_shaped(nc: int, y_len: int, xh: int, tile: int = 8,
                              interpret: bool = False,
                              double_buffer: bool = True,
                              coeff_dtype=jnp.float32):
    """Shape-only kernel factory: no eager array work (the axon TPU
    rejects eager complex ops, so callers that prepare channel planes on
    host use this directly). Returns apply_fn(clover_planes,
    hopping_planes, x_planes) -> out_planes."""
    # Auto-fit the tile to the ~16 MB VMEM: double-buffered hopping/
    # clover/out blocks plus the two x windows must fit with slack.
    n_slots = 2 if double_buffer else 1

    csize = jnp.dtype(coeff_dtype).itemsize

    def vmem_bytes(t):
        per_row = xh * 4
        c_row = xh * csize
        # pallas_call double-buffers every BlockSpec-pipelined operand:
        # each of hopping/clover/out costs 2x its block bytes.
        hopping = 2 * (4 * 2 * nc * nc * 2 * t * c_row)
        clover = 2 * (2 * nc * nc * 2 * t * c_row)
        out = 2 * (2 * nc * 2 * t * per_row)
        xwin = n_slots * 2 * nc * 2 * (t + 16) * per_row
        return hopping + clover + out + xwin

    step = 16 if csize < 4 else 8
    while tile > step and vmem_bytes(tile) > 11 * 1024 * 1024:
        tile -= step
    if y_len % tile:
        tile = int(np.gcd(tile, y_len))
    if y_len % 8 or tile % 8:
        # x8 alignment is required both by Mosaic sublane-tile DMA rules
        # and by the 8-row halo blocks (which would over-run Y otherwise).
        raise ValueError(
            f"pallas dslash needs Y and tile multiples of 8; got "
            f"Y={y_len}, tile={tile} - use the jnp apply for small/coarse "
            f"lattices")
    if not interpret and xh % 128:
        # Mosaic: DMA slice shapes must align to the (8, 128) f32 tile in
        # the lane dimension too.
        raise ValueError(
            f"pallas dslash needs Xh (= X/2) a multiple of 128 lanes; got "
            f"Xh={xh} - use the jnp apply below X=256")
    grid = (y_len // tile,)

    if jnp.dtype(coeff_dtype).itemsize < 4 and tile % 16:
        raise ValueError("sub-f32 coefficient dtypes need tile % 16 == 0")
    kernel = functools.partial(_dslash_kernel, nc, tile, y_len,
                               double_buffer)

    def apply_fn(clover_pl, hopping_pl, x_pl):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # x in HBM
                pl.BlockSpec((2, nc, nc, 2, tile, xh),
                             lambda t: (0, 0, 0, 0, t, 0)),
                pl.BlockSpec((4, 2, nc, nc, 2, tile, xh),
                             lambda t: (0, 0, 0, 0, 0, t, 0)),
            ],
            out_specs=pl.BlockSpec((2, nc, 2, tile, xh),
                                   lambda t: (0, 0, 0, t, 0)),
            out_shape=jax.ShapeDtypeStruct((2, nc, 2, y_len, xh),
                                           jnp.float32),
            scratch_shapes=[
                # x windows: with double_buffer, slot t%2 computes while
                # slot (t+1)%2 prefetches the next tile's halo window.
                pltpu.VMEM((n_slots, 2, nc, 2, tile + 16, xh),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((n_slots, 3)),
            ],
            interpret=interpret,
        )(x_pl, clover_pl, hopping_pl)

    return apply_fn


def make_pallas_dslash(coeffs: StencilCoeffs, tile: int = 8,
                       interpret: bool = False):
    """Build a jittable x -> M x using the fused kernel.

    Returns (apply_fn, (clover_planes, hopping_planes)): apply_fn takes
    the channel planes plus an x plane array (2, nc, 2, Y, Xh) and
    returns the output planes. Shifts are folded into the clover, so this
    equals stencil.apply_M exactly. Converts coefficients eagerly - on
    the axon TPU use make_pallas_dslash_shaped with host-built planes.
    """
    lat = coeffs.lat
    apply_fn = make_pallas_dslash_shaped(lat.nc, lat.y_len, lat.xh,
                                         tile=tile, interpret=interpret)
    clover_p, hopping_p = _channels_from_coeffs(coeffs)
    return apply_fn, (clover_p, hopping_p)
