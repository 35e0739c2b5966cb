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


# ---------------------------------------------------------------------------
# Row-parity-split layout kernels.
#
# Storing y-rows split by parity r = y % 2 (x as (2p, 2r, nc, 2ri, Yh, Xh),
# Yh = Y/2, row m of half r = global y = 2m + r) turns EVERY neighbor pull
# into a pure roll or slice:
#   +-x: for dest half r == q the +x source is the same lane, for r != q
#        it is a lane rotation - no row-parity selects, no iota masks;
#   +-y: dest half 0 pulls source half 1 at rows m / m-1, dest half 1
#        pulls source half 0 at rows m+1 / m - sublane slices of the
#        windowed rows (or torus rolls in the VMEM-resident variant).
# The interleaved-layout kernel above spends a large share of its VPU
# time on the jnp.where row-parity selects; this layout removes them.
# ---------------------------------------------------------------------------


def x_to_planes_split(x):
    """(2, Y, Xh, nc) complex -> (2p, 2r, nc, 2ri, Yh, Xh) f32."""
    x = x.astype(jnp.complex64)
    two, y_len, xh, nc = x.shape
    v = x.reshape(2, y_len // 2, 2, xh, nc)          # (p, m, r, xh, c)
    v = jnp.transpose(v, (0, 2, 4, 1, 3))            # (p, r, c, m, xh)
    return jnp.stack([jnp.real(v), jnp.imag(v)], axis=3)


def x_from_planes_split(pl_x):
    """(2p, 2r, nc, 2ri, Yh, Xh) f32 -> (2, Y, Xh, nc) complex64."""
    v = jax.lax.complex(pl_x[:, :, :, 0], pl_x[:, :, :, 1])
    v = jnp.transpose(v, (0, 3, 1, 4, 2))            # (p, m, r, xh, c)
    two, yh, _, xh, nc = v.shape
    return v.reshape(2, 2 * yh, xh, nc)


def _channels_from_coeffs_split(coeffs: StencilCoeffs):
    """Split-layout channel planes: clover (2p, 2r, nc, nc, 2ri, Yh, Xh)
    with shifts folded in; hopping (4, 2p, 2r, nc, nc, 2ri, Yh, Xh)."""
    lat = coeffs.lat
    clover = mass_pattern(coeffs).astype(jnp.complex64)
    if coeffs.clover is not None:
        clover = clover + coeffs.clover.astype(jnp.complex64)
    hopping = coeffs.hopping.astype(jnp.complex64)

    def split(z):
        # (..., 2p, Y, Xh, nc, nc) -> (..., 2p, 2r, nc, nc, 2ri, Yh, Xh)
        shp = z.shape
        lead = shp[:-5]
        p2, y_len, xh, nc1, nc2 = shp[-5:]
        v = z.reshape(lead + (p2, y_len // 2, 2, xh, nc1, nc2))
        nl = len(lead)
        # (p, m, r, xh, i, j) -> (p, r, i, j, m, xh)
        perm = tuple(range(nl)) + tuple(nl + a for a in (0, 2, 4, 5, 1, 3))
        v = jnp.transpose(v, perm)
        return jnp.stack([jnp.real(v), jnp.imag(v)], axis=-3)

    return split(clover), split(hopping)


def _dslash_split_kernel(nc: int, tile: int, yh_len: int,
                         double_buffer: bool,
                         x_hbm, clover_ref, hopping_ref, out_ref,
                         xwin, sems):
    """One Yh-tile of the split-layout Dslash.

    x_hbm:    (2p, 2r, nc, 2ri, Yh, Xh) in HBM, windowed by manual DMA.
    clover:   (2p, 2r, nc, nc, 2ri, T, Xh) VMEM block.
    hopping:  (4, 2p, 2r, nc, nc, 2ri, T, Xh) VMEM block.
    out:      (2p, 2r, nc, 2ri, T, Xh) VMEM block.
    xwin:     (slots, 2p, 2r, nc, 2ri, T+16, Xh) scratch with 8-row halos.
    """
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    def window_dmas(slot, tile_idx):
        y0 = tile_idx * tile
        dn_start = pl.multiple_of((y0 - 8) % yh_len, 8)
        body_start = pl.multiple_of(y0 % yh_len, 8)
        up_start = pl.multiple_of((y0 + tile) % yh_len, 8)
        return (
            pltpu.make_async_copy(
                x_hbm.at[:, :, :, :, pl.ds(dn_start, 8), :],
                xwin.at[slot, :, :, :, :, pl.ds(0, 8), :],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                x_hbm.at[:, :, :, :, pl.ds(body_start, tile), :],
                xwin.at[slot, :, :, :, :, pl.ds(8, tile), :],
                sems.at[slot, 1]),
            pltpu.make_async_copy(
                x_hbm.at[:, :, :, :, pl.ds(up_start, 8), :],
                xwin.at[slot, :, :, :, :, pl.ds(8 + tile, 8), :],
                sems.at[slot, 2]),
        )

    if double_buffer:
        slot = t % 2
        next_slot = (t + 1) % 2

        @pl.when(t == 0)
        def _():
            for dma in window_dmas(0, 0):
                dma.start()

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

    def cmul_acc(acc_re, acc_im, hr, hi, xr, xi):
        return (acc_re + hr * xr - hi * xi, acc_im + hr * xi + hi * xr)

    for q in (0, 1):
        p = 1 - q
        for r in (0, 1):
            # Per source color j: own-parity body (clover input) and the
            # four pulled neighbor planes - all pure slices/rolls.
            pulled = []
            for j in range(nc):
                xr = xwin[q, r, j, 0, 8:tile + 8, :]
                xi = xwin[q, r, j, 1, 8:tile + 8, :]
                same_re = xwin[p, r, j, 0, 8:tile + 8, :]
                same_im = xwin[p, r, j, 1, 8:tile + 8, :]
                if r == q:
                    xp_re, xp_im = same_re, same_im
                    xm_re = pltpu.roll(same_re, 1, 1)
                    xm_im = pltpu.roll(same_im, 1, 1)
                else:
                    xp_re = pltpu.roll(same_re, xh_len - 1, 1)
                    xp_im = pltpu.roll(same_im, xh_len - 1, 1)
                    xm_re, xm_im = same_re, same_im
                o = 1 - r
                if r == 0:
                    up_re = xwin[p, o, j, 0, 8:tile + 8, :]     # m
                    up_im = xwin[p, o, j, 1, 8:tile + 8, :]
                    dn_re = xwin[p, o, j, 0, 7:tile + 7, :]     # m-1
                    dn_im = xwin[p, o, j, 1, 7:tile + 7, :]
                else:
                    up_re = xwin[p, o, j, 0, 9:tile + 9, :]     # m+1
                    up_im = xwin[p, o, j, 1, 9:tile + 9, :]
                    dn_re = xwin[p, o, j, 0, 8:tile + 8, :]     # m
                    dn_im = xwin[p, o, j, 1, 8:tile + 8, :]
                dirs = ((DIR_XP1, xp_re, xp_im), (DIR_YP1, up_re, up_im),
                        (DIR_XM1, xm_re, xm_im), (DIR_YM1, dn_re, dn_im))
                pulled.append((xr, xi, dirs))

            for i in range(nc):
                acc_re = jnp.zeros((tile, xh_len), jnp.float32)
                acc_im = jnp.zeros((tile, xh_len), jnp.float32)
                for j, (xr, xi, dirs) in enumerate(pulled):
                    acc_re, acc_im = cmul_acc(
                        acc_re, acc_im,
                        clover_ref[q, r, i, j, 0].astype(jnp.float32),
                        clover_ref[q, r, i, j, 1].astype(jnp.float32),
                        xr, xi)
                    for d, sr, si in dirs:
                        acc_re, acc_im = cmul_acc(
                            acc_re, acc_im,
                            hopping_ref[d, q, r, i, j, 0].astype(
                                jnp.float32),
                            hopping_ref[d, q, r, i, j, 1].astype(
                                jnp.float32),
                            sr, si)
                out_ref[q, r, i, 0] = acc_re
                out_ref[q, r, i, 1] = acc_im


def make_pallas_dslash_split_shaped(nc: int, y_len: int, xh: int,
                                    tile: int = 16,
                                    interpret: bool = False,
                                    double_buffer: bool = True,
                                    coeff_dtype=jnp.float32):
    """Split-layout kernel factory. apply_fn(clover_split, hopping_split,
    x_split) -> out_split, all in the (2p, 2r, ...) layout."""
    yh_len = y_len // 2
    n_slots = 2 if double_buffer else 1
    csize = jnp.dtype(coeff_dtype).itemsize

    def vmem_bytes(t):
        per_row = xh * 4
        c_row = xh * csize
        hopping = 2 * (4 * 4 * nc * nc * 2 * t * c_row)
        clover = 2 * (4 * nc * nc * 2 * t * c_row)
        out = 2 * (4 * nc * 2 * t * per_row)
        xwin = n_slots * 4 * nc * 2 * (t + 16) * per_row
        return hopping + clover + out + xwin

    step = 16 if csize < 4 else 8
    while tile > step and vmem_bytes(tile) > 11 * 1024 * 1024:
        tile -= step
    if yh_len % tile:
        tile = int(np.gcd(tile, yh_len))
    if y_len % 2 or yh_len % 8 or tile % 8:
        raise ValueError(
            f"split dslash needs Y/2 and tile multiples of 8; got "
            f"Y={y_len}, tile={tile} - use the small kernel or jnp apply")
    if not interpret and xh % 128:
        raise ValueError(
            f"split dslash needs Xh a multiple of 128 lanes; got Xh={xh}")
    if jnp.dtype(coeff_dtype).itemsize < 4 and tile % 16:
        raise ValueError("sub-f32 coefficient dtypes need tile % 16 == 0")
    grid = (yh_len // tile,)
    kernel = functools.partial(_dslash_split_kernel, nc, tile, yh_len,
                               double_buffer)

    def apply_fn(clover_pl, hopping_pl, x_pl):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # x in HBM
                pl.BlockSpec((2, 2, nc, nc, 2, tile, xh),
                             lambda t: (0, 0, 0, 0, 0, t, 0)),
                pl.BlockSpec((4, 2, 2, nc, nc, 2, tile, xh),
                             lambda t: (0, 0, 0, 0, 0, 0, t, 0)),
            ],
            out_specs=pl.BlockSpec((2, 2, nc, 2, tile, xh),
                                   lambda t: (0, 0, 0, 0, t, 0)),
            out_shape=jax.ShapeDtypeStruct((2, 2, nc, 2, yh_len, xh),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n_slots, 2, 2, nc, 2, tile + 16, xh),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((n_slots, 3)),
            ],
            interpret=interpret,
        )(x_pl, clover_pl, hopping_pl)

    return apply_fn


# ---------------------------------------------------------------------------
# Whole-lattice VMEM-resident kernel for small / coarse lattices.
#
# Below Xh = 128 the windowed kernels' DMA slices cannot align to the
# (8, 128) f32 tile, and below ~128^2 the whole problem fits in VMEM
# anyway. This variant loads x + all coefficients as single VMEM blocks
# (grid = 1, no manual DMA) and uses torus rolls for every pull, in the
# same row-parity-split layout, so the ENTIRE Dslash is one fused kernel
# - where the jnp formulation at these sizes is ~10 latency-bound HLO
# ops. Covers the reference's recommended 64^2/128^2 operating points
# (n13:40) and the nc=8 coarse levels of large hierarchies.
# ---------------------------------------------------------------------------


def _dslash_small_kernel(nc: int, x_ref, clover_ref, hopping_ref, out_ref):
    yh_len, xh_len = x_ref.shape[-2], x_ref.shape[-1]

    def cmul_acc(acc_re, acc_im, hr, hi, xr, xi):
        return (acc_re + hr * xr - hi * xi, acc_im + hr * xi + hi * xr)

    def roll_y(a, shift):
        return pltpu.roll(a, shift % yh_len, 0) if yh_len > 1 else a

    def roll_x(a, shift):
        return pltpu.roll(a, shift % xh_len, 1) if xh_len > 1 else a

    for q in (0, 1):
        p = 1 - q
        for r in (0, 1):
            pulled = []
            for j in range(nc):
                xr = x_ref[q, r, j, 0]
                xi = x_ref[q, r, j, 1]
                same_re = x_ref[p, r, j, 0]
                same_im = x_ref[p, r, j, 1]
                if r == q:
                    xp_re, xp_im = same_re, same_im
                    xm_re, xm_im = roll_x(same_re, 1), roll_x(same_im, 1)
                else:
                    xp_re, xp_im = roll_x(same_re, -1), roll_x(same_im, -1)
                    xm_re, xm_im = same_re, same_im
                o = 1 - r
                ore = x_ref[p, o, j, 0]
                oim = x_ref[p, o, j, 1]
                if r == 0:
                    up_re, up_im = ore, oim                      # m
                    dn_re, dn_im = roll_y(ore, 1), roll_y(oim, 1)  # m-1
                else:
                    up_re, up_im = roll_y(ore, -1), roll_y(oim, -1)  # m+1
                    dn_re, dn_im = ore, oim                      # m
                dirs = ((DIR_XP1, xp_re, xp_im), (DIR_YP1, up_re, up_im),
                        (DIR_XM1, xm_re, xm_im), (DIR_YM1, dn_re, dn_im))
                pulled.append((xr, xi, dirs))

            for i in range(nc):
                acc_re = jnp.zeros((yh_len, xh_len), jnp.float32)
                acc_im = jnp.zeros((yh_len, xh_len), jnp.float32)
                for j, (xr, xi, dirs) in enumerate(pulled):
                    acc_re, acc_im = cmul_acc(
                        acc_re, acc_im,
                        clover_ref[q, r, i, j, 0].astype(jnp.float32),
                        clover_ref[q, r, i, j, 1].astype(jnp.float32),
                        xr, xi)
                    for d, sr, si in dirs:
                        acc_re, acc_im = cmul_acc(
                            acc_re, acc_im,
                            hopping_ref[d, q, r, i, j, 0].astype(
                                jnp.float32),
                            hopping_ref[d, q, r, i, j, 1].astype(
                                jnp.float32),
                            sr, si)
                out_ref[q, r, i, 0] = acc_re
                out_ref[q, r, i, 1] = acc_im


def make_pallas_dslash_small_shaped(nc: int, y_len: int, xh: int,
                                    interpret: bool = False,
                                    coeff_dtype=jnp.float32):
    """VMEM-resident split-layout kernel for small lattices.
    apply_fn(clover_split, hopping_split, x_split) -> out_split."""
    if y_len % 2:
        raise ValueError(f"small dslash needs even Y; got {y_len}")
    if not interpret and xh % 64:
        # Lane rotations below 64 lanes hit a Mosaic UNIMPLEMENTED on
        # v5e (observed: Xh=32 compiles but aborts the device at run
        # time and can wedge the remote runtime). Keep sub-64 lane
        # widths on the jnp apply; interpret mode (tests) is exempt.
        raise ValueError(
            f"small dslash needs Xh a multiple of 64 lanes on TPU; "
            f"got Xh={xh} - use the jnp apply")
    yh_len = y_len // 2
    csize = jnp.dtype(coeff_dtype).itemsize
    plane = yh_len * xh
    total = (4 * nc * 2 * plane * 4 * 2            # x + out
             + (4 + 16) * nc * nc * 2 * plane * csize)  # clover + hopping
    # ~16 MB VMEM/core; grid=() does not pipeline, so blocks are single-
    # buffered and the operands can use most of it.
    if total > 14 * 1024 * 1024:
        raise ValueError(
            f"small dslash operands ({total/2**20:.1f} MiB) exceed VMEM - "
            "use the windowed kernel")

    def apply_fn(clover_pl, hopping_pl, x_pl):
        return pl.pallas_call(
            functools.partial(_dslash_small_kernel, nc),
            out_shape=jax.ShapeDtypeStruct((2, 2, nc, 2, yh_len, xh),
                                           jnp.float32),
            interpret=interpret,
        )(x_pl, clover_pl, hopping_pl)

    return apply_fn
