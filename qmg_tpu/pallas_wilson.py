"""Wilson-specialized fused Dslash: stream gauge phases, not matrices.

The generic kernel (pallas_dslash.py) streams full nc x nc hopping
matrices - 128 B/site for Wilson - because a coarse operator's
coefficients are dense. But the fine Wilson operator factorizes
(reference operators/wilson.h:179-209): every hopping matrix is a
CONSTANT 2x2 spin projector times a per-site/direction U(1) phase,

    H_d(site) = 0.5 [[-w, s_d], [s_d', -w]] * U_d(site),
    s in {+-1, -+i},

and the clover + mass is the uniform scalar (2w + m) * identity. So the
speed-of-light traffic for a Wilson apply is only

    4 phases (32 B) + x read (16 B) + out write (16 B) = 64 B/site,

one third of the matrix kernel's 192 B/site. The spin algebra happens
in-register on the VPU: one complex multiply by the (pre-halved) phase
per direction and spin, then sign/swap combines for the projector.

Layouts match pallas_dslash: x planes (2p, 2spin, 2ri, Y, Xh); phase
planes (4d, 2p, 2ri, Y, Xh) carrying 0.5 * U_d (the 0.5 of the
projector is folded in at channel-build time). The wilson parameter w
and the mass are static (they are compile-time scalars of the
operator, not fields).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lattice import DIR_XP1, DIR_YP1, DIR_XM1, DIR_YM1
from .stencil import StencilCoeffs


def wilson_phases_from_coeffs(coeffs: StencilCoeffs, w: float = 1.0):
    """Recover the per-direction phase planes (0.5 * U_d_eff) from built
    Wilson hopping matrices: H_d[0,0] = -0.5 w U_d, so U_d/2 = -H_d[0,0]/w.
    Returns (4, 2, 2, Y, Xh) f32 planes."""
    u_half = -coeffs.hopping[..., 0, 0].astype(jnp.complex64) / w
    return jnp.stack([jnp.real(u_half), jnp.imag(u_half)], axis=2)


def _wilson_kernel(tile: int, y_len: int, w: float, alpha: float,
                   double_buffer: bool,
                   x_hbm, phase_ref, out_ref, xwin, sems):
    """One Y-tile. phase_ref: (4, 2, 2, T, Xh) VMEM block of 0.5*U_d;
    x window/sems identical to pallas_dslash._dslash_kernel."""
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    def window_dmas(slot, tile_idx):
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
    y0 = t * tile
    rows = y0 + jax.lax.broadcasted_iota(jnp.int32, (tile, xh_len), 0)
    row_par = rows % 2

    for q in (0, 1):
        p = 1 - q
        direct = (row_par == q)

        # Pulled neighbor spinors per direction: [(spin0_re, spin0_im,
        # spin1_re, spin1_im) x 4 dirs], same shift scheme as the generic
        # kernel (sublane-offset rows for +-y, lane roll + row-parity
        # select for +-x).
        nbr = {}
        for d in (DIR_XP1, DIR_YP1, DIR_XM1, DIR_YM1):
            nbr[d] = []
        for s in (0, 1):
            same_re = xwin[p, s, 0, 8:tile + 8, :]
            same_im = xwin[p, s, 1, 8:tile + 8, :]
            up_re = xwin[p, s, 0, 9:tile + 9, :]
            up_im = xwin[p, s, 1, 9:tile + 9, :]
            dn_re = xwin[p, s, 0, 7:tile + 7, :]
            dn_im = xwin[p, s, 1, 7:tile + 7, :]
            rolm_re = pltpu.roll(same_re, xh_len - 1, 1)
            rolm_im = pltpu.roll(same_im, xh_len - 1, 1)
            rolp_re = pltpu.roll(same_re, 1, 1)
            rolp_im = pltpu.roll(same_im, 1, 1)
            nbr[DIR_XP1].append((jnp.where(direct, same_re, rolm_re),
                                 jnp.where(direct, same_im, rolm_im)))
            nbr[DIR_XM1].append((jnp.where(direct, rolp_re, same_re),
                                 jnp.where(direct, rolp_im, same_im)))
            nbr[DIR_YP1].append((up_re, up_im))
            nbr[DIR_YM1].append((dn_re, dn_im))

        # Clover + mass: alpha * x.
        acc = [[alpha * xwin[q, s, c, 8:tile + 8, :] for c in (0, 1)]
               for s in (0, 1)]

        for d in (DIR_XP1, DIR_YP1, DIR_XM1, DIR_YM1):
            ur = phase_ref[d, q, 0]
            ui = phase_ref[d, q, 1]
            # t_s = (0.5 U_d) * v_s per spin.
            ts = []
            for (vr, vi) in nbr[d]:
                ts.append((ur * vr - ui * vi, ur * vi + ui * vr))
            (t0r, t0i), (t1r, t1i) = ts
            # Diagonal: -w * t_s on both spins.
            if w == 1.0:
                acc[0][0] -= t0r
                acc[0][1] -= t0i
                acc[1][0] -= t1r
                acc[1][1] -= t1i
            else:
                acc[0][0] -= w * t0r
                acc[0][1] -= w * t0i
                acc[1][0] -= w * t1r
                acc[1][1] -= w * t1i
            # Off-diagonal projector couplings.
            if d == DIR_XP1:       # [[., +1], [+1, .]]
                acc[0][0] += t1r
                acc[0][1] += t1i
                acc[1][0] += t0r
                acc[1][1] += t0i
            elif d == DIR_XM1:     # [[., -1], [-1, .]]
                acc[0][0] -= t1r
                acc[0][1] -= t1i
                acc[1][0] -= t0r
                acc[1][1] -= t0i
            elif d == DIR_YP1:     # [[., -i], [+i, .]]
                acc[0][0] += t1i   # -i*t1: re=+im, im=-re
                acc[0][1] -= t1r
                acc[1][0] -= t0i   # +i*t0: re=-im, im=+re
                acc[1][1] += t0r
            else:                  # DIR_YM1: [[., +i], [-i, .]]
                acc[0][0] -= t1i
                acc[0][1] += t1r
                acc[1][0] += t0i
                acc[1][1] -= t0r

        for s in (0, 1):
            out_ref[q, s, 0] = acc[s][0]
            out_ref[q, s, 1] = acc[s][1]


def make_pallas_wilson_shaped(y_len: int, xh: int, w: float, mass: float,
                              tile: int = 32, interpret: bool = False,
                              double_buffer: bool = True):
    """Shape-only factory for the phase-streaming Wilson Dslash.
    Returns apply_fn(phase_planes, x_planes) -> out_planes."""
    n_slots = 2 if double_buffer else 1

    def vmem_bytes(t):
        per_row = xh * 4
        phases = 4 * 2 * 2 * t * per_row * 2
        out = 2 * 2 * 2 * t * per_row * 2
        xwin = n_slots * 2 * 2 * 2 * (t + 16) * per_row
        return phases + out + xwin

    while tile > 8 and vmem_bytes(tile) > 11 * 1024 * 1024:
        tile -= 8
    if y_len % tile:
        tile = int(np.gcd(tile, y_len))
    if y_len % 8 or tile % 8:
        raise ValueError(
            f"pallas wilson needs Y and tile multiples of 8; got "
            f"Y={y_len}, tile={tile}")
    if not interpret and xh % 128:
        raise ValueError(
            f"pallas wilson needs Xh (= X/2) a multiple of 128 lanes; "
            f"got Xh={xh}")
    grid = (y_len // tile,)
    alpha = 2.0 * w + mass
    kernel = functools.partial(_wilson_kernel, tile, y_len, float(w),
                               float(alpha), double_buffer)

    def apply_fn(phase_pl, x_pl):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # x in HBM
                pl.BlockSpec((4, 2, 2, tile, xh),
                             lambda t: (0, 0, 0, t, 0)),
            ],
            out_specs=pl.BlockSpec((2, 2, 2, tile, xh),
                                   lambda t: (0, 0, 0, t, 0)),
            out_shape=jax.ShapeDtypeStruct((2, 2, 2, y_len, xh),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n_slots, 2, 2, 2, tile + 16, xh), jnp.float32),
                pltpu.SemaphoreType.DMA((n_slots, 3)),
            ],
            interpret=interpret,
        )(x_pl, phase_pl)

    return apply_fn


# ---------------------------------------------------------------------------
# Row-parity-split, rank-1-projector Wilson kernel.
#
# Two VPU savings over _wilson_kernel above:
#   1. The split layout (see pallas_dslash.py: x as (2p, 2r, 2s, 2ri,
#      Yh, Xh)) makes every +-x pull a pure lane roll and every +-y pull
#      a sublane slice - the 8 row-parity jnp.where selects per dest
#      parity disappear.
#   2. For w == 1 every Wilson projector is RANK-1:
#          P_xp v = (a, -a),   a = v1 - v0
#          P_xm v = (b,  b),   b = -(v0 + v1)
#          P_yp v = (c, -i c), c = -(v0 + i v1)
#          P_ym v = (e,  i e), e = -(v0 - i v1)
#      so each direction costs ONE complex multiply t = (U_d/2) * comb
#      on the pre-combined spinor instead of one per spin - half the
#      multiply work of the interleaved kernel. The second spin row is
#      t scaled by a unit in {-1, +1, -i, +i}: sign flips / re-im swaps.
# ---------------------------------------------------------------------------


def wilson_phases_split(phase_pl):
    """Interleaved (4, 2p, 2ri, Y, Xh) phase planes -> split layout
    (4, 2p, 2r, 2ri, Yh, Xh)."""
    four, p2, ri2, y_len, xh = phase_pl.shape
    v = phase_pl.reshape(4, p2, ri2, y_len // 2, 2, xh)
    return jnp.transpose(v, (0, 1, 4, 2, 3, 5))


def _wilson_split_kernel(tile: int, yh_len: int, alpha: float,
                         double_buffer: bool,
                         x_hbm, phase_ref, out_ref, xwin, sems):
    """One Yh-tile. phase_ref: (4, 2p, 2r, 2ri, T, Xh) VMEM block of
    0.5*U_d at the DEST site; xwin: (slots, 2p, 2r, 2s, 2ri, T+16, Xh)."""
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

    for q in (0, 1):
        p = 1 - q
        for r in (0, 1):
            o = 1 - r
            # Source spinor planes. x dirs read half (p, r) body rows;
            # y dirs read half (p, o) at the split-lattice row offsets.
            sx0r = xwin[p, r, 0, 0, 8:tile + 8, :]
            sx0i = xwin[p, r, 0, 1, 8:tile + 8, :]
            sx1r = xwin[p, r, 1, 0, 8:tile + 8, :]
            sx1i = xwin[p, r, 1, 1, 8:tile + 8, :]
            if r == 0:
                up = (xwin[p, o, 0, 0, 8:tile + 8, :],
                      xwin[p, o, 0, 1, 8:tile + 8, :],
                      xwin[p, o, 1, 0, 8:tile + 8, :],
                      xwin[p, o, 1, 1, 8:tile + 8, :])
                dn = (xwin[p, o, 0, 0, 7:tile + 7, :],
                      xwin[p, o, 0, 1, 7:tile + 7, :],
                      xwin[p, o, 1, 0, 7:tile + 7, :],
                      xwin[p, o, 1, 1, 7:tile + 7, :])
            else:
                up = (xwin[p, o, 0, 0, 9:tile + 9, :],
                      xwin[p, o, 0, 1, 9:tile + 9, :],
                      xwin[p, o, 1, 0, 9:tile + 9, :],
                      xwin[p, o, 1, 1, 9:tile + 9, :])
                dn = (xwin[p, o, 0, 0, 8:tile + 8, :],
                      xwin[p, o, 0, 1, 8:tile + 8, :],
                      xwin[p, o, 1, 0, 8:tile + 8, :],
                      xwin[p, o, 1, 1, 8:tile + 8, :])

            # Rank-1 combines (2 vector adds each).
            axp_r, axp_i = sx1r - sx0r, sx1i - sx0i          # v1 - v0
            axm_r, axm_i = -(sx0r + sx1r), -(sx0i + sx1i)    # -(v0+v1)
            # x-dir lane alignment: r == q -> +x same lane, -x roll +1;
            # r != q -> +x roll -1, -x same lane.
            if r == q:
                axm_r = pltpu.roll(axm_r, 1, 1)
                axm_i = pltpu.roll(axm_i, 1, 1)
            else:
                axp_r = pltpu.roll(axp_r, xh_len - 1, 1)
                axp_i = pltpu.roll(axp_i, xh_len - 1, 1)
            u0r, u0i, u1r, u1i = up
            d0r, d0i, d1r, d1i = dn
            ayp_r, ayp_i = -(u0r - u1i), -(u0i + u1r)  # -(v0 + i v1)
            aym_r, aym_i = -(d0r + d1i), -(d0i - d1r)  # -(v0 - i v1)

            # One complex multiply per direction.
            pxp_r = phase_ref[DIR_XP1, q, r, 0]
            pxp_i = phase_ref[DIR_XP1, q, r, 1]
            txp_r = pxp_r * axp_r - pxp_i * axp_i
            txp_i = pxp_r * axp_i + pxp_i * axp_r
            pxm_r = phase_ref[DIR_XM1, q, r, 0]
            pxm_i = phase_ref[DIR_XM1, q, r, 1]
            txm_r = pxm_r * axm_r - pxm_i * axm_i
            txm_i = pxm_r * axm_i + pxm_i * axm_r
            pyp_r = phase_ref[DIR_YP1, q, r, 0]
            pyp_i = phase_ref[DIR_YP1, q, r, 1]
            typ_r = pyp_r * ayp_r - pyp_i * ayp_i
            typ_i = pyp_r * ayp_i + pyp_i * ayp_r
            pym_r = phase_ref[DIR_YM1, q, r, 0]
            pym_i = phase_ref[DIR_YM1, q, r, 1]
            tym_r = pym_r * aym_r - pym_i * aym_i
            tym_i = pym_r * aym_i + pym_i * aym_r

            # Spin rows: out0 = alpha x0 + t_xp + t_xm + t_yp + t_ym;
            # out1 = alpha x1 - t_xp + t_xm - i t_yp + i t_ym.
            x0r = xwin[q, r, 0, 0, 8:tile + 8, :]
            x0i = xwin[q, r, 0, 1, 8:tile + 8, :]
            x1r = xwin[q, r, 1, 0, 8:tile + 8, :]
            x1i = xwin[q, r, 1, 1, 8:tile + 8, :]
            out_ref[q, r, 0, 0] = (alpha * x0r + (txp_r + txm_r)
                                   + (typ_r + tym_r))
            out_ref[q, r, 0, 1] = (alpha * x0i + (txp_i + txm_i)
                                   + (typ_i + tym_i))
            out_ref[q, r, 1, 0] = (alpha * x1r + (txm_r - txp_r)
                                   + (typ_i - tym_i))
            out_ref[q, r, 1, 1] = (alpha * x1i + (txm_i - txp_i)
                                   + (tym_r - typ_r))


def make_pallas_wilson_split_shaped(y_len: int, xh: int, w: float,
                                    mass: float, tile: int = 32,
                                    interpret: bool = False,
                                    double_buffer: bool = True):
    """Split-layout rank-1 Wilson factory (w must be 1.0 - the rank-1
    projector factorization only holds there; reference default).
    apply_fn(phase_split, x_split) -> out_split with x/out in the
    pallas_dslash split layout (2p, 2r, 2s, 2ri, Yh, Xh) and phases
    (4, 2p, 2r, 2ri, Yh, Xh)."""
    if w != 1.0:
        raise ValueError(
            f"split wilson kernel requires w == 1 (rank-1 projectors); "
            f"got w={w} - use make_pallas_wilson_shaped")
    if y_len % 2:
        raise ValueError(f"split wilson needs even Y; got Y={y_len}")
    yh_len = y_len // 2
    n_slots = 2 if double_buffer else 1

    def vmem_bytes(t):
        per_row = xh * 4
        phases = 2 * (4 * 4 * 2 * t * per_row)
        out = 2 * (4 * 2 * 2 * t * per_row)
        xwin = n_slots * 4 * 2 * 2 * (t + 16) * per_row
        return phases + out + xwin

    while tile > 8 and vmem_bytes(tile) > 11 * 1024 * 1024:
        tile -= 8
    if yh_len % tile:
        tile = int(np.gcd(tile, yh_len))
    if yh_len % 8 or tile % 8:
        raise ValueError(
            f"split wilson needs Y/2 and tile multiples of 8; got "
            f"Y={y_len}, tile={tile}")
    if not interpret and xh % 128:
        raise ValueError(
            f"split wilson needs Xh a multiple of 128 lanes; got Xh={xh}")
    grid = (yh_len // tile,)
    alpha = 2.0 * w + mass
    kernel = functools.partial(_wilson_split_kernel, tile, yh_len,
                               float(alpha), double_buffer)

    def apply_fn(phase_pl, x_pl):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # x in HBM
                pl.BlockSpec((4, 2, 2, 2, tile, xh),
                             lambda t: (0, 0, 0, 0, t, 0)),
            ],
            out_specs=pl.BlockSpec((2, 2, 2, 2, tile, xh),
                                   lambda t: (0, 0, 0, 0, t, 0)),
            out_shape=jax.ShapeDtypeStruct((2, 2, 2, 2, yh_len, xh),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n_slots, 2, 2, 2, 2, tile + 16, xh),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((n_slots, 3)),
            ],
            interpret=interpret,
        )(x_pl, phase_pl)

    return apply_fn


# ---------------------------------------------------------------------------
# Rank-1 variant in the INTERLEAVED layout: same window/DMA structure as
# _wilson_kernel (proven fastest here), but with the w == 1 rank-1
# projector factorization doing ONE complex multiply per direction on
# pre-combined spinors (see the split-kernel comment above for the
# algebra). The combines commute with lane rolls and row selects, so
# they are computed once per source parity and THEN pulled.
# ---------------------------------------------------------------------------


def _wilson_rank1_kernel(tile: int, y_len: int, alpha: float,
                         double_buffer: bool, halo_frame: bool,
                         x_hbm, phase_ref, out_ref, xwin, sems):
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    def window_dmas(slot, tile_idx):
        y0 = tile_idx * tile
        if halo_frame:
            # x_hbm carries an 8-row halo frame on each side (sharded
            # path: halos exchanged over ICI before the kernel); body row
            # y lives at frame row y + 8, so the three window segments
            # are contiguous non-wrapping reads.
            dn_start = pl.multiple_of(y0, 8)
            body_start = pl.multiple_of(y0 + 8, 8)
            up_start = pl.multiple_of(y0 + tile + 8, 8)
        else:
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
    y0 = t * tile
    rows = y0 + jax.lax.broadcasted_iota(jnp.int32, (tile, xh_len), 0)
    row_par = rows % 2

    for q in (0, 1):
        p = 1 - q
        direct = (row_par == q)

        # Window-row combines on the source parity (computed once, then
        # pulled): x combines on body rows, y combines on the shifted
        # row slices.
        b0r = xwin[p, 0, 0, 8:tile + 8, :]
        b0i = xwin[p, 0, 1, 8:tile + 8, :]
        b1r = xwin[p, 1, 0, 8:tile + 8, :]
        b1i = xwin[p, 1, 1, 8:tile + 8, :]
        axp_r, axp_i = b1r - b0r, b1i - b0i            # v1 - v0
        axm_r, axm_i = -(b0r + b1r), -(b0i + b1i)      # -(v0 + v1)
        # +x: same lane on direct rows, lane roll -1 elsewhere;
        # -x: lane roll +1 on direct rows, same lane elsewhere.
        axp_sr = jnp.where(direct, axp_r, pltpu.roll(axp_r, xh_len - 1, 1))
        axp_si = jnp.where(direct, axp_i, pltpu.roll(axp_i, xh_len - 1, 1))
        axm_sr = jnp.where(direct, pltpu.roll(axm_r, 1, 1), axm_r)
        axm_si = jnp.where(direct, pltpu.roll(axm_i, 1, 1), axm_i)

        u0r = xwin[p, 0, 0, 9:tile + 9, :]
        u0i = xwin[p, 0, 1, 9:tile + 9, :]
        u1r = xwin[p, 1, 0, 9:tile + 9, :]
        u1i = xwin[p, 1, 1, 9:tile + 9, :]
        ayp_r, ayp_i = -(u0r - u1i), -(u0i + u1r)      # -(v0 + i v1)
        d0r = xwin[p, 0, 0, 7:tile + 7, :]
        d0i = xwin[p, 0, 1, 7:tile + 7, :]
        d1r = xwin[p, 1, 0, 7:tile + 7, :]
        d1i = xwin[p, 1, 1, 7:tile + 7, :]
        aym_r, aym_i = -(d0r + d1i), -(d0i - d1r)      # -(v0 - i v1)

        # One complex multiply per direction.
        pr = phase_ref[DIR_XP1, q, 0]
        pi = phase_ref[DIR_XP1, q, 1]
        txp_r = pr * axp_sr - pi * axp_si
        txp_i = pr * axp_si + pi * axp_sr
        pr = phase_ref[DIR_XM1, q, 0]
        pi = phase_ref[DIR_XM1, q, 1]
        txm_r = pr * axm_sr - pi * axm_si
        txm_i = pr * axm_si + pi * axm_sr
        pr = phase_ref[DIR_YP1, q, 0]
        pi = phase_ref[DIR_YP1, q, 1]
        typ_r = pr * ayp_r - pi * ayp_i
        typ_i = pr * ayp_i + pi * ayp_r
        pr = phase_ref[DIR_YM1, q, 0]
        pi = phase_ref[DIR_YM1, q, 1]
        tym_r = pr * aym_r - pi * aym_i
        tym_i = pr * aym_i + pi * aym_r

        # out0 = alpha x0 + t_xp + t_xm + t_yp + t_ym
        # out1 = alpha x1 - t_xp + t_xm - i t_yp + i t_ym
        out_ref[q, 0, 0] = (alpha * xwin[q, 0, 0, 8:tile + 8, :]
                            + (txp_r + txm_r) + (typ_r + tym_r))
        out_ref[q, 0, 1] = (alpha * xwin[q, 0, 1, 8:tile + 8, :]
                            + (txp_i + txm_i) + (typ_i + tym_i))
        out_ref[q, 1, 0] = (alpha * xwin[q, 1, 0, 8:tile + 8, :]
                            + (txm_r - txp_r) + (typ_i - tym_i))
        out_ref[q, 1, 1] = (alpha * xwin[q, 1, 1, 8:tile + 8, :]
                            + (txm_i - txp_i) + (tym_r - typ_r))


def make_pallas_wilson_rank1_shaped(y_len: int, xh: int, w: float,
                                    mass: float, tile: int = 32,
                                    interpret: bool = False,
                                    double_buffer: bool = True,
                                    halo_frame: bool = False):
    """Interleaved-layout rank-1 Wilson factory (w must be 1.0). Same
    plane layouts as make_pallas_wilson_shaped: phases (4, 2p, 2ri, Y,
    Xh), x/out (2p, 2s, 2ri, Y, Xh).

    ``halo_frame``: the sharded-Dslash variant - x planes carry an 8-row
    halo on each side of the Y axis ((2, 2, 2, y_len + 16, Xh); body row
    y at frame row y + 8) and the kernel reads the frame instead of
    wrapping periodically. ``y_len`` is then the LOCAL (per-shard) row
    count; shard_dslash.make_sharded_pallas_wilson exchanges the halos
    over ICI with ppermute and calls this per shard."""
    if w != 1.0:
        raise ValueError(
            f"rank-1 wilson kernel requires w == 1 (rank-1 projectors); "
            f"got w={w} - use make_pallas_wilson_shaped")
    n_slots = 2 if double_buffer else 1

    def vmem_bytes(t):
        per_row = xh * 4
        phases = 4 * 2 * 2 * t * per_row * 2
        out = 2 * 2 * 2 * t * per_row * 2
        xwin = n_slots * 2 * 2 * 2 * (t + 16) * per_row
        return phases + out + xwin

    while tile > 8 and vmem_bytes(tile) > 11 * 1024 * 1024:
        tile -= 8
    if y_len % tile:
        tile = int(np.gcd(tile, y_len))
    if y_len % 8 or tile % 8:
        raise ValueError(
            f"rank-1 wilson needs Y and tile multiples of 8; got "
            f"Y={y_len}, tile={tile}")
    if not interpret and xh % 128:
        raise ValueError(
            f"rank-1 wilson needs Xh (= X/2) a multiple of 128 lanes; "
            f"got Xh={xh}")
    grid = (y_len // tile,)
    alpha = 2.0 * w + mass
    kernel = functools.partial(_wilson_rank1_kernel, tile, y_len,
                               float(alpha), double_buffer,
                               bool(halo_frame))

    def apply_fn(phase_pl, x_pl):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # x in HBM
                pl.BlockSpec((4, 2, 2, tile, xh),
                             lambda t: (0, 0, 0, t, 0)),
            ],
            out_specs=pl.BlockSpec((2, 2, 2, tile, xh),
                                   lambda t: (0, 0, 0, t, 0)),
            out_shape=jax.ShapeDtypeStruct((2, 2, 2, y_len, xh),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n_slots, 2, 2, 2, tile + 16, xh), jnp.float32),
                pltpu.SemaphoreType.DMA((n_slots, 3)),
            ],
            interpret=interpret,
        )(x_pl, phase_pl)

    return apply_fn
