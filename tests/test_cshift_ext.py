"""Distance-2 and corner cshift directions.

The reference declares these in its direction enum
(/root/reference/cshift/cshift_2d.h:13-29: FROM_XP2/YP2/XM2/YM2 and the
four corners) but leaves them unimplemented (hard errors at
cshift_2d.h:120-129, :211-220). Here they are first-class: both families
preserve parity, so on the eo layout the distance-2 shifts are pure
rolls and the corners compose two distance-1 pulls. Oracle: explicit
coordinate shifts on the unpacked (Y, X) grid, as in test_n00_cshift.
"""

import numpy as np
import pytest

from qmg_tpu.lattice import Lattice2D, eo_pack, eo_unpack
from qmg_tpu.cshift import (cshift_pull, cshift_pull_half,
                            DIR_XP2, DIR_YP2, DIR_XM2, DIR_YM2,
                            DIR_XP1YP1, DIR_XM1YP1, DIR_XM1YM1,
                            DIR_XP1YM1, TWOLINK_DIRS, CORNER_DIRS)

DIR_DELTA = {
    DIR_XP2: (2, 0), DIR_YP2: (0, 2), DIR_XM2: (-2, 0), DIR_YM2: (0, -2),
    DIR_XP1YP1: (1, 1), DIR_XM1YP1: (-1, 1),
    DIR_XM1YM1: (-1, -1), DIR_XP1YM1: (1, -1),
}

EXT_DIRS = TWOLINK_DIRS + CORNER_DIRS


def grid_pull(grid, d):
    """Oracle: out[y, x] = grid[y + dy, x + dx] with periodic wrap."""
    dx, dy = DIR_DELTA[d]
    return np.roll(grid, shift=(-dy, -dx), axis=(0, 1))


def test_dir_tuples_match_reference_coefficient_order():
    # stencil/stencil_2d.h:28-39: twolink slots {+2X,+2Y,-2X,-2Y},
    # corner slots {+X+Y,-X+Y,-X-Y,+X-Y}.
    assert TWOLINK_DIRS == (DIR_XP2, DIR_YP2, DIR_XM2, DIR_YM2)
    assert CORNER_DIRS == (DIR_XP1YP1, DIR_XM1YP1, DIR_XM1YM1, DIR_XP1YM1)


@pytest.mark.parametrize("shape", [(6, 4), (4, 6), (8, 8), (4, 4), (2, 4),
                                   (4, 2)])
@pytest.mark.parametrize("dof", [1, 2])
def test_ext_cshift_pull_matches_grid_oracle(shape, dof):
    xl, yl = shape
    lat = Lattice2D(xl, yl, dof)
    rng = np.random.default_rng(0)
    grid = (rng.normal(size=(yl, xl, dof))
            + 1j * rng.normal(size=(yl, xl, dof)))
    f = eo_pack(grid, lat)
    for d in EXT_DIRS:
        out = np.asarray(cshift_pull(f, d))
        expected = grid_pull(grid, d)
        got = eo_unpack(out, lat)
        np.testing.assert_allclose(got, expected, rtol=0, atol=0,
                                   err_msg=f"direction {d}")


@pytest.mark.parametrize("src_parity", [0, 1])
def test_ext_cshift_pull_half_matches_full(src_parity):
    # Parity-preserving shifts: the half pull of parity p sources
    # parity p and lands on parity p.
    lat = Lattice2D(8, 6, 3)
    rng = np.random.default_rng(1)
    f = rng.normal(size=lat.cv_shape()) + 1j * rng.normal(
        size=lat.cv_shape())
    for d in EXT_DIRS:
        full = np.asarray(cshift_pull(f, d))
        half = np.asarray(cshift_pull_half(f[src_parity], src_parity, d))
        np.testing.assert_allclose(half, full[src_parity], rtol=0, atol=0,
                                   err_msg=f"direction {d}")
