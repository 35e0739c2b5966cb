"""cshift correctness (reference test n00, tests/n00_cshift/cshift_2d_test.cpp).

The reference prints shifted grids for visual inspection on a 6x4 lattice
with dof 1 and 2; here the oracle is an explicit coordinate-based shift on
the unpacked (Y, X) grid, checked for all 4 directions, several lattice
shapes (including the degenerate X=2 / Y=1 wrap cases), both the
full-lattice pull and the half-lattice (parity-restricted) pull.
"""

import numpy as np
import pytest

from qmg_tpu.lattice import Lattice2D, eo_pack, eo_unpack
from qmg_tpu.cshift import (cshift_pull, cshift_pull_half, DIR_XP1, DIR_YP1,
                            DIR_XM1, DIR_YM1, ALL_DIRS)

DIR_DELTA = {DIR_XP1: (1, 0), DIR_YP1: (0, 1),
             DIR_XM1: (-1, 0), DIR_YM1: (0, -1)}


def grid_pull(grid, d):
    """Oracle: out[y, x] = grid[y + dy, x + dx] with periodic wrap."""
    dx, dy = DIR_DELTA[d]
    return np.roll(grid, shift=(-dy, -dx), axis=(0, 1))


# Note: Y=1 (or X=1) lattices are outside the eo-cshift domain - a
# distance-1 hop then wraps to the *same* parity, which breaks the
# even/odd decomposition in this framework and in the reference alike
# (its FROM_YP1 code writes the wrong sites for Y=1; never exercised).
@pytest.mark.parametrize("shape", [(6, 4), (4, 6), (8, 8), (2, 4), (4, 2),
                                   (2, 2)])
@pytest.mark.parametrize("dof", [1, 2])
def test_cshift_pull_matches_grid_oracle(shape, dof):
    xl, yl = shape
    lat = Lattice2D(xl, yl, dof)
    rng = np.random.default_rng(0)
    grid = (rng.normal(size=(yl, xl, dof))
            + 1j * rng.normal(size=(yl, xl, dof)))
    f = eo_pack(grid, lat)
    for d in ALL_DIRS:
        out = np.asarray(cshift_pull(f, d))
        expected = grid_pull(grid, d)
        got = eo_unpack(out, lat)
        np.testing.assert_allclose(got, expected, rtol=0, atol=0)


@pytest.mark.parametrize("src_parity", [0, 1])
def test_cshift_pull_half_matches_full(src_parity):
    lat = Lattice2D(8, 6, 3)
    rng = np.random.default_rng(1)
    f = rng.normal(size=lat.cv_shape()) + 1j * rng.normal(
        size=lat.cv_shape())
    for d in ALL_DIRS:
        full = np.asarray(cshift_pull(f, d))
        half = np.asarray(cshift_pull_half(f[src_parity], src_parity, d))
        dest = 1 - src_parity
        np.testing.assert_allclose(half, full[dest], rtol=0, atol=0)


def test_eo_pack_roundtrip_and_flat_order():
    """eo layout must reproduce the reference's flat eo index order."""
    lat = Lattice2D(6, 4, 1)
    grid = np.arange(24, dtype=np.float64).reshape(4, 6, 1)
    f = eo_pack(grid, lat)
    flat = f.reshape(-1)
    for x in range(6):
        for y in range(4):
            assert flat[lat.coord_to_index(x, y)] == grid[y, x, 0]
    np.testing.assert_array_equal(eo_unpack(f, lat), grid)
    # index_to_coord is the inverse map.
    for i in range(lat.volume):
        x, y = lat.index_to_coord(i)
        assert lat.coord_to_index(x, y) == i
