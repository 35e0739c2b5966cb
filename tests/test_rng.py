"""std::mt19937 stream parity (the reference determinism anchor,
tests/n13_wilson_kcycle/wilson_kcycle.cpp:64).

Oracle values produced by a g++-compiled program:

    std::mt19937 gen(1337u);                      // raw draws
    std::uniform_real_distribution<double>(-1, 2) // uniforms
    std::normal_distribution<double>(0, 1)        // normals
"""

import numpy as np

from qmg_tpu.rng import StdMT19937

ORACLE_RAW = [1125387415, 2407456957, 681542492, 913057000, 1194544295,
              2332513753, 1972751015, 145906010]
ORACLE_UNI = [0.68158925878491128, -0.36223705288114671,
              0.62924203552174851, -0.89808582901536704,
              -0.29383367510442582, 0.77633910476117851]
ORACLE_NRM = [-1.4274419926557007, 0.30062281890886849,
              -0.51204031918524262, 0.047334099056932206,
              0.50038387490525837, -1.4374424883598245]


def test_raw_stream_matches_libstdcxx():
    g = StdMT19937(1337)
    assert [g.raw() for _ in range(8)] == ORACLE_RAW


def test_uniform_real_matches_libstdcxx():
    g = StdMT19937(1337)
    got = [g.uniform(-1.0, 2.0) for _ in range(6)]
    np.testing.assert_allclose(got, ORACLE_UNI, rtol=0, atol=0)


def test_normal_matches_libstdcxx():
    g = StdMT19937(1337)
    got = [g.normal() for _ in range(6)]
    np.testing.assert_allclose(got, ORACLE_NRM, rtol=1e-15, atol=0)


def test_refill_boundary():
    """Stream stays exact across the 624-word refill boundary."""
    g = StdMT19937(42)
    vals = [g.raw() for _ in range(1300)]
    g2 = StdMT19937(42)
    assert [g2.raw() for _ in range(1300)] == vals
    assert len(set(vals)) > 1290  # sanity: no stuck state


def test_heatbath_bit_exact_vs_cxx_oracle():
    """The non-compact heatbath driven by StdMT19937 reproduces a C++
    std::mt19937 + std::normal_distribution implementation of the
    reference sweep (u1/u1_utils.h:607-757) bit-for-bit.

    Oracle: 4x4, beta=6, 2 updates, seed 1337 (g++ / libstdc++)."""
    from qmg_tpu.lattice import Lattice2D, eo_unpack
    from qmg_tpu import u1

    oracle_first_rows = [
        (0.26332565145996267, -0.020930124943424194),
        (0.46057326116245878, 0.36725073711624517),
        (-0.038260695492047136, 0.10991781466761363),
    ]
    lat = Lattice2D(4, 4, 1)
    rng = StdMT19937(1337)
    ph = np.zeros((2, 2, lat.y_len, lat.xh))
    ph = u1.heatbath_noncompact_update(ph, lat, 6.0, 2, rng)
    grid = np.stack([eo_unpack(ph[mu], lat) for mu in range(2)])
    got = [(grid[0, 0, 0], grid[1, 0, 0]),
           (grid[0, 0, 1], grid[1, 0, 1]),
           (grid[0, 0, 2], grid[1, 0, 2])]
    for (gx, gy), (ox, oy) in zip(got, oracle_first_rows):
        assert gx == ox and gy == oy
