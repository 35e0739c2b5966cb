"""U(1) gauge toolkit (reference test n01, tests/n01_u1_test/u1_test.cpp):
plaquette/topo on unit and random fields, gauge-transform invariance,
APE smearing, config write->read roundtrip, instanton charge, and loading
the shipped heatbath fixtures.
"""

import os

import numpy as np
import pytest

from qmg_tpu.lattice import Lattice2D
from qmg_tpu import u1
from qmg_tpu.rng import QMGRandom

L = 32


def test_unit_gauge_observables():
    lat = Lattice2D(L, L, 1)
    g = u1.unit_gauge_u1(lat)
    assert abs(complex(u1.get_plaquette_u1(g, lat)) - 1.0) < 1e-14
    assert abs(float(u1.get_topo_u1(g, lat))) < 1e-10


def test_gauge_transform_invariance():
    lat = Lattice2D(L, L, 1)
    rng = QMGRandom(1337)
    g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    plaq0 = complex(u1.get_plaquette_u1(g, lat))
    topo0 = float(u1.get_topo_u1(g, lat))
    trans = u1.rand_trans_u1(lat, rng)
    g2 = u1.apply_gauge_trans_u1(g, trans)
    assert abs(complex(u1.get_plaquette_u1(g2, lat)) - plaq0) < 1e-12
    assert abs(float(u1.get_topo_u1(g2, lat)) - topo0) < 1e-9


def test_ape_smear_raises_plaquette():
    lat = Lattice2D(L, L, 1)
    rng = QMGRandom(1337)
    g = u1.gauss_gauge_u1(lat, rng, beta=3.0)
    plaq0 = float(np.real(complex(u1.get_plaquette_u1(g, lat))))
    topo0 = float(u1.get_topo_u1(g, lat))
    gs = u1.apply_ape_smear_u1(g, lat, alpha=0.5, n_iter=5)
    plaq1 = float(np.real(complex(u1.get_plaquette_u1(gs, lat))))
    topo1 = float(u1.get_topo_u1(gs, lat))
    assert plaq1 > plaq0
    # Topological charge is integer-quantized and smearing-stable.
    assert abs(topo1 - round(topo1)) < 1e-6
    assert abs(topo0 - round(topo0)) < 1e-6


def test_write_read_roundtrip(tmp_path):
    lat = Lattice2D(16, 16, 1)
    rng = QMGRandom(7)
    g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    path = os.path.join(tmp_path, "cfg.dat")
    u1.write_gauge_u1(g, lat, path)
    g2 = u1.read_gauge_u1(lat, path)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g), atol=1e-14)


def test_instanton_charge():
    lat = Lattice2D(L, L, 1)
    g = np.asarray(u1.unit_gauge_u1(lat))
    # Charge 1, as the reference exercises (tests/n01_u1_test/u1_test.cpp:85).
    q = 1.0
    gi = u1.create_instanton_u1(g, lat, q, L // 2, L // 2)
    topo = float(u1.get_topo_u1(gi, lat))
    assert abs(topo - q) < 0.25  # instanton construction is approximate


def test_noncompact_instanton_charge():
    lat = Lattice2D(L, L, 1)
    ph = np.zeros((2, 2, lat.y_len, lat.xh))
    q = 2.0
    ph2 = u1.create_noncompact_instanton_u1(ph, lat, q)
    g = np.exp(1j * ph2)
    topo = float(u1.get_topo_u1(g, lat))
    assert abs(topo - q / 2) < 0.3  # flux convention: charge q/2


def test_shipped_config_plaquette(cfg_dir):
    """Loading the shipped beta=6 fixture must reproduce 2D U(1)
    thermodynamics: <plaq> ~ I1(beta)/I0(beta) ~ 0.9135 at beta=6."""
    lat = Lattice2D(32, 32, 1)
    g = u1.read_gauge_u1(lat, os.path.join(cfg_dir, "l32t32b60_heatbath.dat"))
    plaq = complex(u1.get_plaquette_u1(g, lat))
    assert abs(plaq.imag) < 0.02
    assert 0.88 < plaq.real < 0.94
    topo = float(u1.get_topo_u1(g, lat))
    assert abs(topo - round(topo)) < 1e-6


def test_heatbath_plaquette_thermalizes():
    """Non-compact heatbath must thermalize to the right plaquette
    (reference n14, tests/n14_u1_heatbath/u1_heatbath.cpp)."""
    from scipy import special
    beta = 6.0
    lat = Lattice2D(16, 16, 1)
    rng = QMGRandom(1337)
    ph = np.zeros((2, 2, lat.y_len, lat.xh))
    ph = u1.heatbath_noncompact_update(ph, lat, beta, 60, rng)
    plaqs = []
    for _ in range(20):
        ph = u1.heatbath_noncompact_update(ph, lat, beta, 5, rng)
        g = u1.phases_to_links(ph)
        plaqs.append(float(np.real(complex(u1.get_plaquette_u1(g, lat)))))
    mean = np.mean(plaqs)
    # For the non-compact action the plaquette expectation is
    # exp(-1/(2 beta)) (gaussian); compact would be I1/I0.
    expect = np.exp(-1.0 / (2.0 * beta))
    assert abs(mean - expect) < 0.02


def test_lorentz_gauge_fix():
    """Lorenz/Landau gauge fixing (the reference declares it,
    u1_utils.h:511-542, but ships an empty loop body - implemented here
    via the exact FFT Laplacian solve). Oracles: the fixed field
    satisfies max|div theta| < tol, and every gauge-invariant
    observable (plaquette, topo charge) is unchanged."""
    lat = Lattice2D(32, 32, 1)
    rng = QMGRandom(1337)
    g = np.asarray(u1.gauss_gauge_u1(lat, rng, beta=6.0))
    plaq0 = complex(u1.get_plaquette_u1(g, lat))
    topo0 = float(np.real(np.asarray(u1.get_topo_u1(g, lat))))

    fixed, resid = u1.lorentz_gauge_fix_u1(g, lat, tol=1e-9)
    assert resid < 1e-9
    # Direct check of the Landau condition on the returned field.
    from qmg_tpu.lattice import eo_unpack
    theta = np.stack([eo_unpack(np.angle(fixed[mu]), lat.with_nc(1))
                      for mu in range(2)])
    div = ((theta[0] - np.roll(theta[0], 1, axis=1))
           + (theta[1] - np.roll(theta[1], 1, axis=0)))
    assert float(np.max(np.abs(div))) < 1e-9
    # Gauge-invariant observables unchanged.
    plaq1 = complex(u1.get_plaquette_u1(fixed, lat))
    topo1 = float(np.real(np.asarray(u1.get_topo_u1(fixed, lat))))
    np.testing.assert_allclose(plaq1.real, plaq0.real, atol=1e-10)
    np.testing.assert_allclose(plaq1.imag, plaq0.imag, atol=1e-10)
    np.testing.assert_allclose(topo1, topo0, atol=1e-8)
