"""Fused Pallas Dslash vs the jnp stencil apply (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.operators import Wilson2D, Staggered2D
from qmg_tpu.stencil import apply_M
from qmg_tpu.pallas_dslash import (make_pallas_dslash, x_to_planes,
                                   x_from_planes)
from qmg_tpu import u1
from qmg_tpu.rng import QMGRandom


@pytest.mark.parametrize("op_kind", ["wilson", "staggered"])
def test_pallas_matches_stencil(op_kind):
    L = 16
    rng = QMGRandom(1337)
    if op_kind == "wilson":
        lat = Lattice2D(L, L, 2)
        g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
        op = Wilson2D(lat, -0.07, g, dtype=jnp.complex64)
    else:
        lat = Lattice2D(L, L, 1)
        g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
        op = Staggered2D(lat, 0.1, g, dtype=jnp.complex64)
    x = jnp.asarray(rng.gaussian_cv(lat), dtype=jnp.complex64)

    expect = np.asarray(apply_M(op.coeffs, x))

    for tile in (8, 16):
        apply_fn, (cp, hp) = make_pallas_dslash(op.coeffs, tile=tile,
                                                interpret=True)
        out_planes = apply_fn(cp, hp, x_to_planes(x))
        got = np.asarray(x_from_planes(out_planes))
        np.testing.assert_allclose(got, expect, atol=5e-5)


def test_pallas_rejects_unaligned_lattice():
    lat = Lattice2D(12, 12, 1)
    g = u1.unit_gauge_u1(lat)
    op = Staggered2D(lat, 0.1, g, dtype=jnp.complex64)
    with pytest.raises(ValueError, match="multiples of 8"):
        make_pallas_dslash(op.coeffs, tile=8, interpret=True)


def test_pallas_bf16_coefficients():
    """Mixed-precision path: bf16 coefficient streams, f32 accumulate -
    matches the f32 apply to bf16 rounding."""
    L = 16
    rng = QMGRandom(1337)
    lat = Lattice2D(L, L, 2)
    g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    op = Wilson2D(lat, -0.07, g, dtype=jnp.complex64)
    x = jnp.asarray(rng.gaussian_cv(lat), dtype=jnp.complex64)
    expect = np.asarray(apply_M(op.coeffs, x))
    apply_fn, (cp, hp) = make_pallas_dslash(op.coeffs, tile=16,
                                            interpret=True)
    from qmg_tpu.pallas_dslash import make_pallas_dslash_shaped
    bf16_fn = make_pallas_dslash_shaped(2, L, lat.xh, tile=16,
                                        interpret=True,
                                        coeff_dtype=jnp.bfloat16)
    out = bf16_fn(cp.astype(jnp.bfloat16), hp.astype(jnp.bfloat16),
                  x_to_planes(x))
    got = np.asarray(x_from_planes(out))
    # bf16 has ~3 decimal digits; per-site sums of 10 terms -> ~1e-2 rel.
    scale = np.max(np.abs(expect))
    np.testing.assert_allclose(got, expect, atol=3e-2 * scale)


def test_pallas_wilson_phase_streaming():
    """Wilson-specialized kernel (stream 4 U(1) phases, constant spin
    projectors in-register) matches apply_M (pallas_wilson.py)."""
    from qmg_tpu.pallas_wilson import (make_pallas_wilson_shaped,
                                       wilson_phases_from_coeffs)
    L = 16
    rng = QMGRandom(1337)
    lat = Lattice2D(L, L, 2)
    g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    for mass, w in ((-0.07, 1.0), (0.1, 1.3)):
        op = Wilson2D(lat, mass, g, wilson_coeff=w, dtype=jnp.complex64)
        x = jnp.asarray(rng.gaussian_cv(lat), dtype=jnp.complex64)
        expect = np.asarray(apply_M(op.coeffs, x))
        ph = wilson_phases_from_coeffs(op.coeffs, w=w)
        fn = make_pallas_wilson_shaped(L, lat.xh, w, mass, tile=8,
                                       interpret=True)
        got = np.asarray(x_from_planes(fn(ph, x_to_planes(x))))
        np.testing.assert_allclose(got, expect, atol=5e-5)
