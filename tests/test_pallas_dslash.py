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


@pytest.mark.parametrize("kind", ["small", "split"])
@pytest.mark.parametrize("L,nc", [(16, 2), (16, 8), (32, 2)])
def test_split_layout_kernels_match_stencil(kind, L, nc):
    """Row-parity-split kernels (pure-roll neighbor pulls, no selects):
    the VMEM-resident small-lattice variant and the windowed split
    variant both match the jnp apply."""
    from qmg_tpu.stencil import make_coeffs
    from qmg_tpu.pallas_dslash import (
        x_to_planes_split, x_from_planes_split, _channels_from_coeffs_split,
        make_pallas_dslash_split_shaped, make_pallas_dslash_small_shaped)

    lat = Lattice2D(L, L, nc)
    rng = QMGRandom(1337)
    if nc == 2:
        g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
        op = Wilson2D(lat, -0.07, g, dtype=jnp.complex64)
        coeffs = op.coeffs
    else:
        cm = Lattice2D(L, L, nc * nc)
        clover = jnp.asarray(rng.gaussian_cv(cm).reshape(lat.cm_shape()),
                             jnp.complex64)
        hopping = jnp.stack([
            jnp.asarray(rng.gaussian_cv(cm).reshape(lat.cm_shape()),
                        jnp.complex64) for _ in range(4)])
        coeffs = make_coeffs(lat, clover=clover, hopping=hopping,
                             shift=-0.075, dtype=jnp.complex64)
    x = jnp.asarray(rng.gaussian_cv(lat), jnp.complex64)
    expect = np.asarray(apply_M(coeffs, x))

    xs = x_to_planes_split(x)
    np.testing.assert_allclose(np.asarray(x_from_planes_split(xs)),
                               np.asarray(x), atol=1e-6)
    ck, hk = _channels_from_coeffs_split(coeffs)
    if kind == "small":
        fn = make_pallas_dslash_small_shaped(nc, lat.y_len, lat.xh,
                                             interpret=True)
    else:
        fn = make_pallas_dslash_split_shaped(nc, lat.y_len, lat.xh,
                                             tile=8, interpret=True)
    got = np.asarray(x_from_planes_split(fn(ck, hk, xs)))
    scale = max(np.max(np.abs(expect)), 1.0)
    np.testing.assert_allclose(got, expect, atol=5e-5 * scale)


def test_small_kernel_rejects_oversized_operands():
    from qmg_tpu.pallas_dslash import make_pallas_dslash_small_shaped
    with pytest.raises(ValueError, match="VMEM"):
        make_pallas_dslash_small_shaped(8, 512, 256, interpret=True)


def test_pallas_wilson_split_rank1():
    """Split-layout rank-1 Wilson kernel (one cmul per direction, w=1)
    matches the jnp stencil apply."""
    from qmg_tpu.pallas_wilson import (make_pallas_wilson_split_shaped,
                                       wilson_phases_from_coeffs,
                                       wilson_phases_split)
    from qmg_tpu.pallas_dslash import (x_to_planes_split,
                                       x_from_planes_split)
    L = 16
    rng = QMGRandom(1337)
    lat = Lattice2D(L, L, 2)
    g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    for mass in (-0.07, 0.1):
        op = Wilson2D(lat, mass, g, dtype=jnp.complex64)
        x = jnp.asarray(rng.gaussian_cv(lat), dtype=jnp.complex64)
        expect = np.asarray(apply_M(op.coeffs, x))
        ph = wilson_phases_split(wilson_phases_from_coeffs(op.coeffs))
        fn = make_pallas_wilson_split_shaped(lat.y_len, lat.xh, 1.0, mass,
                                             tile=8, interpret=True)
        got = np.asarray(x_from_planes_split(fn(ph, x_to_planes_split(x))))
        np.testing.assert_allclose(got, expect, atol=5e-5)
    with pytest.raises(ValueError, match="rank-1"):
        make_pallas_wilson_split_shaped(16, 8, 0.9, 0.0, interpret=True)


def test_pallas_wilson_rank1_interleaved():
    """Interleaved rank-1 Wilson kernel matches the jnp stencil apply."""
    from qmg_tpu.pallas_wilson import (make_pallas_wilson_rank1_shaped,
                                       wilson_phases_from_coeffs)
    from qmg_tpu.pallas_dslash import x_to_planes, x_from_planes
    L = 16
    rng = QMGRandom(1337)
    lat = Lattice2D(L, L, 2)
    g = u1.gauss_gauge_u1(lat, rng, beta=6.0)
    for mass in (-0.07, 0.1):
        op = Wilson2D(lat, mass, g, dtype=jnp.complex64)
        x = jnp.asarray(rng.gaussian_cv(lat), dtype=jnp.complex64)
        expect = np.asarray(apply_M(op.coeffs, x))
        ph = wilson_phases_from_coeffs(op.coeffs)
        fn = make_pallas_wilson_rank1_shaped(lat.y_len, lat.xh, 1.0, mass,
                                             tile=8, interpret=True)
        got = np.asarray(x_from_planes(fn(ph, x_to_planes(x))))
        np.testing.assert_allclose(got, expect, atol=5e-5)
