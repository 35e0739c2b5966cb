"""Headline benchmark: Wilson Dslash effective HBM bandwidth on TPU.

The reference publishes no performance numbers (BASELINE.md); the driver
baseline target is "Dslash > 70% of v5e HBM roofline". The Dslash is
HBM-bound (arithmetic intensity < 1 flop/byte), so the honest headline is
effective bandwidth = minimum-traffic bytes / wall time:

    bytes/apply = clover + hopping + x(read) + out(write)
                = (nc^2 + 4 nc^2 + 2 nc) * V * sizeof(c64)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the fraction of the v5e HBM roofline (~819 GB/s).

Run with no args on the real chip; --size / --iters / --dtype to vary.
"""

import argparse
import json
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=2048)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--dtype", default="complex64")
    p.add_argument("--hbm-roofline-gbs", type=float, default=819.0,
                   help="TPU v5e HBM bandwidth")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from qmg_tpu.lattice import Lattice2D
    from qmg_tpu.operators import Wilson2D
    from qmg_tpu.stencil import apply_M
    from qmg_tpu import u1
    from qmg_tpu.rng import QMGRandom

    dtype = jnp.dtype(args.dtype)
    L = args.size
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    gauge = jnp.asarray(u1.gauss_gauge_u1(lat, rng, beta=6.0), dtype=dtype)
    op = Wilson2D(lat, mass=-0.075, gauge=gauge, dtype=dtype)
    coeffs = op.coeffs
    x = jnp.asarray(rng.gaussian_cv(lat), dtype=dtype)
    x = x / jnp.sqrt(jnp.sum(jnp.abs(x) ** 2))

    n_iters = args.iters

    @jax.jit
    def chain(coeffs, x):
        def body(_, x):
            y = apply_M(coeffs, x)
            # renormalize so the chain neither explodes nor denormalizes
            return y / jnp.sqrt(jnp.sum(jnp.abs(y) ** 2))
        return jax.lax.fori_loop(0, n_iters, body, x)

    for _ in range(args.warmup):
        chain(coeffs, x).block_until_ready()
    t0 = time.perf_counter()
    chain(coeffs, x).block_until_ready()
    dt = time.perf_counter() - t0

    nc = lat.nc
    itemsize = jnp.zeros((), dtype=dtype).itemsize
    bytes_per_apply = (nc * nc + 4 * nc * nc + 2 * nc) * lat.volume * itemsize
    # The renormalization adds one read+write of x (2 nc V); count it so
    # the number is honest about what the loop actually moves.
    bytes_per_iter = bytes_per_apply + 2 * nc * lat.volume * itemsize
    gbs = bytes_per_iter * n_iters / dt / 1e9
    frac = gbs / args.hbm_roofline_gbs

    sites_per_sec = lat.volume * n_iters / dt
    print(f"# wilson dslash {L}x{L} {args.dtype}: {dt*1e3/n_iters:.3f} ms/"
          f"apply, {sites_per_sec/1e9:.2f} Gsites/s, {gbs:.1f} GB/s "
          f"({100*frac:.1f}% of {args.hbm_roofline_gbs} GB/s roofline) on "
          f"{jax.devices()[0].device_kind}", file=sys.stderr)
    print(json.dumps({
        "metric": "wilson_dslash_effective_bandwidth",
        "value": round(gbs, 2),
        "unit": "GB/s",
        "vs_baseline": round(frac, 4),
    }))


if __name__ == "__main__":
    main()
