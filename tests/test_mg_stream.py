"""n16-style MG measurement stream (examples/wilson_mg_stream.py):
heatbath evolution + per-config device-setup rebuild + MG propagators +
pion correlator. Reference: tests/n16_wilson_kcycle_heatbath/
wilson_kcycle_heatbath.cpp (heatbath loop :286, setup rebuild :361-441,
correlator accumulation :474,:499)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_mg_stream_two_configs():
    from examples.wilson_mg_stream import run_stream
    mean, err, plaqs, iters, _ = run_stream(
        L=16, n_configs=2, n_therm=100, n_update=50, n_refine=1,
        coarse_dof=4, tol=1e-6, verbose=False)
    assert len(plaqs) == 2
    # beta=6 heatbath plaquette sits near 0.91-0.93.
    assert all(0.85 < p < 0.97 for p in plaqs), plaqs
    # MG converged well under the cap on both configs.
    assert all(0 < it < 60 for it in iters), iters
    # Pion correlator: positive and decaying away from the source.
    assert np.all(mean[:8] > 0)
    assert mean[1] > mean[5]


def test_mg_stream_batched_matches_sequential():
    """The batched all-source solve produces the same physics as the
    sequential stream (same rng path, same configs, same correlator)."""
    from examples.wilson_mg_stream import run_stream
    kw = dict(L=16, n_configs=2, n_therm=100, n_update=50, n_refine=1,
              coarse_dof=4, tol=1e-6, verbose=False)
    mean_s, _, plaqs_s, _, _ = run_stream(**kw)
    mean_b, _, plaqs_b, _, _ = run_stream(batched=True, **kw)
    np.testing.assert_allclose(plaqs_b, plaqs_s, rtol=1e-12)
    np.testing.assert_allclose(mean_b, mean_s, rtol=1e-3)
