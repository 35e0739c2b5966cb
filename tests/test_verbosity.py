"""Per-preconditioner verbosity levels (quantum-linalg
inversion_verbose_struct; reference use at
multigrid/stateful_multigrid.h:761-776).

NONE prints nothing; SUMMARY prints one line per completed inner
inversion; DETAIL adds per-iteration residuals; precond_verbosity
controls the preconditioner's solves independently of the outer solve;
prefixes indent two spaces per level. bool True keeps the pre-round-5
all-DETAIL behavior.
"""

import contextlib
import io

import numpy as np
import jax.numpy as jnp
import pytest

from qmg_tpu.lattice import Lattice2D
from qmg_tpu.rng import QMGRandom
from qmg_tpu import u1
from qmg_tpu.operators.wilson import Wilson2D
from qmg_tpu.setup import KCycleConfig, build_kcycle_hierarchy
from qmg_tpu.solvers import VerboseMG, Verbosity

L = 16


@pytest.fixture(scope="module")
def mg16():
    lat = Lattice2D(L, L, 2)
    rng = QMGRandom(1337)
    g = jnp.asarray(u1.gauss_gauge_u1(lat, rng, 6.0), jnp.complex128)
    op = Wilson2D(lat, -0.06, g, dtype=g.dtype)
    cfg = KCycleConfig(n_refine=2, coarse_dof=4, nullvec_tol=5e-4,
                       nullvec_max_iter=200, coarsest_direct=False)
    mg = build_kcycle_hierarchy(lat, op, cfg, rng)
    return mg, rng.gaussian_cv(lat)


def _solve_lines(mg, b, verbose):
    f = io.StringIO()
    with contextlib.redirect_stdout(f):
        res = mg.solve(b, tol=1e-5, max_iter=60, restart_freq=32,
                       verbose=verbose, jit=True)
    assert bool(res.converged)
    return f.getvalue().splitlines()


def test_verbosity_none_is_silent(mg16):
    mg, b = mg16
    assert _solve_lines(mg, b, False) == []
    assert _solve_lines(mg, b, VerboseMG()) == []


def test_verbosity_summary_prints_inner_summaries(mg16):
    mg, b = mg16
    lines = _solve_lines(mg, b,
                         VerboseMG(Verbosity.SUMMARY, Verbosity.SUMMARY))
    assert lines, "SUMMARY produced no output"
    # Every line is a summary (no per-iteration lines).
    assert all("summary:" in ln for ln in lines)
    # Both inner levels report, with two-spaces-per-level indentation.
    l1 = [ln for ln in lines if "Level 1" in ln]
    l2 = [ln for ln in lines if "Level 2" in ln]
    assert l1 and l2
    assert l1[0].startswith("  [QMG-MG-SOLVE-INFO]: Level 1")
    assert l2[0].startswith("    [QMG-MG-SOLVE-INFO]: Level 2")
    # The outer solve reports its own summary too.
    assert any("Level 0" in ln for ln in lines)


def test_outer_detail_inner_summary(mg16):
    mg, b = mg16
    lines = _solve_lines(mg, b,
                         VerboseMG(Verbosity.DETAIL, Verbosity.SUMMARY))
    outer_iter = [ln for ln in lines if "Level 0" in ln and "iter" in ln]
    inner_iter = [ln for ln in lines
                  if "Level 0" not in ln and " iter " in ln]
    inner_sum = [ln for ln in lines
                 if "Level 0" not in ln and "summary:" in ln]
    assert outer_iter, "outer DETAIL lines missing"
    assert not inner_iter, "precond SUMMARY leaked DETAIL lines"
    assert inner_sum, "precond summaries missing"


def test_precond_verbosity_independent(mg16):
    """Outer silent per-iteration, preconditioner still reports."""
    mg, b = mg16
    lines = _solve_lines(mg, b,
                         VerboseMG(Verbosity.NONE, Verbosity.SUMMARY))
    assert lines and all("summary:" in ln for ln in lines)
    assert not any("Level 0" in ln for ln in lines)


def test_bool_true_full_detail_back_compat(mg16):
    mg, b = mg16
    lines = _solve_lines(mg, b, True)
    # Per-iteration lines at every level, as before round 5.
    for lvl in ("Level 0", "Level 1", "Level 2"):
        assert any(lvl in ln and " iter " in ln for ln in lines), lvl
