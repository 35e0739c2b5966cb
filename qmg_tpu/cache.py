"""Persistent XLA compilation cache wiring.

The 2048^2 device-resident setup costs ~20 min of cold compile per
process and the multi-chip dryrun recompiles four fp64 setup/solve
programs every run (VERDICT r3 weak #7). JAX's persistent compilation
cache keys executables by (HLO, compile options, backend version), so
every repeated driver/bench/dryrun invocation in the same workspace can
reuse them. Call :func:`enable_persistent_cache` BEFORE the first jit
compilation (import time is fine; backend init is not required).

Cache location: ``$QMG_CACHE_DIR`` if set, else
``<repo>/.jax_cache/<host-cpu-fingerprint>`` (gitignored). Disable
entirely with ``QMG_CACHE_DIR=off``.

The per-host fingerprint subdirectory matters: XLA:CPU stores
AOT-compiled machine code keyed by (HLO, options, backend version) but
NOT by the compiling host's CPU features, so a cache written on one
machine can hand a different machine code using ISA extensions it lacks
(observed: ``cpu_aot_loader`` warning "could lead to execution errors
such as SIGILL" when this workspace moved hosts). Scoping the directory
by a hash of the host's CPU feature flags makes a foreign cache
invisible instead of dangerous.

Residual log noise: under the remote-compile tunnel
(PALLAS_AXON_REMOTE_COMPILE=1) even XLA:CPU modules may be compiled on
the remote build host, whose target-feature list carries XLA
pseudo-features (``+prefer-no-gather``/``+prefer-no-scatter``) this
host does not report. cpu_aot_loader then warns at load time; the real
ISA feature sets match (the fingerprint saw to that), so the warnings
are benign.
"""

import hashlib
import os
import platform

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _host_fingerprint() -> str:
    """Short stable hash of the CPU's ISA feature set."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    key = f"{platform.machine()}|{flags}"
    return hashlib.sha256(key.encode()).hexdigest()[:12]


def cache_dir() -> str | None:
    d = os.environ.get("QMG_CACHE_DIR")
    if d == "off":
        return None
    return d or os.path.join(_REPO, ".jax_cache", _host_fingerprint())


def enable_persistent_cache() -> str | None:
    """Point JAX's compilation cache at the workspace cache dir.

    Safe to call multiple times and before/after backend init; returns
    the directory in use (None if disabled or unsupported).
    """
    d = cache_dir()
    if d is None:
        return None
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", d)
        # Cache everything: the dryrun/bench programs that matter are
        # all multi-second compiles, but tiny helper jits are cheap to
        # store and make repeat runs fully warm.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    return d
