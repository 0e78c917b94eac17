"""Device-backend liveness probe for benches and scripts.

The axon relay (the stdio tunnel this box reaches its TPU chip through) can
die outright, after which EVERY device op hangs forever with no error
(observed 2026-08-17; scripts/probe_tpu.py is the standalone CLI probe).
Benches call `exit_unless_backend_alive` first so a dead relay yields one
honest JSON error line + exit 1 instead of hanging the bench driver.
"""

from __future__ import annotations

import json
import os
import threading


def enable_persistent_compile_cache(cache_dir: "str | None" = None) -> "str | None":
    """Point jax at an on-disk compiled-executable cache (works on the axon
    TPU backend: measured 2.05 s -> 0.32 s for a fresh-process re-jit).

    The relay's compile service latency degrades independently of execute
    latency (observed: ~17 min for a train-step bwd graph while the tiny-jit
    probe read 27 ms), so benches warm this cache once and every later
    fresh-process run -- including the driver's end-of-round capture --
    skips straight to execution.  Keys are HLO/backend fingerprints, so code
    changes invalidate exactly the affected executables.

    Default dir /tmp/coda_compile_cache; override with CODA_COMPILE_CACHE
    (empty string disables).  Returns the dir in effect, or None.
    """
    if cache_dir is None:
        cache_dir = os.environ.get("CODA_COMPILE_CACHE", "/tmp/coda_compile_cache")
    if not cache_dir:
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir


def backend_alive(timeout_s: float = 540.0) -> bool:
    """True iff a tiny jitted op completes within `timeout_s`.

    Runs in a daemon thread: if the backend hangs, the thread is abandoned
    (it can never be joined -- the op never returns) and the process remains
    free to exit.

    Budget: a DEGRADED-but-alive axon tunnel has been measured taking 141 s
    for this exact tiny jit (round 4; round 3 saw 77-158 s), so the earlier
    240 s budget false-tripped twice on real sessions.  540 s keeps the
    dead-relay exit bounded while clearing the observed degradation band
    with ~3.5x margin."""
    return probe_latency_ms(timeout_s) is not None


def probe_latency_ms(timeout_s: float = 540.0) -> "float | None":
    """Round-trip latency (ms) of a tiny pre-compiled jit, or None if dead.

    Two trips are made: the first pays compile (discarded), the second is the
    quoted latency.  This number joins every bench JSON as `probe_ms` so a
    reader can tell a code regression from a degraded tunnel (healthy
    sessions: ~1-10 ms; degraded-but-alive: up to ~150 s observed)."""
    import time

    import numpy as np

    out = []

    def probe():
        import jax
        import jax.numpy as jnp

        x = jnp.ones((128, 128))
        f = jax.jit(lambda a: (a @ a).sum())
        np.asarray(f(x))  # compile + first trip
        t0 = time.perf_counter()
        np.asarray(f(x))
        out.append((time.perf_counter() - t0) * 1e3)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return out[0] if out else None


def exit_unless_backend_alive(
    metric: str, unit: str, timeout_s: float = 540.0, retries: int = 3
) -> float:
    """Probe the backend; on failure re-probe `retries` times before emitting
    one JSON error line and exiting 1.

    Returns the measured probe latency in ms on success so callers can embed
    it in their bench JSON (`probe_ms`).  The retry loop exists because
    BENCH_r04.json went null on a transient relay outage at the driver's
    capture moment; with 3 extra probes at the 540 s budget a bench can ride
    out ~30+ min of outage before conceding."""
    import time

    attempts = 1 + max(0, retries)
    for i in range(attempts):
        ms = probe_latency_ms(timeout_s)
        if ms is not None:
            return ms
        if i + 1 < attempts:
            time.sleep(5.0)
    print(
        json.dumps(
            {
                "metric": metric,
                "value": None,
                "unit": unit,
                "vs_baseline": None,
                "error": "device backend unreachable (axon relay down) after "
                f"{attempts} probes x {timeout_s:.0f}s; no measurement",
            }
        )
    )
    raise SystemExit(1)
