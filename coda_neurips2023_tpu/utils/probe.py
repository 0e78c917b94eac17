"""Device-backend liveness probe for benches and scripts.

The axon relay (the stdio tunnel this box reaches its TPU chip through) can
die outright, after which EVERY device op hangs forever with no error
(observed 2026-08-17; scripts/probe_tpu.py is the standalone CLI probe).
Benches call `exit_unless_backend_alive` first so a dead relay yields one
honest JSON error line + exit 1 instead of hanging the bench driver.
"""

from __future__ import annotations

import json
import threading


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
    import numpy as np

    ok = []

    def probe():
        import jax
        import jax.numpy as jnp

        x = jnp.ones((128, 128))
        np.asarray(jax.jit(lambda a: (a @ a).sum())(x))
        ok.append(True)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def exit_unless_backend_alive(metric: str, unit: str, timeout_s: float = 240.0):
    """Print a one-line JSON error record and exit 1 if the backend is dead."""
    if backend_alive(timeout_s):
        return
    print(
        json.dumps(
            {
                "metric": metric,
                "value": None,
                "unit": unit,
                "vs_baseline": None,
                "error": "device backend unreachable (axon relay down); no measurement",
            }
        )
    )
    raise SystemExit(1)
