"""Probe the axon TPU relay: exits 0 + prints OK if a tiny jit runs.

The relay (stdio port-forward) can die outright, after which every TPU op
hangs forever with no error; run this under `timeout` before queueing any
on-chip work (see tpu-env-quirks memory / BASELINE.md timing notes):

    timeout 150 python scripts/probe_tpu.py && echo ALIVE || echo DEAD
"""

import sys
import time


def main():
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    import numpy as np

    devs = jax.devices()
    x = jnp.ones((256, 256))
    y = np.asarray(jax.jit(lambda a: (a @ a).sum())(x))
    dt = time.perf_counter() - t0
    print(f"OK {devs[0].platform} {devs[0].device_kind} sum={y:.0f} ({dt:.1f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
