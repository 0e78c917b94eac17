"""On-chip A/B of group-points gather formulations at the eval bench shape.

Variants:
  xla        -- ops.grouping.group_points (take_along_axis; round-2 baseline
                32 ms at B=32, N=20k, M=2048, K=64, C=3)
  xla_planes -- per-coordinate-plane gather ((B, 3, N) take along axis 2);
                probes whether XLA's minor-dim gather path is faster
  pallas     -- ops.pallas_group_gather (two-level one-hot MXU/VPU select)

Each result is consumed by an in-jit sum (avoids the XLA-DCE timing trap;
BASELINE.md methodology notes) and drained via np.asarray of the scalar.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from coda_neurips2023_tpu.ops.grouping import group_points
from coda_neurips2023_tpu.ops.pallas_group_gather import group_points_pallas


def time_fn(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(out)  # compile + drain
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--npoints", type=int, default=20000)
    p.add_argument("--m", type=int, default=2048)
    p.add_argument("--k", type=int, default=64)
    p.add_argument("--c", type=int, default=3)
    args = p.parse_args()
    B, N, M, K, C = args.batch, args.npoints, args.m, args.k, args.c

    rng = np.random.default_rng(0)
    feats = jnp.asarray((rng.standard_normal((B, N, C)) * 3).astype(np.float32))
    # ball-query-like indices: sorted ascending per row (realistic duplicates)
    idx_np = np.sort(rng.integers(0, N, (B, M, K)), axis=-1).astype(np.int32)
    idx = jnp.asarray(idx_np)

    @jax.jit
    def run_xla(f, i):
        return jnp.sum(group_points(f, i))

    @jax.jit
    def run_xla_planes(f, i):
        ft = jnp.transpose(f, (0, 2, 1))  # (B, C, N)
        flat = i.reshape(B, 1, M * K)
        out = jnp.take_along_axis(ft, jnp.broadcast_to(flat, (B, C, M * K)), axis=2)
        return jnp.sum(out)

    @jax.jit
    def run_pallas(f, i):
        return jnp.sum(group_points_pallas(f, i))

    # correctness cross-check on chip first
    got = np.asarray(group_points_pallas(feats, idx))
    want = np.asarray(group_points(feats, idx))
    exact = np.array_equal(got, want)
    print(f"pallas exact vs xla on-device: {exact} "
          f"(maxdiff {np.abs(got - want).max():.3e})")

    for name, fn in [("xla", run_xla), ("xla_planes", run_xla_planes),
                     ("pallas", run_pallas)]:
        dt = time_fn(fn, feats, idx)
        print(f"{name}: {dt*1000:.2f} ms")


if __name__ == "__main__":
    main()
