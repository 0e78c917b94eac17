"""Verify the Pallas TPU kernels against reference-semantics oracles on a
REAL TPU chip (CI forces the CPU backend, so the compiled kernels are only
exercised here).  Run from the repo root:

    python scripts/verify_pallas_tpu.py

Covers the regimes that matter for parity with the CUDA kernels
(/root/reference third_party_pointnet2 _ext_src/src/{sampling,ball_query}_gpu.cu):
sparse uniform scenes AND a dense planted cluster (>nsample hits per chunk,
exercising the slot-overflow + first-hit-fill paths), plus near-origin skip
and seed-0 semantics for FPS.  The oracles use the kernels' exact float
formulation (direct coordinate diffs) -- see ops/grouping.py docstring for
why the XLA fallback can differ at the r^2 boundary.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def bq_oracle(radius, nsample, xyz, ctr):
    """ball_query_gpu.cu:12-48 with direct (a-b)^2 float32 sums."""
    b, n, _ = xyz.shape
    m = ctr.shape[1]
    out = np.zeros((b, m, nsample), np.int32)
    r2 = np.float32(radius * radius)
    for bi in range(b):
        diff = (ctr[bi][:, None, :] - xyz[bi][None, :, :]).astype(np.float32)
        sq = diff * diff
        d2 = (sq[..., 0] + sq[..., 1]) + sq[..., 2]  # kernel's add order
        for mi in range(m):
            hits = np.nonzero(d2[mi] < r2)[0][:nsample]
            if len(hits):
                out[bi, mi, : len(hits)] = hits
                out[bi, mi, len(hits):] = hits[0]
    return out


def main():
    if jax.default_backend() not in ("tpu",):
        print(f"SKIP: need a TPU backend, got {jax.default_backend()}")
        return 0

    from coda_neurips2023_tpu.ops.pallas_ball_query import ball_query_pallas
    from coda_neurips2023_tpu.ops.pallas_fps import fps_pallas

    rng = np.random.default_rng(0)
    B, N, M, NS, R = 4, 20000, 2048, 64, 0.2
    xyz = rng.uniform(-3, 3, (B, N, 3)).astype(np.float32)
    ctr = rng.uniform(-3, 3, (B, M, 3)).astype(np.float32)
    # plant a dense cluster around each scene's first center
    xyz[:, :5000] = ctr[:, :1, :] + 0.05 * rng.standard_normal((B, 5000, 3)).astype(
        np.float32
    )

    ok = True

    got = np.asarray(ball_query_pallas(R, NS, jnp.asarray(xyz), jnp.asarray(ctr)))
    ref = bq_oracle(R, NS, xyz, ctr)
    match = np.array_equal(ref, got)
    print(f"ball_query dense+sparse: {'OK' if match else 'MISMATCH'}")
    ok &= match

    # v3 (windowed insert) is the shipped default since the TM=128/W=8 sweep
    from coda_neurips2023_tpu.ops.pallas_ball_query import ball_query_pallas_v3

    got = np.asarray(ball_query_pallas_v3(R, NS, jnp.asarray(xyz), jnp.asarray(ctr)))
    match = np.array_equal(ref, got)
    print(f"ball_query_v3 dense+sparse: {'OK' if match else 'MISMATCH'}")
    ok &= match

    got = np.asarray(fps_pallas(jnp.asarray(xyz), 512))
    from tests.golden import fps_golden

    ref = fps_golden(xyz, 512)
    match = np.array_equal(ref, got)
    print(f"fps (incl. near-origin skip): {'OK' if match else 'MISMATCH'}")
    ok &= match

    # timing at eval shapes
    B2 = 32
    xyz2 = jnp.asarray(rng.uniform(-3, 3, (B2, N, 3)).astype(np.float32))
    ctr2 = jnp.asarray(rng.uniform(-3, 3, (B2, M, 3)).astype(np.float32))
    out = ball_query_pallas(R, NS, xyz2, ctr2)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = ball_query_pallas(R, NS, xyz2, ctr2)
    _ = float(jnp.sum(out))
    print(f"ball_query B={B2} N={N} M={M}: {(time.perf_counter()-t0)/10*1000:.1f} ms")

    out = fps_pallas(xyz2, 2048)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(10):
        out = fps_pallas(xyz2, 2048)
    _ = float(jnp.sum(out))
    print(f"fps B={B2} N={N} -> 2048: {(time.perf_counter()-t0)/10*1000:.1f} ms")

    # sorted ball query + the fused query+gather variant (round 5): both
    # bit-exact vs the adaptive kernel / take_along_axis on chip
    from coda_neurips2023_tpu.ops.pallas_ball_query_sorted import (
        ball_query_and_group_sorted,
        ball_query_pallas_sorted,
    )

    ref_idx = np.asarray(ball_query_pallas(R, NS, jnp.asarray(xyz), jnp.asarray(ctr)))
    got = np.asarray(
        ball_query_pallas_sorted(R, NS, jnp.asarray(xyz), jnp.asarray(ctr))
    )
    match = np.array_equal(ref_idx, got)
    print(f"ball_query_sorted: {'OK' if match else 'MISMATCH'}")
    ok &= match

    fidx, fxyz = ball_query_and_group_sorted(
        R, NS, jnp.asarray(xyz), jnp.asarray(ctr)
    )
    from coda_neurips2023_tpu.ops.grouping import _group_points_xla as _gpx

    ref_g = np.asarray(_gpx(jnp.asarray(xyz), jnp.asarray(ref_idx)))
    match = np.array_equal(ref_idx, np.asarray(fidx)) and np.array_equal(
        ref_g, np.asarray(fxyz)
    )
    print(f"fused bq+gather: {'OK' if match else 'MISMATCH'}")
    ok &= match

    # group gather: bit-exactness on chip (bf16x3 one-hot reconstruction)
    from coda_neurips2023_tpu.ops.grouping import _group_points_xla
    from coda_neurips2023_tpu.ops.pallas_group_gather import group_points_pallas

    feats = jnp.asarray(rng.standard_normal((B2, N, 3)).astype(np.float32) * 4)
    gidx = jnp.asarray(rng.integers(0, N, (B2, M, NS)).astype(np.int32))
    got = np.asarray(group_points_pallas(feats, gidx))
    ref = np.asarray(_group_points_xla(feats, gidx))
    match = np.array_equal(ref, got)
    print(f"group_gather bit-exact: {'OK' if match else 'MISMATCH'}")
    ok &= match
    t0 = time.perf_counter()
    for _ in range(10):
        out = group_points_pallas(feats, gidx)
    _ = float(jnp.sum(out))
    print(f"group_gather B={B2} N={N} MK={M}x{NS}: "
          f"{(time.perf_counter()-t0)/10*1000:.1f} ms")

    # fused (masked/vanilla/cross) attention vs the plain-XLA restatement
    from coda_neurips2023_tpu.ops import pallas_masked_attention as pma

    b3, h3, s3, d3 = 4, 4, 2048, 64
    q = jnp.asarray(rng.standard_normal((b3, h3, s3, d3)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b3, h3, d3, s3)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b3, h3, s3, d3)).astype(np.float32))
    axyz = jnp.asarray(rng.uniform(-3, 3, (b3, s3, 3)).astype(np.float32))
    axyz_t = jnp.transpose(axyz, (0, 2, 1))
    for radius, label in [(0.0, "vanilla"), (0.16, "masked r=0.16")]:
        got = np.asarray(pma.masked_attention(q, k, v, axyz, axyz_t, radius))
        ref = np.asarray(
            pma._reference(q, k, v, axyz, axyz_t, radius, jnp.bfloat16)
        )
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        match = err < 5e-2  # both sides bf16 operands; order-of-accum noise
        print(f"fused attention {label}: rel-err {err:.2e} "
              f"{'OK' if match else 'MISMATCH'}")
        ok &= match
        t0 = time.perf_counter()
        for _ in range(10):
            out = pma.masked_attention(q, k, v, axyz, axyz_t, radius)
        _ = float(jnp.sum(out))
        print(f"fused attention {label} B={b3} S={s3}: "
              f"{(time.perf_counter()-t0)/10*1000:.1f} ms")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
