"""Ball query + grouping.

TPU-native equivalents of the reference CUDA kernels
(/root/reference/third_party_pointnet2/pointnet2/_ext_src/src/ball_query_gpu.cu,
group_points_gpu.cu):

  * `ball_query` reproduces the reference fill semantics exactly
    (ball_query_gpu.cu:30-45): for each center, the first `nsample` point
    indices (in index order) with squared distance < radius^2; if there is at
    least one hit, unused trailing slots are filled with the FIRST hit index;
    if there are no hits, the row is all zeros (the reference allocates the
    index buffer with .zero_(), pointnet2_utils.py:162).
  * `group_points` is a batched gather (group_points_gpu.cu:9-22); the VJP is
    XLA's native scatter-add (lines 37-53).

Instead of the CUDA per-center scan over all N points, we compute the dense
(M, N) squared-distance matrix on the MXU (as -2*a.b + |a|^2 + |b|^2) and
recover the "first nsample hits in index order" with a single top-k over an
order-encoding integer key.  Batch rows are processed under `lax.map` to
bound the transient (M, N) buffer to one scene at a time.

Float caveat: this MXU distance form rounds differently from the CUDA
kernel's direct (a-b)^2 sums, so a point lying exactly at the r^2 boundary
can flip between hit/miss relative to the reference (and relative to the
pallas kernel, which uses direct diffs and is bit-faithful to CUDA).  The
probability is measure-zero for real data; tests compare each backend
against an oracle using its own distance formulation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# Pallas two-level gather for group_points on TPU (ops/pallas_group_gather):
# bit-exact, measured 14.9 vs 30.7 ms for XLA's gather at the eval bench
# shape (B=32, N=20k, M=2048, K=64, C=3).  "auto" = on for TPU backends at
# f32/small-C shapes; CODA_GROUP_GATHER=0 forces the XLA path.
_PALLAS_GATHER = os.environ.get("CODA_GROUP_GATHER", "auto")
# the kernel pays S*N*3C MACs -- a win for the coordinate/color gathers it
# exists for, a loss for wide feature tensors.
_PALLAS_GATHER_MAX_C = 8
# below this point count XLA's gather is already cheap and the kernel's
# per-cell overhead (and a tiny-nh Mosaic compile pathology observed at
# N=1024 on v5e) isn't worth it; the hot shapes are N=20k/40k scenes.
_PALLAS_GATHER_MIN_N = 4096


def _pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """a: (M, 3), b: (N, 3) -> (M, N) squared euclidean distances."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    cross = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    sq_a = jnp.sum(a * a, axis=-1, keepdims=True)
    sq_b = jnp.sum(b * b, axis=-1)[None, :]
    return sq_a + sq_b - 2.0 * cross


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def ball_query(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    use_pallas: bool | None = None,
) -> jax.Array:
    """xyz: (B, N, 3) points, new_xyz: (B, M, 3) centers -> (B, M, nsample) int32."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        import os

        if os.environ.get("CODA_BQ_MXU") == "1" and nsample == 64:
            # the hi/lo factorization needs nsample == _TM*_TM == 64
            # (cols enumerate lo < _TM; other sizes would drop slots)
            # experimental MXU-factorized variant: correct but measured
            # SLOWER on v5e (275 vs 160 ms; Mosaic relayout overhead on the
            # per-chunk transpose/concats) -- kept selectable for newer
            # chips/toolchains.  See ops/pallas_ball_query_mxu.py.
            from coda_neurips2023_tpu.ops.pallas_ball_query_mxu import (
                ball_query_pallas_mxu,
            )

            return ball_query_pallas_mxu(radius, nsample, xyz, new_xyz)
        algo = os.environ.get("CODA_BQ_ALGO", "sorted")
        if algo not in ("window", "adaptive", "sorted"):
            # a mistyped env var must not silently remap to a different kernel
            raise ValueError(
                f"CODA_BQ_ALGO={algo!r}: expected 'window', 'adaptive' or"
                " 'sorted' (MXU variant is selected via CODA_BQ_MXU=1)"
            )
        if algo == "sorted" and xyz.shape[1] >= 4096:
            # sort-assisted windowed kernel (pallas_ball_query_sorted.py):
            # per-tile spatial candidate windows over block-sorted points;
            # exact (v3 fallback on window overflow).  DEFAULT since the
            # on-chip A/B (scripts/bench_bq_sorted.py, v5e): 36.6 vs 66.2 ms
            # v3 at the hot eval shape on realistic scenes (WS=1280), 31.1
            # vs 45.1 ms on uniform clouds; bit-identical to v1 before
            # timing.  Small N keeps v3 -- the sort/window bookkeeping only
            # pays off when N spans many lane chunks.
            from coda_neurips2023_tpu.ops.pallas_ball_query_sorted import (
                ball_query_pallas_sorted,
            )

            return ball_query_pallas_sorted(radius, nsample, xyz, new_xyz)
        if algo in ("window", "sorted"):  # small-N "sorted" keeps v3
            # windowed one-hot insert, no extraction while_loop (v3 in
            # pallas_ball_query.py): beats "adaptive" 66.4 vs 82.0 ms at the
            # hot eval shape (on-chip sweep), bit-identical outputs
            # (scripts/bench_bq_sweep.py verifies every variant against v1
            # before timing); also the in-jit fallback target of "sorted"
            from coda_neurips2023_tpu.ops.pallas_ball_query import (
                ball_query_pallas_v3,
            )

            return ball_query_pallas_v3(radius, nsample, xyz, new_xyz)
        from coda_neurips2023_tpu.ops.pallas_ball_query import ball_query_pallas

        return ball_query_pallas(radius, nsample, xyz, new_xyz)
    n = xyz.shape[1]
    r2 = jnp.float32(radius * radius)
    iota_n = jnp.arange(n, dtype=jnp.int32)
    slot = jnp.arange(nsample, dtype=jnp.int32)

    def per_scene(args):
        xyz_b, new_b = args
        d2 = _pairwise_sqdist(new_b, xyz_b)  # (M, N)
        hit = d2 < r2
        # key: hits keep their index k, misses get N + k; the nsample smallest
        # keys are exactly the first nsample hits in index order.
        key = jnp.where(hit, iota_n[None, :], iota_n[None, :] + n)
        _, topi = jax.lax.top_k(-key, nsample)  # ascending key order
        cnt = jnp.sum(hit, axis=1)  # (M,)
        idx = jnp.where(slot[None, :] < cnt[:, None], topi, topi[:, :1])
        idx = jnp.where((cnt > 0)[:, None], idx, 0)
        return idx.astype(jnp.int32)

    return jax.lax.map(per_scene, (xyz, new_xyz))


def _group_points_xla(features: jax.Array, idx: jax.Array) -> jax.Array:
    b, m, k = idx.shape
    flat = jnp.take_along_axis(
        features, idx.reshape(b, m * k, 1).astype(jnp.int32), axis=1
    )
    return flat.reshape(b, m, k, features.shape[-1])


@jax.custom_vjp
def _group_points_fast(features: jax.Array, idx: jax.Array) -> jax.Array:
    """TPU fast path: Pallas two-level one-hot gather (bit-exact vs the XLA
    formulation; see ops/pallas_group_gather.py).  custom_vjp because
    pallas_call has no derived transpose; the backward is the same
    scatter-add XLA derives for take_along_axis."""
    from coda_neurips2023_tpu.ops.pallas_group_gather import group_points_pallas

    return group_points_pallas(features, idx)


def _group_points_fwd(features, idx):
    return _group_points_fast(features, idx), (idx, features.shape)


def _group_points_bwd(res, g):
    idx, fshape = res
    b, m, k = idx.shape
    flat_idx = idx.reshape(b, m * k, 1).astype(jnp.int32)
    grad = jnp.zeros(fshape, g.dtype).at[
        jnp.arange(b)[:, None, None],
        flat_idx,
        jnp.arange(fshape[-1])[None, None, :],
    ].add(g.reshape(b, m * k, fshape[-1]))
    return grad, None


_group_points_fast.defvjp(_group_points_fwd, _group_points_bwd)


def group_points(features: jax.Array, idx: jax.Array) -> jax.Array:
    """features: (B, N, C), idx: (B, M, K) int -> (B, M, K, C)."""
    use_pallas = (
        _PALLAS_GATHER == "1"
        or (_PALLAS_GATHER == "auto" and jax.default_backend() == "tpu")
    )
    if (
        use_pallas
        and features.dtype == jnp.float32
        and features.shape[-1] <= _PALLAS_GATHER_MAX_C
        and features.shape[1] >= _PALLAS_GATHER_MIN_N
    ):
        return _group_points_fast(features, idx)
    return _group_points_xla(features, idx)


@functools.partial(jax.jit, static_argnums=(0, 1, 5))
def query_and_group(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    features: jax.Array | None = None,
    normalize_xyz: bool = False,
):
    """Functional QueryAndGroup (reference pointnet2_utils.py:291-373).

    Returns:
      new_features: (B, M, nsample, 3 + C) -- recentered (and optionally
        radius-normalized) local xyz concatenated with grouped features.
      grouped_xyz: (B, M, nsample, 3) recentered local coordinates.
    """
    # opt-in (round-5 on-chip A/B: measured NEUTRAL at the eval shape --
    # 59.8 vs 60.0 ms for the whole query+group block.  The kernel's in-loop
    # coordinate extraction (+13 ms: 3 extra where+row-sum passes per
    # extraction step, and the step count is the latency-bound part) plus the
    # (B,M,K,3) center un-sort (+6.5 ms) cancel the separate group-points
    # pass (-16.4 ms) almost exactly.  Kept selectable + bit-identity-tested;
    # see BASELINE.md round-5 for the full design-space notes.)
    fused = os.environ.get("CODA_BQ_FUSED_GATHER", "0")
    if (
        fused == "1"
        and os.environ.get("CODA_BQ_MXU") != "1"
        and os.environ.get("CODA_BQ_ALGO", "sorted") == "sorted"
        and xyz.shape[1] >= 4096
        and nsample % 128 != 0  # cnt export needs a pad lane in the kernel
    ):
        # fused ball query + coordinate gather: the sorted kernel extracts
        # each hit's xyz inside its extraction loop (already in VMEM),
        # removing the separate group_points pass entirely.  Bit-exact vs
        # the two-op path (tests/test_ops.py::test_fused_bq_gather_*).
        from coda_neurips2023_tpu.ops.pallas_ball_query_sorted import (
            ball_query_and_group_sorted,
        )

        idx, gathered = ball_query_and_group_sorted(radius, nsample, xyz, new_xyz)
        grouped_xyz = gathered - new_xyz[:, :, None, :]
    else:
        idx = ball_query(radius, nsample, xyz, new_xyz)
        grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius
    if features is not None:
        grouped_features = group_points(features, idx)
        new_features = jnp.concatenate([grouped_xyz, grouped_features], axis=-1)
    else:
        new_features = grouped_xyz
    return new_features, grouped_xyz
