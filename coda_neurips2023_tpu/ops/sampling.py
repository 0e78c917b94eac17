"""Furthest point sampling + index gathering.

TPU-native equivalents of the reference CUDA kernels
(/root/reference/third_party_pointnet2/pointnet2/_ext_src/src/sampling_gpu.cu):

  * `furthest_point_sample` reproduces the reference semantics exactly
    (sampling_gpu.cu:71-168): the first selected index is always 0
    (line 89), points with squared norm <= 1e-3 are never selected
    (line 104), and each step picks the point maximizing the running
    min-distance-to-selected-set (strict `>` comparison, so the earliest
    index wins ties).
  * `gather_points` is `out[b, j] = points[b, idx[b, j]]`
    (sampling_gpu.cu:11-23); on TPU this is a plain XLA gather whose
    VJP is the scatter-add the reference implements by hand
    (sampling_gpu.cu:36-48).

Two implementations of FPS are provided: a pure-XLA `lax.scan` version
(differentiation-free, always available) and a Pallas kernel
(`coda_neurips2023_tpu.ops.pallas_fps`) that keeps the point cloud and the
running min-distance array resident in VMEM across the sequential selection
loop.  `furthest_point_sample` dispatches to Pallas on TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Reference skips points with squared magnitude <= 1e-3 (sampling_gpu.cu:104).
_MAG_EPS = 1e-3
_INIT_DIST = 1e10  # reference: temp buffer filled with 1e10 (pointnet2_utils.py:55)


def _fps_xla(xyz: jax.Array, npoint: int) -> jax.Array:
    """Pure-XLA FPS. xyz: (B, N, 3) float32 -> (B, npoint) int32."""
    n = xyz.shape[1]
    valid = jnp.sum(xyz * xyz, axis=-1) > _MAG_EPS  # (B, N)

    def one_row(pts, valid_row):
        def step(carry, _):
            mindist, last = carry
            lastp = pts[last]
            d = jnp.sum((pts - lastp) ** 2, axis=-1)
            mindist = jnp.minimum(mindist, d)
            cand = jnp.where(valid_row, mindist, -1.0)
            nxt = jnp.argmax(cand).astype(jnp.int32)  # first max index on ties
            return (mindist, nxt), nxt

        init = (jnp.full((n,), _INIT_DIST, dtype=jnp.float32), jnp.int32(0))
        if npoint == 1:
            return jnp.zeros((1,), jnp.int32)
        (_, _), rest = jax.lax.scan(step, init, None, length=npoint - 1)
        return jnp.concatenate([jnp.zeros((1,), jnp.int32), rest])

    return jax.vmap(one_row)(xyz.astype(jnp.float32), valid)


@functools.partial(jax.jit, static_argnums=(1, 2))
def furthest_point_sample(xyz: jax.Array, npoint: int, use_pallas: bool | None = None) -> jax.Array:
    """Iterative max-min-distance sampling.

    Args:
      xyz: (B, N, 3) float point coordinates.
      npoint: number of samples m.
      use_pallas: force the Pallas kernel on/off; default = auto (TPU only).

    Returns:
      (B, npoint) int32 indices into N. idx[:, 0] == 0 always.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from coda_neurips2023_tpu.ops.pallas_fps import fps_pallas

        return fps_pallas(xyz, npoint)
    return _fps_xla(xyz, npoint)


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points: (B, N, C), idx: (B, M) int -> (B, M, C).

    Channels-last layout (the reference is (B, C, N); we keep features last so
    XLA keeps the C dimension in lanes). Gradient w.r.t. `points` is the
    scatter-add of sampling_gpu.cu:36-48 (XLA-native on the take_along_axis
    path; explicit custom_vjp on the Pallas path).

    On TPU, f32/small-C gathers route through the same Pallas two-level
    one-hot kernel as group_points (ops/pallas_group_gather.py, bit-exact,
    ~2x XLA's gather) by viewing (B, M) as (B, M/64, 64) grouped indices.
    """
    from coda_neurips2023_tpu.ops import grouping

    b, m = idx.shape
    use_pallas = (
        grouping._PALLAS_GATHER == "1"
        or (grouping._PALLAS_GATHER == "auto" and jax.default_backend() == "tpu")
    )
    if (
        use_pallas
        and points.dtype == jnp.float32
        and points.shape[-1] <= grouping._PALLAS_GATHER_MAX_C
        and points.shape[1] >= grouping._PALLAS_GATHER_MIN_N
        and m % 64 == 0
    ):
        out = grouping._group_points_fast(points, idx.reshape(b, m // 64, 64))
        return out.reshape(b, m, points.shape[-1])
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)
