"""3-NN search + weighted feature interpolation (feature-propagation upsampling).

TPU-native equivalent of the reference CUDA kernels
(/root/reference/third_party_pointnet2/pointnet2/_ext_src/src/interpolate_gpu.cu:12-70,
74-118).  Unused by the two wired CoDA models but part of the pointnet2 library
API surface (pointnet2_utils.py:148-203), so provided and tested for parity.

Semantics: for each `unknown` point, the 3 nearest `known` points in
ascending-distance order, ties broken toward earlier indices (strict `<`
comparisons in the CUDA scan).  `three_interpolate` computes
`out[b, j] = sum_k points[b, idx[b, j, k]] * weight[b, j, k]`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from coda_neurips2023_tpu.ops.grouping import _pairwise_sqdist, group_points


@jax.jit
def three_nn(unknown: jax.Array, known: jax.Array):
    """unknown: (B, N, 3), known: (B, M, 3) -> (dist2 (B, N, 3), idx (B, N, 3))."""

    def per_scene(args):
        u, k = args
        d2 = _pairwise_sqdist(u, k)  # (N, M)
        # top_k on negated distances; jax top_k is stable => earliest index wins ties,
        # matching the CUDA strict `<` update order (interpolate_gpu.cu:36-52).
        neg, idx = jax.lax.top_k(-d2, 3)
        return -neg, idx.astype(jnp.int32)

    return jax.lax.map(per_scene, (unknown, known))


@jax.jit
def three_interpolate(points: jax.Array, idx: jax.Array, weight: jax.Array) -> jax.Array:
    """points: (B, M, C), idx/weight: (B, N, 3) -> (B, N, C)."""
    gathered = group_points(points, idx)  # (B, N, 3, C)
    return jnp.sum(gathered * weight[..., None].astype(points.dtype), axis=2)


def interpolation_weights(dist2: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Inverse-distance weights as computed by reference callers
    (pointnet2_modules.py uses dist_recip = 1/(dist + 1e-8) then normalizes)."""
    recip = 1.0 / (dist2 + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
