"""Pallas TPU kernel for group-points gather (B, N, C) x (B, M, K) -> (B, M, K, C).

TPU-native replacement for the reference CUDA gather
(/root/reference/third_party_pointnet2/pointnet2/_ext_src/src/group_points_gpu.cu:9-22).
XLA's native gather at this shape (B=32, N=20k, M=2048, K=64, C=3) lowers to
per-row dynamic slices and measured 32 ms of the ~160 ms eval forward -- two
orders of magnitude off the ~0.3 ms HBM roofline (50 MB out + random 12 B
reads).  This kernel reformulates the gather as a two-level dense select:

  level 1 (MXU): split each index into hi = idx >> 7 (which 128-lane block
    of the point axis) and lo = idx & 127 (lane within it).  A one-hot over
    the NH = ceil(N/128) blocks, built in bf16 (0/1 are exact), matmuls the
    transposed payload (3*C*128, NH) @ (NH, S) -- one MXU pass hands every
    query its point's whole 128-block for all C channels.
  level 2 (VPU): a lo one-hot (128, S) masks + sublane-reduces each
    channel's block down to the selected element.

Queries ride the LANE axis end to end (idx arrives as (1, S) lane rows, the
one-hots broadcast a lane vector against sublane iotas, the select reduces
over sublanes, the output block is (C, S)) -- no cross-tile relayout or
transpose anywhere in the kernel; the single (B, M, K, C) re-layout happens
once in XLA on the way out.

Exactness: a one-hot matmul row has exactly one nonzero product (1.0 * v),
so the MXU hands back the operand value itself -- IF the operand is exact
in the matmul input dtype.  f32 payloads are therefore pre-split into three
bf16 terms (hi = bf16(v), mid = bf16(v - hi), lo = bf16(v - hi - mid): the
classic bf16x3 decomposition, exact because each rounding remainder is
itself f32-representable and <= 8 significant bits remain for the last
term).  The gathered terms re-sum in f32 without rounding ((hi + mid) spans
<= 17 mantissa bits; the final + lo reconstructs the original f32, which is
representable, so round-to-nearest returns it).  The op is bit-exact vs
jnp.take_along_axis -- pinned in tests/test_ops.py.

Cost model per grid cell (S = MB*K query lanes): one (3*C*128, NH) x
(NH, S) bf16 matmul = S*N*3C MACs -- the irreducible price of a
matmul-formulated gather -- plus ~S*(NH + C*128) VPU compare/select ops.
At the bench shape that is ~1.5 bf16 TFLOP total, ~8 ms at v5e peak vs
32 ms for XLA's gather.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = os.environ.get("CODA_GROUP_GATHER_INTERPRET", "0") == "1"

_LANES = 128
# centers per grid cell; S = _MB * K query lanes per cell (1024 at K=64).
# On-chip sweep at the bench shape: MB=8 15.4 ms, 16 14.9, 32 14.3 -- 32's
# (3*C*128, MB*K) f32 matmul buffer sits ~1 MB under the 16 MB scoped VMEM
# limit, so 16 ships for headroom (the 4% is noise at step level).
_MB = int(os.environ.get("CODA_GROUP_GATHER_MB", "16"))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _truncate_bf16(x: jax.Array) -> jax.Array:
    """Top 16 bits of an f32 = sign+exp+7 mantissa bits = an exact bf16 value.
    Done with a bit mask, NOT astype round-trips: XLA's allow-excess-precision
    simplifier elides convert(bf16(convert(f32 x))) chains, which collapses a
    rounding-based split into hi=x, mid=lo=0."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        jnp.bitwise_and(bits, jnp.uint32(0xFFFF0000)), jnp.float32
    )


def _bf16x3(x: jax.Array):
    """Exact f32 -> (hi, mid, lo) bf16 triple (x == (hi + mid) + lo in f32).

    Truncating splits: hi keeps x's top 8 significand bits exactly, r = x - hi
    is exactly the remaining <= 16 bits, mid its top 8, lo the final <= 8 --
    every subtraction and the final resummation are exact in f32."""
    hi = _truncate_bf16(x)
    r = x - hi
    mid = _truncate_bf16(r)
    lo = r - mid
    return (
        hi.astype(jnp.bfloat16),
        mid.astype(jnp.bfloat16),
        lo.astype(jnp.bfloat16),
    )


def _gather_kernel(c: int, nh: int, idx_ref, pts_ref, out_ref):
    # idx_ref: (1, 1, 1, S) int32; pts_ref: (1, 3*c*128, NH) bf16 payload,
    #   rows seg*(c*128) + ch*128 + l = bf16x3 segment seg of channel ch,
    #   lane l within each 128-point block; out_ref: (1, 1, c, S).
    s = idx_ref.shape[-1]
    idx = idx_ref[0, 0]  # (1, S)
    hi = jax.lax.shift_right_logical(idx, 7)
    lo = jnp.bitwise_and(idx, _LANES - 1)

    oh_hi = (
        hi == jax.lax.broadcasted_iota(jnp.int32, (nh, s), 0)
    ).astype(jnp.bfloat16)  # (NH, S)
    mm = jax.lax.dot_general(
        pts_ref[0], oh_hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (3*c*128, S)

    seg = c * _LANES
    # (hi + mid) + lo: exact f32 reconstruction (see module docstring)
    acc = (mm[: seg, :] + mm[seg : 2 * seg, :]) + mm[2 * seg :, :]  # (c*128, S)

    oh_lo = (
        lo == jax.lax.broadcasted_iota(jnp.int32, (_LANES, s), 0)
    ).astype(jnp.float32)  # (128, S)
    for ch in range(c):
        block = acc[ch * _LANES : (ch + 1) * _LANES, :]  # (128, S)
        out_ref[0, 0, ch, :] = jnp.sum(block * oh_lo, axis=0)  # (S,)


@jax.jit
def group_points_pallas(features: jax.Array, idx: jax.Array) -> jax.Array:
    """features: (B, N, C) f32, idx: (B, M, K) int -> (B, M, K, C) f32.

    Same contract as ops.grouping.group_points (bit-exact); intended for
    small C (grouped xyz / colors) where the S*N*3C MAC cost stays cheap.
    """
    b, n, c = features.shape
    _, m, k = idx.shape
    n_pad = _round_up(n, _LANES)
    nh = n_pad // _LANES
    mb = _MB
    while m % mb:
        mb //= 2
    s = mb * k

    # payload: (B, 3*C*128, NH) -- [hi|mid|lo] x [channel] x [lane-in-block]
    f = jnp.pad(features.astype(jnp.float32), ((0, 0), (0, n_pad - n), (0, 0)))
    planes = jnp.transpose(f, (0, 2, 1)).reshape(b, c, nh, _LANES)
    parts = _bf16x3(planes)
    pts_t = jnp.concatenate(
        [jnp.transpose(p, (0, 1, 3, 2)).reshape(b, c * _LANES, nh) for p in parts],
        axis=1,
    )

    idx_l = idx.astype(jnp.int32).reshape(b, m // mb, 1, s)

    out = pl.pallas_call(
        functools.partial(_gather_kernel, c, nh),
        out_shape=jax.ShapeDtypeStruct((b, m // mb, c, s), jnp.float32),
        grid=(b, m // mb),
        in_specs=[
            pl.BlockSpec((1, 1, 1, s), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c * _LANES, nh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, c, s), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_INTERPRET,
    )(idx_l, pts_t)
    # (B, M/mb, C, S=mb*K) -> (B, M, K, C)
    return (
        out.reshape(b, m // mb, c, mb, k)
        .transpose(0, 1, 3, 4, 2)
        .reshape(b, m, k, c)
    )
