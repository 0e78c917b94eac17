"""MXU-factorized Pallas ball-query (experimental round-2 variant).

Same exact semantics as ops/pallas_ball_query.py (ball_query_gpu.cu:12-48),
different slot-placement strategy: instead of the (TM, nsample, NC) one-hot
VPU contraction (64x the d^2 work), the 64 output slots are factored as
slot = 8*hi + lo and placed with ONE (64, NC) @ (NC, 64) NN matmul per chunk
on the MXU:

  rows r = hi*TM + m   : AhF[r, i] = [hi[m,i]==hi] * val[m,i]
  cols c = lo*TM + m'  : Lo [i, c] = [lo[m',i]==lo]
  acc64[r, c] += sum_i AhF[r,i] * Lo[i,c]

Diagonal blocks m==m' hold the placements (each cell receives at most ONE
nonzero contribution per chunk because slots are unique per center); the
off-diagonal garbage is discarded by the XLA-side extraction.  Point indices
are split kidx = 256*a + b so both matmul operands stay bf16-EXACT
(integers < 256; the MXU's bf16 path rounds above 2^8 -- the round-1
failure mode).  The running fill count and the first-hit fill are also
applied on the XLA side.

Fallback: the VPU kernel remains the default; ops/grouping.py picks this one
when CODA_BQ_MXU=1 (bench A/B) or when it proves faster.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NC = 2048  # points per chunk (lanes)
_TM = 8  # centers per grid step (sublanes); 8*TM rows in the matmul


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cumsum_lanes(x: jnp.ndarray) -> jnp.ndarray:
    nc = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    s = 1
    while s < nc:
        shifted = pltpu.roll(x, s, axis=len(x.shape) - 1)
        x = x + jnp.where(lane >= s, shifted, 0)
        s *= 2
    return x


def _bq_mxu_kernel(r2: float, nsample: int, n_real: int,
                   xyz_ref, ctr_ref, acc_a_ref, acc_b_ref, cnt_ref):
    n = xyz_ref.shape[-1]
    tm = _TM
    nslot_side = nsample // tm  # 8 for nsample=64
    nchunks = n // _NC

    def ctile(d):
        row = ctr_ref[0, 0, d : d + 1, :]
        return jnp.swapaxes(row, 0, 1)  # (TM, 1)

    cx, cy, cz = ctile(0), ctile(1), ctile(2)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (tm, _NC), 1)

    def chunk_parts(ci):
        off = ci * _NC
        xc = xyz_ref[0, 0:1, pl.ds(off, _NC)]
        yc = xyz_ref[0, 1:2, pl.ds(off, _NC)]
        zc = xyz_ref[0, 2:3, pl.ds(off, _NC)]
        d2 = (cx - xc) ** 2 + (cy - yc) ** 2 + (cz - zc) ** 2
        kidx = off + c_iota
        hit = jnp.logical_and(d2 < r2, kidx < n_real)
        return hit, kidx

    def insert_fn(hit, kidx, acc_a, acc_b, cnt):
        rank = _cumsum_lanes(hit.astype(jnp.int32))
        slot = cnt + rank - 1  # (TM, NC)
        valid = jnp.logical_and(hit, slot < nsample)
        slotc = jnp.where(valid, slot, nsample)  # sentinel: matches no hi/lo
        hi = slotc // tm  # 0..nslot_side, sentinel = nslot_side... careful
        lo = slotc - hi * tm
        # sentinel nsample -> hi == nslot_side (matches no row) and lo == 0;
        # the row test hi==h for h<nslot_side excludes it entirely.
        a_val = (kidx >> 8).astype(jnp.bfloat16)  # < 80, bf16-exact
        b_val = (kidx & 255).astype(jnp.bfloat16)  # < 256, bf16-exact

        # LHS rows r = h*tm + m (concat over h along sublanes): (TM*8, NC)
        ind_rows = jnp.concatenate(
            [(hi == h) for h in range(nslot_side)], axis=0
        )  # bool (64, NC)
        a_rows = jnp.where(
            ind_rows, jnp.concatenate([a_val] * nslot_side, axis=0), jnp.bfloat16(0)
        )
        b_rows = jnp.where(
            ind_rows, jnp.concatenate([b_val] * nslot_side, axis=0), jnp.bfloat16(0)
        )

        # RHS cols c = l*tm + m' : (NC, TM*8) built from the transposed lo.
        # No valid mask needed here: invalid candidates have sentinel hi and
        # contribute a zero LHS row, so their products vanish.  (Mosaic cannot
        # transpose i1 vectors, so only the int32 lo is transposed.)
        loT = jnp.swapaxes(lo, 0, 1)  # (NC, TM) int32
        cols = jnp.concatenate(
            [(loT == l).astype(jnp.bfloat16) for l in range(nslot_side)], axis=1
        )  # (NC, 64)

        acc_a = acc_a + jax.lax.dot(
            a_rows, cols, preferred_element_type=jnp.float32
        )
        acc_b = acc_b + jax.lax.dot(
            b_rows, cols, preferred_element_type=jnp.float32
        )
        cnt = cnt + jnp.sum(hit.astype(jnp.int32), 1, keepdims=True)
        return acc_a, acc_b, cnt

    nrows = tm * nslot_side
    init = (
        jnp.zeros((nrows, nrows), jnp.float32),
        jnp.zeros((nrows, nrows), jnp.float32),
        jnp.zeros((tm, 1), jnp.int32),
    )

    def chunk_body(ci, carry):
        acc_a, acc_b, cnt = carry
        hit, kidx = chunk_parts(ci)
        nhits = jnp.sum(hit.astype(jnp.int32))
        all_full = jnp.min(cnt) >= nsample
        return jax.lax.cond(
            jnp.logical_and(nhits > 0, jnp.logical_not(all_full)),
            lambda: insert_fn(hit, kidx, acc_a, acc_b, cnt),
            lambda: (acc_a, acc_b, cnt),
        )

    acc_a, acc_b, cnt = jax.lax.fori_loop(0, nchunks, chunk_body, init)
    acc_a_ref[0, :, :] = acc_a
    acc_b_ref[0, :, :] = acc_b
    cnt_ref[0, :, :] = jnp.broadcast_to(cnt, (tm, 128))


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query_pallas_mxu(radius: float, nsample: int, xyz: jax.Array,
                          new_xyz: jax.Array) -> jax.Array:
    """xyz: (B, N, 3), new_xyz: (B, M, 3) -> (B, M, nsample) int32."""
    assert nsample == _TM * _TM, "hi/lo factorization requires nsample == 64"
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    n_pad = _round_up(n, _NC)
    m_pad = _round_up(m, _TM)
    ntiles = m_pad // _TM
    nside = nsample // _TM

    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - n)), constant_values=1e9)
    ctr = jnp.pad(new_xyz.astype(jnp.float32), ((0, 0), (0, m_pad - m), (0, 0)))
    ctr_t = jnp.transpose(ctr.reshape(b, ntiles, _TM, 3), (0, 1, 3, 2))

    nrows = _TM * nside
    acc_a, acc_b, cnt = pl.pallas_call(
        functools.partial(_bq_mxu_kernel, float(radius) ** 2, nsample, n),
        out_shape=(
            jax.ShapeDtypeStruct((b * ntiles, nrows, nrows), jnp.float32),
            jax.ShapeDtypeStruct((b * ntiles, nrows, nrows), jnp.float32),
            jax.ShapeDtypeStruct((b * ntiles, _TM, 128), jnp.int32),
        ),
        grid=(b, ntiles),
        in_specs=[
            pl.BlockSpec((1, 3, n_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, _TM), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, nrows, nrows), lambda i, j: (i * ntiles + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nrows, nrows), lambda i, j: (i * ntiles + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TM, 128), lambda i, j: (i * ntiles + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(xyz_t, ctr_t)

    # XLA-side: extract diagonal blocks m==m' and rebuild slot values.
    # acc[r, c] with r = h*TM + m, c = l*TM + m  ->  slots[m, h*TM... wait
    # slot = hi*TM + lo with hi=h, lo=l -> value at slots[m, h*tm+l].
    acc_a = acc_a.reshape(b, ntiles, nside, _TM, nside, _TM)
    acc_b = acc_b.reshape(b, ntiles, nside, _TM, nside, _TM)
    # diag over the two TM axes -> (b, ntiles, TM, nside, nside)
    diag_a = jnp.einsum("bthmlm->btmhl", acc_a)
    diag_b = jnp.einsum("bthmlm->btmhl", acc_b)
    slots = (diag_a * 256.0 + diag_b).astype(jnp.int32)
    slots = slots.reshape(b, m_pad, nsample)
    cnt = cnt.reshape(b, m_pad, 128)[:, :, 0:1]

    s_iota = jnp.arange(nsample)[None, None, :]
    first = slots[:, :, 0:1]
    filled = jnp.where(s_iota < jnp.minimum(cnt, nsample), slots, first)
    filled = jnp.where(cnt > 0, filled, 0)
    return filled[:, :m, :]
