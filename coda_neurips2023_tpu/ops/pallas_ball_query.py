"""Pallas TPU kernel for ball query.

Exact reference semantics (ball_query_gpu.cu:12-48): per center, the FIRST
`nsample` point indices (in index order) with d^2 < r^2; trailing slots filled
with the first hit; all-zero rows when no hits.

The XLA formulation (top_k over an order-encoding key, ops/grouping.py) is
algorithmically clean but TPU top_k over N=20k keys dominates the whole
model's eval time.  This kernel instead scans the point cloud once in lane
chunks, keeping per-center running hit counts and slot buffers in VMEM:

  grid = (B, M / TM): TM centers per step (sublanes), full N per batch row
  (the xyz planes stay resident across the M tiles of a row);
  per chunk: d^2 (TM, NC) -> hit mask -> in-chunk rank via cumsum ->
  global slot = cnt + rank - 1 -> slot one-hot contraction writes the point
  index into its slot; chunks with no hits skip the contraction entirely.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NC = 2048  # points per chunk (lanes)
_TM = 8  # centers per grid step (sublanes)
# per-chunk gate between the two insertion algorithms (see _bq_kernel):
# sequential first-hit extraction costs ~3 (TM,NC) passes PER STEP (round-2
# version: ~9) while the one-hot contraction costs a fixed ~3.7M element-ops
# (cumsum + 3 passes over (TM, nsample, NC)).  Round-2 on-chip sweep at the
# bench shape (B=32 N=20k M=2048 k=64, synthetic scenes) with the 9-pass
# loop: T=0 (pure one-hot) 154 ms, T=8 103 ms, T=16 108 ms, pure extraction
# 109 ms; round-3 re-sweep with the 3-pass loop: see BASELINE.md.
# CODA_BQ_EXTRACT_T overrides for sweeps.
_EXTRACT_T = int(os.environ.get("CODA_BQ_EXTRACT_T", "8"))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cumsum_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the lane axis (Hillis-Steele log-shift;
    Pallas TPU has no cumsum primitive)."""
    nc = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    s = 1
    while s < nc:
        shifted = pltpu.roll(x, s, axis=len(x.shape) - 1)
        x = x + jnp.where(lane >= s, shifted, 0)
        s *= 2
    return x


def _bq_kernel(r2: float, nsample: int, n_real: int,
               xyz_ref, ctr_ref, out_ref):
    # xyz_ref: (1, 3, Npad); ctr_ref: (1, 3, Mpad); out_ref: (1, TM, KP)
    n = xyz_ref.shape[-1]
    kp = out_ref.shape[-1]
    tm = _TM
    nchunks = n // _NC

    def ctile(d):
        row = ctr_ref[0, 0, d : d + 1, :]  # (1, TM)
        return jnp.swapaxes(row, 0, 1)  # (TM, 1)

    cx, cy, cz = ctile(0), ctile(1), ctile(2)

    s_iota2 = jax.lax.broadcasted_iota(jnp.int32, (tm, nsample), 1)
    s_iota3 = jax.lax.broadcasted_iota(jnp.int32, (tm, nsample, _NC), 1)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (tm, _NC), 1)

    def chunk_parts(ci, slots, cnt):
        off = ci * _NC
        xc = xyz_ref[0, 0:1, pl.ds(off, _NC)]
        yc = xyz_ref[0, 1:2, pl.ds(off, _NC)]
        zc = xyz_ref[0, 2:3, pl.ds(off, _NC)]
        d2 = (cx - xc) ** 2 + (cy - yc) ** 2 + (cz - zc) ** 2  # (TM, NC)
        kidx = off + c_iota
        hit = jnp.logical_and(d2 < r2, kidx < n_real)  # mask padding
        return hit, kidx

    def insert_fn(hit, kidx, slots, cnt):
        rank = _cumsum_lanes(hit.astype(jnp.int32))
        slot = cnt + rank - 1  # (TM, NC)
        valid = jnp.logical_and(hit, slot < nsample)
        eq = jnp.logical_and(slot[:, None, :] == s_iota3, valid[:, None, :])
        contrib = jnp.sum(jnp.where(eq, kidx[:, None, :], 0), axis=2)
        return (
            slots + contrib,
            cnt + jnp.sum(hit.astype(jnp.int32), 1, keepdims=True),
        )

    def extract_fn(hit, kidx, slots, cnt):
        """Sequential first-hit extraction: each step pulls the lowest-lane
        active hit of EVERY non-full center row simultaneously and writes it
        into slot cnt[row].  Identical semantics to the one-hot contraction
        (first nsample hits in index order).

        ~3 (TM, NC)-passes per extracted hit (round 2 shipped ~9):
          * the remaining-hit state is carried as the lane-index KEY itself
            (i32 -- Mosaic cannot carry i1 vregs; extracted/full lanes are
            set to the _NC sentinel), so `active`/`key` need no rebuild;
          * the extracted point index is just chunk_offset + min_lane -- the
            (TM, NC) one-hot select+reduce that gathered kidx is gone;
          * per step: cond min-reduce (1), row min-reduce (1), key update (1)
            plus (TM, nsample)-small slot writes."""
        off_row = kidx[:, 0:1]  # kidx = chunk_offset + c_iota

        key0 = jnp.where(jnp.logical_and(hit, cnt < nsample), c_iota, _NC)
        # per-row count of lanes still in key0: the loop condition tests this
        # tiny (TM, 1) carry instead of re-reducing the (TM, NC) state
        remaining0 = jnp.sum((key0 < _NC).astype(jnp.int32), axis=1, keepdims=True)

        def cond(carry):
            _, cnt_c, _, remaining = carry
            return jnp.any(
                jnp.logical_and(remaining > 0, cnt_c < nsample)
            )

        def body(carry):
            slots_c, cnt_c, key, remaining = carry
            min_lane = jnp.min(key, axis=1, keepdims=True)  # (TM, 1)
            act = jnp.logical_and(min_lane < _NC, cnt_c < nsample)  # (TM, 1)
            val = off_row + min_lane  # the hit's point index (masked by put)
            put = jnp.logical_and(s_iota2 == cnt_c, act)  # (TM, nsample)
            slots_c = slots_c + jnp.where(put, val, 0)
            cnt_c = cnt_c + act.astype(jnp.int32)
            key = jnp.where(c_iota == min_lane, _NC, key)
            remaining = remaining - (min_lane < _NC).astype(jnp.int32)
            return slots_c, cnt_c, key, remaining

        slots, cnt, _, _ = jax.lax.while_loop(
            cond, body, (slots, cnt, key0, remaining0)
        )
        return slots, cnt

    init = (jnp.zeros((tm, nsample), jnp.int32), jnp.zeros((tm, 1), jnp.int32))
    if nchunks == 1:
        # single chunk: unconditional insertion (correct by masking; the cond
        # is only a skip-work gate, and conds outside fori_loop crash Mosaic)
        hit, kidx = chunk_parts(0, *init)
        slots, cnt = insert_fn(hit, kidx, *init)
    else:

        def chunk_body(ci, carry):
            slots, cnt = carry
            hit, kidx = chunk_parts(ci, slots, cnt)
            row_hits = jnp.sum(hit.astype(jnp.int32), axis=1, keepdims=True)
            nhits = jnp.sum(row_hits)
            # steps the extraction path would need: per row, hits in this
            # chunk capped by the free slots left
            steps = jnp.max(
                jnp.minimum(row_hits, jnp.maximum(nsample - cnt, 0))
            )
            # CUDA stops scanning per-center at nsample hits
            # (ball_query_gpu.cu:30); the tile skips once every center is full.
            all_full = jnp.min(cnt) >= nsample
            return jax.lax.cond(
                jnp.logical_and(nhits > 0, jnp.logical_not(all_full)),
                lambda: jax.lax.cond(
                    steps <= _EXTRACT_T,
                    lambda: extract_fn(hit, kidx, slots, cnt),
                    lambda: insert_fn(hit, kidx, slots, cnt),
                ),
                lambda: (slots, cnt),
            )

        slots, cnt = jax.lax.fori_loop(0, nchunks, chunk_body, init)

    first = slots[:, 0:1]
    filled = jnp.where(s_iota2 < jnp.minimum(cnt, nsample), slots, first)
    filled = jnp.where(cnt > 0, filled, 0)
    if kp > nsample:
        filled = jnp.concatenate(
            [filled, jnp.zeros((tm, kp - nsample), jnp.int32)], axis=1
        )
    out_ref[0, :, :] = filled


# ---------------------------------------------------------------------------
# v3: windowed one-hot insert (no while_loop).
#
# Analysis of the adaptive kernel above at the hot shape (B=32 N=20k M=2048
# k=64): the extraction while_loop is LATENCY-bound, not throughput-bound --
# each iteration is a short dependency chain (row-min reduce -> key update ->
# next min) over just 16 (8,128) vregs, extracting <= TM hits, and the loop
# runs ~64 times per tile; the full one-hot insert is throughput-bound at
# ~3*nsample (TM,NC)-passes per chunk even when the chunk adds one hit.
#
# v3 keeps the cumsum-rank slot assignment but scatters through a WINDOW of
# _W slots at a time, touching only the windows [min cnt, max new slot] that
# this chunk can actually reach: a sparse late chunk pays ~3*_W passes, a
# dense first chunk pays the same ~3*nsample as the full insert, and there is
# no serial extraction loop at all -- every op is a wide feed-forward VPU op.
# Chunks after every center is full skip ENTIRELY (including d^2; the v1
# kernel still paid d^2 post-fill).  The smaller (TM, _W, NC) scatter
# intermediate also unlocks TM > 8 (fewer grid steps, better fixed-cost
# amortization); TM/W are env-tunable for the on-chip sweep.
# ---------------------------------------------------------------------------
# defaults from the on-chip sweep at the hot eval shape (B=32, N=20000,
# M=2048, k=64, r=0.2; scripts/bench_bq_sweep.py): TM=128/W=8 ran 66.4 ms vs
# 82.0 ms for the adaptive v1 kernel (1.24x); TM=64/16 and 128/16 ~69 ms;
# small TM (8/16) loses badly to fixed-cost amortization (90-190 ms)
_TM3 = int(os.environ.get("CODA_BQ3_TM", "128"))
_W3 = int(os.environ.get("CODA_BQ3_W", "8"))


def _bq3_kernel(r2: float, nsample: int, n_real: int,
                xyz_ref, ctr_ref, out_ref):
    # xyz_ref: (1, 3, Npad); ctr_ref: (1, 1, 3, TM); out_ref: (1, TM, KP)
    n = xyz_ref.shape[-1]
    kp = out_ref.shape[-1]
    tm = ctr_ref.shape[-1]
    w = _W3
    nchunks = n // _NC
    nwin = (nsample + w - 1) // w

    def ctile(d):
        row = ctr_ref[0, 0, d : d + 1, :]  # (1, TM)
        return jnp.swapaxes(row, 0, 1)  # (TM, 1)

    cx, cy, cz = ctile(0), ctile(1), ctile(2)
    s_iota2 = jax.lax.broadcasted_iota(jnp.int32, (tm, nsample), 1)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (tm, _NC), 1)

    def live_chunk(ci, slots, cnt):
        off = ci * _NC
        xc = xyz_ref[0, 0:1, pl.ds(off, _NC)]
        yc = xyz_ref[0, 1:2, pl.ds(off, _NC)]
        zc = xyz_ref[0, 2:3, pl.ds(off, _NC)]
        d2 = (cx - xc) ** 2 + (cy - yc) ** 2 + (cz - zc) ** 2  # (TM, NC)
        kidx = off + c_iota
        hit = jnp.logical_and(d2 < r2, kidx < n_real)
        rank = _cumsum_lanes(hit.astype(jnp.int32))  # (TM, NC) inclusive
        slot = cnt + rank - 1
        valid = jnp.logical_and(hit, slot < nsample)
        row_hits = rank[:, _NC - 1 :]  # (TM, 1) hits in this chunk
        fit = jnp.minimum(row_hits, jnp.maximum(nsample - cnt, 0))
        # new slots this chunk covers, per row: [cnt, cnt + fit - 1]
        row_hi = cnt + fit - 1  # (TM, 1); < cnt when fit == 0

        def scatter_window(wi, slots):
            base = wi * w
            acc = slots
            for u in range(w):
                s_abs = base + u
                if s_abs >= nsample:
                    break
                m = jnp.logical_and(valid, slot == s_abs)
                contrib = jnp.sum(
                    jnp.where(m, kidx, 0), axis=1, keepdims=True
                )  # (TM, 1)
                acc = acc + jnp.where(s_iota2 == s_abs, contrib, 0)
            return acc

        for wi in range(nwin):
            active = jnp.any(
                jnp.logical_and(cnt < (wi + 1) * w, row_hi >= wi * w)
            )
            slots = jax.lax.cond(
                active, lambda s=slots, i=wi: scatter_window(i, s), lambda s=slots: s
            )
        return slots, cnt + row_hits

    init = (jnp.zeros((tm, nsample), jnp.int32), jnp.zeros((tm, 1), jnp.int32))
    if nchunks == 1:
        slots, cnt = live_chunk(0, *init)
    else:

        def chunk_body(ci, carry):
            slots, cnt = carry
            all_full = jnp.min(cnt) >= nsample
            return jax.lax.cond(
                all_full,
                lambda: (slots, cnt),
                lambda: live_chunk(ci, slots, cnt),
            )

        slots, cnt = jax.lax.fori_loop(0, nchunks, chunk_body, init)

    first = slots[:, 0:1]
    filled = jnp.where(s_iota2 < jnp.minimum(cnt, nsample), slots, first)
    filled = jnp.where(cnt > 0, filled, 0)
    if kp > nsample:
        filled = jnp.concatenate(
            [filled, jnp.zeros((tm, kp - nsample), jnp.int32)], axis=1
        )
    out_ref[0, :, :] = filled


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query_pallas_v3(radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array) -> jax.Array:
    """xyz: (B, N, 3), new_xyz: (B, M, 3) -> (B, M, nsample) int32.

    Windowed-insert variant (see block comment above); identical semantics
    to `ball_query_pallas` (ball_query_gpu.cu:12-48 first-hit-fill).
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    tm = _TM3
    n_pad = _round_up(n, _NC)
    m_pad = _round_up(m, tm)
    kp = _round_up(nsample, 128)

    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - n)), constant_values=1e9)
    ctr = jnp.pad(new_xyz.astype(jnp.float32), ((0, 0), (0, m_pad - m), (0, 0)))
    ctr_t = jnp.transpose(ctr.reshape(b, m_pad // tm, tm, 3), (0, 1, 3, 2))

    out = pl.pallas_call(
        functools.partial(_bq3_kernel, float(radius) ** 2, nsample, n),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, kp), jnp.int32),
        grid=(b, m_pad // tm),
        in_specs=[
            pl.BlockSpec((1, 3, n_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, tm), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tm, kp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
    )(xyz_t, ctr_t)
    return out[:, :m, :nsample]


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query_pallas(radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array) -> jax.Array:
    """xyz: (B, N, 3), new_xyz: (B, M, 3) -> (B, M, nsample) int32."""
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    n_pad = _round_up(n, _NC)
    m_pad = _round_up(m, _TM)
    kp = _round_up(nsample, 128)

    # pad points FAR away so they never hit a ball; centers pad with zeros
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - n)), constant_values=1e9)
    # centers tiled: (B, M/TM, 3, TM) so each grid step gets its own block
    ctr = jnp.pad(new_xyz.astype(jnp.float32), ((0, 0), (0, m_pad - m), (0, 0)))
    ctr_t = jnp.transpose(ctr.reshape(b, m_pad // _TM, _TM, 3), (0, 1, 3, 2))

    out = pl.pallas_call(
        functools.partial(_bq_kernel, float(radius) ** 2, nsample, n),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, kp), jnp.int32),
        grid=(b, m_pad // _TM),
        in_specs=[
            pl.BlockSpec((1, 3, n_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, _TM), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _TM, kp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
    )(xyz_t, ctr_t)
    return out[:, :m, :nsample]
