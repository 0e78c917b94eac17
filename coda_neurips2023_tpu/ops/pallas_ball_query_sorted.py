"""Spatially-windowed Pallas ball query (exact, sort-assisted).

Same contract as ops/pallas_ball_query.py (ball_query_gpu.cu:12-48): per
center, the FIRST `nsample` point indices in ORIGINAL index order with
d^2 < r^2; trailing slots filled with the first hit; all-zero rows when no
hits.  "First nsample hits in index order" == "the nsample smallest original
indices among hits, ascending" -- the property this kernel exploits.

Why: the v1/v3 kernels scan every (center-tile, point-chunk) pair, so each
of the M/TM tiles pays full passes over all N points even though a radius-r
ball only ever touches a thin spatial slab of the cloud.  Here the point
blocks are pre-sorted (OUTSIDE the kernel, one segmented XLA argsort) along
the scene's widest axis, so per (tile, block) the candidate set becomes a
CONTIGUOUS LANE RANGE, and the kernel only reads a static `_WS`-lane window
of each 2048-lane block instead of all of it:

  * points stay partitioned by ORIGINAL-INDEX block (block c holds original
    indices [c*2048, (c+1)*2048)), so blocks are scanned in ascending-index
    order like the CUDA kernel;
  * within a block, points are key-sorted; the wrapper computes per
    (batch, tile, block) the 128-aligned window start covering every point
    with key in [min_center_key - r, max_center_key + r] (a point outside
    that key slab is farther than r from every center of the tile along one
    axis alone, so it cannot be a hit -- extra in-window lanes are likewise
    harmless, d^2 masks them);
  * inside the window, lanes are key-ordered, NOT index-ordered, so slot
    placement extracts hits by minimum ORIGINAL INDEX (the sorted original
    index rides along as a payload plane and doubles as the extraction key),
    one hit per center per step, all TM centers in parallel -- exact
    ascending-index placement with no cumsum, no one-hot contraction.

Exactness does not depend on the data: if any (tile, block) window would
overflow `_WS` lanes (e.g. a wall plane perpendicular to the sort axis
putting thousands of points at one key), the wrapper detects it OUTSIDE the
kernel and routes the whole call to ball_query_pallas_v3 via lax.cond.
Float-boundary invariant: the candidate slab is widened by ~8 ULPs beyond
[min_key - r, max_key + r] (see _prepare) so that every point whose
IN-KERNEL f32 d^2 evaluates < r^2 is guaranteed inside the slab -- without
the widening, f32 rounding of the slab bounds could drop a boundary hit
without tripping the fallback.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coda_neurips2023_tpu.ops.pallas_ball_query import ball_query_pallas_v3

_BLK = 2048  # points per original-index block (lanes); == pallas_ball_query._NC
_LANE = 128  # window starts are lane-tile aligned
# static candidate-window width per (tile, block).  On realistic indoor
# scenes the dominant cost is key CLUSTERING (floor/wall slabs), not the
# tile's center span: the on-chip sweep (scripts/bench_bq_sorted.py, v5e)
# measured max span 1223 at the hot shape (B=32, N=20k, M=2048, TM=128) on
# synthetic SUN RGB-D-shaped scenes, so WS<=896 always falls back to v3.
# WS=1280 covers it and wins 1.81x vs v3 (36.6 vs 66.2 ms) -- reading 62.5%
# of each block's lanes beats v3's 100% even after the argsort preprocessing;
# WS=1536 measured 39.2 ms (less skipping), WS in {512,640,896} fall back.
# Uniform clouds: 31.1 ms (1.45x).  Env-tunable for the sweep.
_WS = int(os.environ.get("CODA_BQS_WS", "1280"))
_TM = int(os.environ.get("CODA_BQS_TM", "128"))
# count v3-fallback trips (an overflowing call pays v3 PLUS the wasted sort
# prep, a silent per-call regression vs plain v3 -- make persistence visible).
# Async jax.debug.callback, one bool per call; CODA_BQS_COUNT=0 disables.
_COUNT_FALLBACKS = os.environ.get("CODA_BQS_COUNT", "1") == "1"
FALLBACK_STATS = {"calls": 0, "fallbacks": 0}
_warned = [False]
_callback_ok: list = []  # lazily-resolved host-callback capability


def _callbacks_supported() -> bool:
    """The axon PJRT relay rejects host send/recv callbacks outright
    (UNIMPLEMENTED at dispatch), so the counter must stay off there."""
    if not _callback_ok:
        ver = getattr(jax.devices()[0].client, "platform_version", "")
        _callback_ok.append("axon" not in ver)
    return _callback_ok[0]


def _note_overflow(flag) -> None:
    FALLBACK_STATS["calls"] += 1
    if bool(flag):
        FALLBACK_STATS["fallbacks"] += 1
        if not _warned[0] and FALLBACK_STATS["fallbacks"] >= 8:
            _warned[0] = True
            import logging

            logging.getLogger(__name__).warning(
                "ball_query_pallas_sorted: %d/%d calls overflowed the "
                "WS=%d candidate window and fell back to v3 (paying v3 + "
                "wasted sort prep). Raise CODA_BQS_WS or set "
                "CODA_BQ_ALGO=window for this data distribution.",
                FALLBACK_STATS["fallbacks"], FALLBACK_STATS["calls"], _WS,
            )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bqs_kernel(r2: float, nsample: int, ws: int, blk: int,
                starts_ref, xyz_ref, oidx_ref, ctr_ref, out_ref):
    # starts_ref: (B, T, NB) SMEM scalars; xyz_ref: (1, 3, NPAD) key-sorted
    # per block; oidx_ref: (1, 1, NPAD) original indices, same order;
    # ctr_ref: (1, 1, 3, TM) key-sorted centers; out_ref: (1, TM, KP)
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    n = xyz_ref.shape[-1]
    kp = out_ref.shape[-1]
    tm = ctr_ref.shape[-1]
    nblocks = n // blk
    sentinel = n  # > every real original index

    def ctile(d):
        row = ctr_ref[0, 0, d : d + 1, :]  # (1, TM)
        return jnp.swapaxes(row, 0, 1)  # (TM, 1)

    cx, cy, cz = ctile(0), ctile(1), ctile(2)
    s_iota2 = jax.lax.broadcasted_iota(jnp.int32, (tm, nsample), 1)

    def live_block(c, slots, cnt):
        # starts are flattened (B*T*NB,) -- 1-D dynamic SMEM reads are the
        # canonical scalar-prefetch pattern
        st = starts_ref[(bi * pl.num_programs(1) + ti) * nblocks + c]
        base = pl.multiple_of(c * blk + st, _LANE)
        xw = xyz_ref[0, 0:1, pl.ds(base, ws)]  # (1, ws)
        yw = xyz_ref[0, 1:2, pl.ds(base, ws)]
        zw = xyz_ref[0, 2:3, pl.ds(base, ws)]
        d2 = (cx - xw) ** 2 + (cy - yw) ** 2 + (cz - zw) ** 2  # (TM, ws)
        ow = oidx_ref[0, 0:1, pl.ds(base, ws)]  # (1, ws)
        # padded lanes carry xyz=1e9 so d^2 kills them; full rows seed no key
        key0 = jnp.where(
            jnp.logical_and(d2 < r2, cnt < nsample), ow, sentinel
        )  # (TM, ws) int32: original index if an extractable hit
        remaining0 = jnp.sum((key0 < sentinel).astype(jnp.int32), 1, keepdims=True)

        def cond(carry):
            _, cnt_c, _, remaining = carry
            return jnp.any(jnp.logical_and(remaining > 0, cnt_c < nsample))

        def body(carry):
            slots_c, cnt_c, key, remaining = carry
            minv = jnp.min(key, axis=1, keepdims=True)  # (TM, 1) min oidx
            act = jnp.logical_and(minv < sentinel, cnt_c < nsample)
            put = jnp.logical_and(s_iota2 == cnt_c, act)  # (TM, nsample)
            slots_c = slots_c + jnp.where(put, minv, 0)
            cnt_c = cnt_c + act.astype(jnp.int32)
            # original indices are unique per row, so == clears exactly the
            # extracted lane (and no-op on all-sentinel rows)
            key = jnp.where(key == minv, sentinel, key)
            remaining = remaining - (minv < sentinel).astype(jnp.int32)
            return slots_c, cnt_c, key, remaining

        slots, cnt, _, _ = jax.lax.while_loop(
            cond, body, (slots, cnt, key0, remaining0)
        )
        return slots, cnt

    def block_body(c, carry):
        slots, cnt = carry
        all_full = jnp.min(cnt) >= nsample
        return jax.lax.cond(
            all_full, lambda: (slots, cnt), lambda: live_block(c, slots, cnt)
        )

    init = (jnp.zeros((tm, nsample), jnp.int32), jnp.zeros((tm, 1), jnp.int32))
    if nblocks == 1:
        slots, cnt = live_block(0, *init)
    else:
        slots, cnt = jax.lax.fori_loop(0, nblocks, block_body, init)

    first = slots[:, 0:1]
    filled = jnp.where(s_iota2 < jnp.minimum(cnt, nsample), slots, first)
    filled = jnp.where(cnt > 0, filled, 0)
    if kp > nsample:
        filled = jnp.concatenate(
            [filled, jnp.zeros((tm, kp - nsample), jnp.int32)], axis=1
        )
    out_ref[0, :, :] = filled


def _bqs_gather_kernel(r2: float, nsample: int, ws: int, blk: int,
                       starts_ref, xyz_ref, oidx_ref, ctr_ref,
                       out_ref, oxyz_ref):
    """_bqs_kernel variant that ALSO extracts each hit's xyz coordinates in
    the extraction loop (the window's coordinate rows are already resident in
    VMEM), fusing the downstream group_points(xyz, idx) gather into the ball
    query.  The `key == minv` lane select the loop computes anyway isolates
    exactly one lane per active row (original indices are unique), so the
    coordinate extraction is three where+row-sum passes whose single nonzero
    term is the f32 value itself -- bit-exact vs a take_along_axis gather.

    Extra outputs: oxyz_ref (1, 3, TM, KP) f32 slot coordinates with the
    reference fill semantics (trailing slots = first hit's xyz); the
    all-zero-row case (no hits -> gather of original index 0) cannot be
    resolved in-kernel (point 0's coordinates live in an unknown lane of
    block 0), so the per-center hit count is exported in out_ref's pad lane
    [nsample] (KP > nsample always: 64 -> 128) and the wrapper substitutes
    xyz[b, 0] outside."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    n = xyz_ref.shape[-1]
    kp = out_ref.shape[-1]
    tm = ctr_ref.shape[-1]
    nblocks = n // blk
    sentinel = n

    def ctile(d):
        row = ctr_ref[0, 0, d : d + 1, :]
        return jnp.swapaxes(row, 0, 1)

    cx, cy, cz = ctile(0), ctile(1), ctile(2)
    s_iota2 = jax.lax.broadcasted_iota(jnp.int32, (tm, nsample), 1)

    def live_block(c, slots, cnt, gx, gy, gz):
        st = starts_ref[(bi * pl.num_programs(1) + ti) * nblocks + c]
        base = pl.multiple_of(c * blk + st, _LANE)
        xw = xyz_ref[0, 0:1, pl.ds(base, ws)]
        yw = xyz_ref[0, 1:2, pl.ds(base, ws)]
        zw = xyz_ref[0, 2:3, pl.ds(base, ws)]
        d2 = (cx - xw) ** 2 + (cy - yw) ** 2 + (cz - zw) ** 2
        ow = oidx_ref[0, 0:1, pl.ds(base, ws)]
        key0 = jnp.where(
            jnp.logical_and(d2 < r2, cnt < nsample), ow, sentinel
        )
        remaining0 = jnp.sum((key0 < sentinel).astype(jnp.int32), 1, keepdims=True)

        def cond(carry):
            _, cnt_c, _, remaining, _, _, _ = carry
            return jnp.any(jnp.logical_and(remaining > 0, cnt_c < nsample))

        def body(carry):
            slots_c, cnt_c, key, remaining, gx_c, gy_c, gz_c = carry
            minv = jnp.min(key, axis=1, keepdims=True)
            act = jnp.logical_and(minv < sentinel, cnt_c < nsample)
            put = jnp.logical_and(s_iota2 == cnt_c, act)
            sel = key == minv  # one lane per active row (oidx unique)
            selx = jnp.sum(jnp.where(sel, xw, 0.0), 1, keepdims=True)
            sely = jnp.sum(jnp.where(sel, yw, 0.0), 1, keepdims=True)
            selz = jnp.sum(jnp.where(sel, zw, 0.0), 1, keepdims=True)
            slots_c = slots_c + jnp.where(put, minv, 0)
            gx_c = gx_c + jnp.where(put, selx, 0.0)
            gy_c = gy_c + jnp.where(put, sely, 0.0)
            gz_c = gz_c + jnp.where(put, selz, 0.0)
            cnt_c = cnt_c + act.astype(jnp.int32)
            key = jnp.where(sel, sentinel, key)
            remaining = remaining - (minv < sentinel).astype(jnp.int32)
            return slots_c, cnt_c, key, remaining, gx_c, gy_c, gz_c

        slots, cnt, _, _, gx, gy, gz = jax.lax.while_loop(
            cond, body, (slots, cnt, key0, remaining0, gx, gy, gz)
        )
        return slots, cnt, gx, gy, gz

    def block_body(c, carry):
        slots, cnt = carry[0], carry[1]
        all_full = jnp.min(cnt) >= nsample
        return jax.lax.cond(
            all_full, lambda: carry, lambda: live_block(c, *carry)
        )

    zf = jnp.zeros((tm, nsample), jnp.float32)
    init = (jnp.zeros((tm, nsample), jnp.int32),
            jnp.zeros((tm, 1), jnp.int32), zf, zf, zf)
    if nblocks == 1:
        slots, cnt, gx, gy, gz = live_block(0, *init)
    else:
        slots, cnt, gx, gy, gz = jax.lax.fori_loop(0, nblocks, block_body, init)

    live = s_iota2 < jnp.minimum(cnt, nsample)
    filled = jnp.where(live, slots, slots[:, 0:1])
    filled = jnp.where(cnt > 0, filled, 0)
    # export cnt in pad lane [nsample] for the wrapper's zero-hit fixup
    # (iota select: Mosaic has no scatter lowering for .at[].set)
    pad_iota = jax.lax.broadcasted_iota(jnp.int32, (tm, kp - nsample), 1)
    pad = jnp.where(pad_iota == 0, cnt, 0)
    out_ref[0, :, :] = jnp.concatenate([filled, pad], axis=1)

    fpad = jnp.zeros((tm, kp - nsample), jnp.float32)
    for d, g in ((0, gx), (1, gy), (2, gz)):
        gfill = jnp.where(live, g, g[:, 0:1])
        oxyz_ref[0, d, :, :] = jnp.concatenate([gfill, fpad], axis=1)


def _prepare(radius: float, xyz: jax.Array, new_xyz: jax.Array):
    """Sorting + windowing preprocessing (pure XLA, traced inside the jitted
    wrapper; also reusable standalone for window diagnostics).  Returns
    (sxyz_t, soidx2, sctr_t, s_al, e, cperm, dims) where `e` is the exact
    per-(tile, block) candidate end lane (for overflow stats) and dims packs
    the static layout."""
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    blk = _BLK
    tm = _TM
    ws = min(_WS, blk)
    n_pad = _round_up(n, blk)
    m_pad = _round_up(m, tm)
    nb = n_pad // blk
    t = m_pad // tm

    xyzf = xyz.astype(jnp.float32)
    ctrf = new_xyz.astype(jnp.float32)

    # sort key: the per-scene widest axis (walls/planes are typically
    # perpendicular to a NARROW axis, so this minimizes key clustering)
    ext = jnp.max(xyzf, axis=1) - jnp.min(xyzf, axis=1)  # (B, 3)
    axis = jnp.argmax(ext, axis=1)  # (B,)
    key = jnp.take_along_axis(xyzf, axis[:, None, None], 2)[..., 0]  # (B, N)
    key = jnp.pad(key, ((0, 0), (0, n_pad - n)), constant_values=1e9)
    xyz_pad = jnp.pad(
        xyzf, ((0, 0), (0, n_pad - n), (0, 0)), constant_values=1e9
    )

    # within-block sort (blocks = original-index ranges, kept in order)
    key_blk = key.reshape(b, nb, blk)
    order = jnp.argsort(key_blk, axis=-1)  # (B, NB, BLK)
    skey = jnp.take_along_axis(key_blk, order, -1)
    soidx = (
        order + (jnp.arange(nb, dtype=order.dtype) * blk)[None, :, None]
    ).reshape(b, n_pad)
    sxyz = jnp.take_along_axis(xyz_pad, soidx[..., None], 1)  # (B, NPAD, 3)

    # centers sorted by the same key; pads replicate the last real center so
    # tile bounds stay tight (their outputs are never gathered back)
    ckey = jnp.take_along_axis(ctrf, axis[:, None, None], 2)[..., 0]  # (B, M)
    cperm = jnp.argsort(ckey, axis=1)
    sctr = jnp.take_along_axis(ctrf, cperm[..., None], 1)
    sckey = jnp.take_along_axis(ckey, cperm, 1)
    if m_pad > m:
        sctr = jnp.concatenate(
            [sctr, jnp.broadcast_to(sctr[:, -1:], (b, m_pad - m, 3))], 1
        )
        sckey = jnp.concatenate(
            [sckey, jnp.broadcast_to(sckey[:, -1:], (b, m_pad - m))], 1
        )

    # per-(tile, block) candidate window over the key-sorted lanes.
    # The slab must contain every point whose IN-KERNEL f32 d^2 evaluates
    # < r^2: the kernel's 5-op d^2 can round below r^2 for a point whose true
    # distance is up to ~r*(1+4eps), and the f32 subtraction here can round
    # lo up / hi down by another 0.5 ulp each -- so widen the radius by 8 eps
    # and take one nextafter outward on each bound.  Without this, a
    # boundary point could be silently dropped WITHOUT tripping the v3
    # overflow fallback (e uses the same bounds), breaking the
    # data-independent-exactness invariant at the float boundary.
    r_w = float(radius) * (1.0 + 8.0 * 2.0**-23)
    ckt = sckey.reshape(b, t, tm)
    lo = jnp.nextafter(jnp.min(ckt, axis=-1) - r_w, -jnp.inf)  # (B, T)
    hi = jnp.nextafter(jnp.max(ckt, axis=-1) + r_w, jnp.inf)
    s = jnp.sum(
        (skey[:, None, :, :] < lo[:, :, None, None]).astype(jnp.int32), -1
    )  # (B, T, NB)
    e = jnp.sum(
        (skey[:, None, :, :] <= hi[:, :, None, None]).astype(jnp.int32), -1
    )
    s_al = jnp.minimum((s // _LANE) * _LANE, blk - ws)

    sxyz_t = jnp.transpose(sxyz, (0, 2, 1))  # (B, 3, NPAD)
    soidx2 = soidx[:, None, :].astype(jnp.int32)  # (B, 1, NPAD)
    sctr_t = jnp.transpose(sctr.reshape(b, t, tm, 3), (0, 1, 3, 2))
    dims = (b, n, m, blk, tm, ws, n_pad, m_pad, nb, t)
    return sxyz_t, soidx2, sctr_t, s_al, e, cperm, dims


@functools.partial(jax.jit, static_argnums=(0,))
def window_spans(radius: float, xyz: jax.Array, new_xyz: jax.Array):
    """Diagnostic: per-(batch, tile, block) candidate span beyond the aligned
    window start, and whether the call would take the v3 fallback."""
    _, _, _, s_al, e, _, dims = _prepare(radius, xyz, new_xyz)
    ws = dims[5]
    span = e - s_al
    return span, jnp.any(span > ws)


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query_pallas_sorted(
    radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array
) -> jax.Array:
    """xyz: (B, N, 3), new_xyz: (B, M, 3) -> (B, M, nsample) int32.

    Sort-assisted exact variant (module docstring); falls back to
    ball_query_pallas_v3 for the whole call when any candidate window
    exceeds the static width (checked outside the kernel).
    """
    sxyz_t, soidx2, sctr_t, s_al, e, cperm, dims = _prepare(radius, xyz, new_xyz)
    b, n, m, blk, tm, ws, n_pad, m_pad, nb, t = dims
    kp = _round_up(nsample, 128)
    overflow = jnp.any(e > s_al + ws)
    if _COUNT_FALLBACKS and _callbacks_supported():
        jax.debug.callback(_note_overflow, overflow)

    def sorted_path(_):
        out = pl.pallas_call(
            functools.partial(_bqs_kernel, float(radius) ** 2, nsample, ws, blk),
            out_shape=jax.ShapeDtypeStruct((b, m_pad, kp), jnp.int32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, t),
                in_specs=[
                    pl.BlockSpec(
                        (1, 3, n_pad), lambda i, j, st: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 1, n_pad), lambda i, j, st: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 1, 3, tm), lambda i, j, st: (i, j, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, tm, kp), lambda i, j, st: (i, j, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
        )(s_al.astype(jnp.int32).reshape(-1), sxyz_t, soidx2, sctr_t)
        # un-sort the centers: original center i lives at sorted row inv[i]
        inv = jnp.argsort(cperm, axis=1)
        return jnp.take_along_axis(out[:, :, :nsample], inv[..., None], 1)

    return jax.lax.cond(
        overflow,
        lambda _: ball_query_pallas_v3(radius, nsample, xyz, new_xyz),
        sorted_path,
        operand=None,
    )


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query_and_group_sorted(
    radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array
):
    """Fused ball query + coordinate gather.

    Returns (idx, grouped) where idx == ball_query_pallas_sorted(...) and
    grouped == group_points(xyz, idx) bit-exactly ((B, M, nsample, 3) f32,
    reference fill semantics from ball_query_gpu.cu:30-45 /
    group_points_gpu.cu:9-22): the gather rides the query kernel's extraction
    loop, where each hit's coordinates are already resident in VMEM -- the
    separate group-points pass (14.9 ms Pallas / 32 ms XLA at the eval shape)
    disappears.  Window-overflow scenes fall back to v3 + take_along_axis
    inside lax.cond, keeping exactness data-independent."""
    sxyz_t, soidx2, sctr_t, s_al, e, cperm, dims = _prepare(radius, xyz, new_xyz)
    b, n, m, blk, tm, ws, n_pad, m_pad, nb, t = dims
    kp = _round_up(nsample, 128)
    assert kp > nsample, "cnt export needs at least one pad lane"
    overflow = jnp.any(e > s_al + ws)
    if _COUNT_FALLBACKS and _callbacks_supported():
        jax.debug.callback(_note_overflow, overflow)
    xyzf = xyz.astype(jnp.float32)

    def sorted_path(_):
        out, oxyz = pl.pallas_call(
            functools.partial(
                _bqs_gather_kernel, float(radius) ** 2, nsample, ws, blk
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, m_pad, kp), jnp.int32),
                jax.ShapeDtypeStruct((b, 3, m_pad, kp), jnp.float32),
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, t),
                in_specs=[
                    pl.BlockSpec(
                        (1, 3, n_pad), lambda i, j, st: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 1, n_pad), lambda i, j, st: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 1, 3, tm), lambda i, j, st: (i, j, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=(
                    pl.BlockSpec(
                        (1, tm, kp), lambda i, j, st: (i, j, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 3, tm, kp), lambda i, j, st: (i, 0, j, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ),
            ),
        )(s_al.astype(jnp.int32).reshape(-1), sxyz_t, soidx2, sctr_t)
        inv = jnp.argsort(cperm, axis=1)
        idx = jnp.take_along_axis(out[:, :, :nsample], inv[..., None], 1)
        cnt = jnp.take_along_axis(out[:, :, nsample], inv, 1)  # (B, M)
        g = jnp.transpose(oxyz[:, :, :, :nsample], (0, 2, 3, 1))  # (B,Mp,K,3)
        g = jnp.take_along_axis(g, inv[..., None, None], 1)
        # zero-hit rows gather original index 0 (the CUDA .zero_() buffer):
        # point 0's coordinates are not addressable in-kernel, substitute here
        g = jnp.where((cnt == 0)[..., None, None], xyzf[:, 0][:, None, None, :], g)
        return idx, g

    def fallback(_):
        idx = ball_query_pallas_v3(radius, nsample, xyz, new_xyz)
        # pallas two-level gather (bit-exact vs take_along_axis, ~2x faster
        # at the hot shape) so an overflow scene does not pay the 32 ms XLA
        # gather on top of v3
        from coda_neurips2023_tpu.ops.pallas_group_gather import (
            group_points_pallas,
        )

        return idx, group_points_pallas(xyzf, idx)

    return jax.lax.cond(overflow, fallback, sorted_path, operand=None)
