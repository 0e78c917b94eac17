"""Pallas TPU fused (optionally radius-masked) attention for the 3DETR encoder.

The encoder runs self-attention at S=2048 (vanilla, the wired CoDA configs:
the reference scripts never pass --enc_type, main.py:65 defaults vanilla)
or S=2048/1024 with a "points within euclidean distance < radius attend"
mask (--enc_type masked, reference transformer.py:146-212).  The XLA
formulation materializes, per layer at bs 32: the (B, H, S, S) f32 scores
(2.1 GB at S=2048) and -- on the masked path -- the (B, S, S) pairwise
distances (537 MB); several GB of HBM round-trips per layer that dwarf the
actual matmul FLOPs.

This kernel grids over (B, S/TQ) query tiles and keeps everything else
VMEM-resident per batch row:

  per cell: the radius mask (if any) is REBUILT from the raw coordinates (a
  (TQ, 3) x (3, S) MXU cross term + row/col squared norms -- never touches
  HBM), scores for all H heads stay in VMEM ((H, TQ, S) f32 ~4 MB),
  softmax on the VPU, and the (TQ, S) x (S, D) value matmuls finish on the
  MXU.  HBM traffic collapses to reading q/k/v (+xyz) once and writing the
  output.

Numerics mirror flax dot_product_attention in structure: the query is
pre-scaled by 1/sqrt(D) BEFORE the QK matmul, disallowed entries get
jnp.finfo(f32).min before the softmax, and the mask comparison reproduces
the reference quirk (euclidean DISTANCE compared against a SQUARED radius,
transformer.py:154-161) with the same sqrt(max(d2, 0)) < r op order as the
XLA path in models/transformer.py.  The two big dots run with operands in
`compute_dtype` (default bf16): on v5e the XLA path's f32 matmuls already
execute as one bf16 MXU pass under --xla_allow_excess_precision, so bf16
operands match the incumbent's effective precision while keeping the
kernel at 1-pass MXU throughput; accumulation and softmax stay f32.

The projections are NOT part of the kernel: models/transformer.py's
FusedMaskedSelfAttention module einsums them straight into the kernel's
preferred layouts ((B,H,S,D) for q/v, (B,H,D,S) for k -- the transpose
rides the projection matmul for free, same trick as the CLIP tower's
FusedAttention).

Used on the deterministic path only (flax MHA applies dropout to attention
WEIGHTS in train mode, which this kernel does not implement); training
keeps the stock flax layer, so training numerics are byte-for-byte
unchanged.  A custom_vjp with a plain-XLA backward is installed anyway so
an accidental grad trace cannot double in-kernel VMEM (lesson from the
CLIP kernel: jvp tracing runs primal+tangent in one kernel otherwise).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = os.environ.get("CODA_MASKED_ATTN_INTERPRET", "0") == "1"

_TQ = 128  # query rows per grid cell


def _kernel(radius: float, h: int, cdt, q_ref, k_ref, v_ref, qx_ref, kx_ref,
            o_ref):
    # q_ref: (1, H, TQ, D) pre-scaled by 1/sqrt(D); k_ref: (1, H, D, S);
    # v_ref: (1, H, S, D); qx_ref: (1, TQ, 3); kx_ref: (1, 3, S);
    # o_ref: (1, H, TQ, D).  radius <= 0 -> unmasked (vanilla encoder).
    big_neg = jnp.finfo(jnp.float32).min

    allowed = None
    if radius > 0:
        qx = qx_ref[0]  # (TQ, 3)
        kx = kx_ref[0]  # (3, S)
        cross = jax.lax.dot_general(
            qx, kx, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (TQ, S)
        sq_q = jnp.sum(qx * qx, axis=1, keepdims=True)  # (TQ, 1)
        sq_k = jnp.sum(kx * kx, axis=0, keepdims=True)  # (1, S)
        d2 = jnp.maximum(sq_q + sq_k - 2.0 * cross, 0.0)
        # reference quirk kept verbatim: DISTANCE < squared radius
        allowed = jnp.sqrt(d2) < radius  # (TQ, S)

    for head in range(h):
        q = q_ref[0, head].astype(cdt)  # (TQ, D)
        k = k_ref[0, head].astype(cdt)  # (D, S)
        v = v_ref[0, head].astype(cdt)  # (S, D)
        scores = jax.lax.dot_general(
            q, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (TQ, S)
        if allowed is not None:
            scores = jnp.where(allowed, scores, big_neg)
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(cdt)
        o_ref[0, head] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(5, 6))
def _impl(q, k, v, qxyz, kxyz_t, radius, compute_dtype):
    # q: (B, H, TQ-multiple Sq, D) PRE-SCALED; k: (B, H, D, Skv);
    # v: (B, H, Skv, D); qxyz: (B, Sq, 3); kxyz_t: (B, 3, Skv).
    # Sq == Skv for encoder self-attention; Sq=nqueries, Skv=S for decoder
    # cross-attention (radius <= 0 there).
    b, h, sq, d = q.shape
    skv = v.shape[2]
    tq = _TQ
    cdt = jnp.dtype(compute_dtype)
    # per-cell VMEM: q/out (h,tq,d) + k/v (h,d,skv)/(h,skv,d) + (tq,skv)
    # scores, DOUBLE-buffered by the pipeline.  The decoder cross shape
    # (h=4, d=128, skv=2048) needs ~17 MB -- over the 16 MB default scoped
    # limit but nowhere near the 128 MB physical VMEM, so size the limit to
    # the actual footprint (+50% headroom for Mosaic scratch) instead of
    # gating the shape out (measured OOM: BENCH r4 A/B, 16.91M vs 16.00M).
    elt = 4  # f32 operands in HBM; cdt casts happen in-kernel
    per_buf = (2 * h * tq * d + 2 * h * skv * d + tq * skv + 3 * (tq + skv)) * elt
    vmem_limit = min(int(per_buf * 2 * 1.5) + (1 << 20), 100 * (1 << 20))
    params = pltpu.CompilerParams(
        vmem_limit_bytes=max(vmem_limit, 32 * (1 << 20))
    )
    return pl.pallas_call(
        functools.partial(_kernel, radius, h, cdt),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        grid=(b, sq // tq),
        in_specs=[
            pl.BlockSpec((1, h, tq, d), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, d, skv), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, skv, d), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, skv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, tq, d), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=params,
        interpret=_INTERPRET,
    )(q, k, v, qxyz, kxyz_t)


def _reference(q, k, v, qxyz, kxyz_t, radius, compute_dtype=jnp.float32):
    """Plain-jnp restatement (same op order); supplies the custom_vjp
    backward and the CPU oracle for tests."""
    big_neg = jnp.finfo(jnp.float32).min
    cdt = jnp.dtype(compute_dtype)
    scores = jnp.einsum(
        "bhqd,bhds->bhqs", q.astype(cdt), k.astype(cdt),
        preferred_element_type=jnp.float32,
    )
    if radius > 0:
        cross = jnp.einsum("bqc,bcs->bqs", qxyz, kxyz_t)
        sq_q = jnp.sum(qxyz * qxyz, axis=2)[:, :, None]
        sq_k = jnp.sum(kxyz_t * kxyz_t, axis=1)[:, None, :]
        allowed = jnp.sqrt(jnp.maximum(sq_q + sq_k - 2.0 * cross, 0.0)) < radius
        scores = jnp.where(allowed[:, None], scores, big_neg)
    p = jax.nn.softmax(scores, axis=-1).astype(cdt)
    return jnp.einsum(
        "bhqs,bhsd->bhqd", p, v.astype(cdt),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def masked_attention(q, k, v, qxyz, kxyz_t, radius, compute_dtype="bfloat16"):
    """Radius-masked (radius > 0) or plain (radius <= 0) softmax attention.

    q: (B, H, S, D) queries ALREADY scaled by 1/sqrt(D) (mirrors flax,
    which scales before the QK matmul); k: (B, H, D, S); v: (B, H, S, D);
    qxyz: (B, S, 3) and kxyz_t: (B, 3, S) the SAME point coordinates in the
    two layouts the kernel wants (ignored, pass zeros, when radius <= 0);
    radius: static mask radius compared against euclidean distance (the
    reference's distance-vs-squared-radius quirk is the caller's contract).
    S must be a multiple of 128.  compute_dtype: operand dtype of the two
    big dots (module docstring).
    """
    return _impl(q, k, v, qxyz, kxyz_t, radius, compute_dtype)


def _vjp_fwd(radius, compute_dtype, q, k, v, qxyz, kxyz_t):
    return (
        _impl(q, k, v, qxyz, kxyz_t, radius, compute_dtype),
        (q, k, v, qxyz, kxyz_t),
    )


def _vjp_bwd(radius, compute_dtype, res, g):
    q, k, v, qxyz, kxyz_t = res
    _, pullback = jax.vjp(
        lambda q_, k_, v_: _reference(q_, k_, v_, qxyz, kxyz_t, radius,
                                      compute_dtype),
        q, k, v,
    )
    dq, dk, dv = pullback(g)
    return dq, dk, dv, jnp.zeros_like(qxyz), jnp.zeros_like(kxyz_t)


masked_attention.defvjp(_vjp_fwd, _vjp_bwd)
