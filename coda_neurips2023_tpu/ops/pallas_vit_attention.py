"""Pallas TPU fused attention for ViT-shaped workloads (big batch, short
sequence).

The CLIP image tower runs attention at (B=256 crops, heads=12, seq=197,
head_dim=64).  Stock XLA materializes the (B, H, S, S) scores/softmax in HBM
-- measured 4.8 ms/layer on v5e, ~58 ms of the 81 ms bf16 tower forward.
This kernel grids over B ONLY (256 cells) and computes ALL heads per cell
with a single head-batched dot_general pair, keeping the (H, S, S) f32
scores resident in VMEM (~1.9 MB):

  per cell: scores = q @ k^T (MXU, batched over H), softmax (VPU, f32),
  out = p @ v (MXU) -- ~400 MFLOPs.

Round-3 A/B history (BASELINE.md): a per-head python loop in-cell measured
4.2 ms/layer (no better than XLA once wrapper transposes were paid); the
head-batched form + transpose-free integration is what wins.  The caller
(models/clip.py FusedAttention) produces q/k/v directly in (B, H, S, D) by
einsum'ing the projection as 'bsw,whd->bhsd' -- the layout change rides the
projection matmul's output instead of a separate 77 MB HBM transpose
(measured ~1 ms/tensor/layer).  S stays at its logical 197: Mosaic pads
blocks to tiles internally and masks reductions, so no explicit key mask is
needed.

Numerics: scores and softmax in f32 (flax dot_product_attention promotes
the same way for bf16 inputs), p cast back to the value dtype for the
second matmul (the MXU's native bf16 path).

Correctness is pinned against flax attention in tests/test_clip_convert.py
(interpret mode on CPU) and the on-chip A/B in BASELINE.md.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# interpret mode lets the CPU test suite execute the kernel (tests force
# JAX_PLATFORMS=cpu); flipped by tests only, never in production.
_INTERPRET = os.environ.get("CODA_VIT_ATTN_INTERPRET", "0") == "1"


# batch elements per grid cell: amortizes per-cell overhead against VMEM
# (scores f32 = BB*H*S*S*4 bytes must fit with double-buffered I/O).
# BB=2 at the ViT-B/16 shape allocates 17.62M scoped VMEM > the 16M limit
# (compile OOM, measured round-3) -- BB=1 (~8.5M) is the only setting that
# fits; env-sweepable for other shapes.
_BLOCK_B = int(os.environ.get("CODA_VIT_ATTN_BLOCK_B", "1"))


def _attn_kernel(sm_scale: float, q_ref, k_ref, v_ref, o_ref):
    # refs: (BB, H, S, D); BB batch elements per grid cell, (BB*H) riding the
    # dot_general batch dim.
    bb, h, s, d = q_ref.shape
    q = q_ref[...].reshape(bb * h, s, d)
    k = k_ref[...].reshape(bb * h, s, d)
    v = v_ref[...].reshape(bb * h, s, d)
    # Fold the softmax scale into q when it is a power of two (always true
    # for d=64: 1/8): an exact exponent shift on S*D elements instead of a
    # multiply over the S*S scores (3x fewer VPU ops at the ViT shape).
    frac = math.frexp(sm_scale)[0]
    if frac in (0.5, -0.5):
        q = q * jnp.asarray(sm_scale, q.dtype)
        post_scale = None
    else:
        post_scale = sm_scale
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BB*H, S, S) f32
    if post_scale is not None:
        scores = scores * post_scale
    m = jnp.max(scores, axis=2, keepdims=True)
    e = jnp.exp(scores - m)
    # one reciprocal per row + a broadcast multiply beats a broadcast divide
    # over all S*S probabilities (VPU divides are multi-pass)
    p = (e * (1.0 / jnp.sum(e, axis=2, keepdims=True))).astype(v.dtype)
    out = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BB*H, S, D)
    o_ref[...] = out.reshape(bb, h, s, d).astype(o_ref.dtype)


@jax.jit
def _vit_attention_impl(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    b, h, s, d = q.shape
    bb = _BLOCK_B
    while b % bb:
        bb //= 2
    bb = max(bb, 1)
    sm_scale = 1.0 / math.sqrt(d)
    spec = pl.BlockSpec((bb, h, s, d), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    # per-cell VMEM: 4 double-buffered bf16 I/O blocks + the f32 scores and
    # softmax intermediates.  BB>1 exceeds the 16 MB default scoped limit
    # (round-3 compile OOM at 17.62M) -- size the limit to the actual
    # footprint instead of forfeiting the batching (v5e has 128 MB physical;
    # same fix as the masked-attention kernel, round 4).
    io = 4 * bb * h * s * d * q.dtype.itemsize * 2
    scores = bb * h * s * s * 4 * 3  # scores + exp + p (f32-equivalent bound)
    limit = min(int((io + scores) * 1.5) + (1 << 20), 100 << 20)
    params = pltpu.CompilerParams(vmem_limit_bytes=max(limit, 32 << 20))
    return pl.pallas_call(
        functools.partial(_attn_kernel, sm_scale),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        grid=(b // bb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        compiler_params=params,
        interpret=_INTERPRET,
    )(q, k, v)


def _attention_reference(q, k, v):
    """Plain-jnp restatement of the kernel's math; exists ONLY to supply the
    custom VJP below (same softmax-in-f32 numerics)."""
    sm_scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * sm_scale
    p = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v).astype(q.dtype)


@jax.custom_vjp
def vit_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Softmax attention at (B, H, S, D), no masking (bidirectional ViT).
    S may be any length (197 for ViT-B/16); Mosaic handles tile padding.

    custom_vjp rationale: the fused stage-1 step computes distillation
    targets INSIDE value_and_grad (they depend on the predicted boxes), so
    this op gets jvp-traced even though the CLIP call is stop_gradient'ed.
    Pallas' auto-derived jvp runs primal+tangent in ONE kernel, doubling
    in-kernel VMEM past the 16 MB scoped limit (measured 17.62M -> compile
    OOM).  With custom_vjp the primal kernel runs as-is and the backward is
    the plain-XLA attention VJP -- which XLA DCEs when (as here) no cotangent
    reaches it."""
    return _vit_attention_impl(q, k, v)


def _vjp_fwd(q, k, v):
    return _vit_attention_impl(q, k, v), (q, k, v)


def _vjp_bwd(res, g):
    q, k, v = res
    _, pullback = jax.vjp(_attention_reference, q, k, v)
    return pullback(g)


vit_attention.defvjp(_vjp_fwd, _vjp_bwd)


def fused_attention_fn(query, key, value, bias=None, mask=None, **kwargs):
    """Drop-in `attention_fn` for flax MultiHeadDotProductAttention (shapes
    (B, S, H, D)).  Mask-free only.  NOTE: this wrapper pays two explicit HBM
    transposes per call (~1 ms/tensor at the CLIP shape) -- production code
    uses models/clip.py FusedAttention, which einsums the projections
    straight into (B, H, S, D); this wrapper exists for flax-API
    compatibility and the correctness tests."""
    assert bias is None and mask is None, "fused path is mask-free (ViT)"
    q, k, v = (jnp.swapaxes(x, 1, 2) for x in (query, key, value))
    out = vit_attention(q, k, v)
    return jnp.swapaxes(out, 1, 2)
