"""Pallas TPU kernel for furthest point sampling.

FPS is inherently sequential in the number of samples m (each selection
depends on the running min-distance array).  The reference solves this with
one CUDA thread-block per batch row + shared-memory tree reduction
(/root/reference/third_party_pointnet2/pointnet2/_ext_src/src/sampling_gpu.cu:71-168).

TPU design: a TensorCore has no independent "blocks", so instead of a grid
over batch rows (which would serialize on a single-core chip) ALL batch rows
advance in lockstep -- coordinates live in VMEM as (B, N) planes (batch in
sublanes, points in lanes), and each of the m sequential steps is one fused
VPU pass over the whole (B, N) tile: distance update, masked row-max,
first-index row-argmax, masked coordinate extraction.  Nothing touches HBM
inside the loop.

Parity quirks reproduced from the CUDA kernel:
  * index 0 is always selected first (sampling_gpu.cu:89);
  * points with squared norm <= 1e-3 are never selected (line 104) -- this
    also makes zero-padding of N up to a lane multiple self-masking;
  * ties broken toward the earliest index (strict `>` update, line 110).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAG_EPS = 1e-3
_INIT_DIST = 1e10


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(npoint: int, x_ref, y_ref, z_ref, out_ref):
    # refs: (B, Npad) f32 coordinate planes; out_ref: (B, Mpad) i32
    b, n = x_ref.shape
    m_pad = out_ref.shape[-1]
    x = x_ref[:, :]
    y = y_ref[:, :]
    z = z_ref[:, :]
    valid = (x * x + y * y + z * z) > _MAG_EPS
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (b, m_pad), 1)

    def body(j, carry):
        out_vec, mind, lx, ly, lz = carry
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        mind = jnp.minimum(mind, d)
        cand = jnp.where(valid, mind, -1.0)
        best = jnp.max(cand, axis=1, keepdims=True)  # (B, 1)
        idx = jnp.min(jnp.where(cand == best, iota, n), axis=1, keepdims=True)
        out_vec = jnp.where(iota_m == j, idx, out_vec)
        sel = iota == idx
        zeros = jnp.zeros_like(x)
        lx = jnp.sum(jnp.where(sel, x, zeros), axis=1, keepdims=True)
        ly = jnp.sum(jnp.where(sel, y, zeros), axis=1, keepdims=True)
        lz = jnp.sum(jnp.where(sel, z, zeros), axis=1, keepdims=True)
        return (out_vec, mind, lx, ly, lz)

    init = (
        jnp.zeros((b, m_pad), jnp.int32),
        jnp.full((b, n), _INIT_DIST, dtype=jnp.float32),
        x[:, 0:1],
        y[:, 0:1],
        z[:, 0:1],
    )
    out_vec, _, _, _, _ = jax.lax.fori_loop(1, npoint, body, init)
    out_ref[:, :] = out_vec  # column 0 stays 0 (seed index)


def _batch_block(n_pad: int) -> int:
    """Largest multiple-of-8 row block keeping ~6 (BB, n_pad) f32 arrays
    (3 coordinate planes + running min-distance + distance/candidate
    temporaries) within a conservative VMEM budget."""
    budget = 10 * 1024 * 1024
    bb = budget // (n_pad * 4 * 6)
    return max(8, (bb // 8) * 8)


@functools.partial(jax.jit, static_argnums=(1,))
def fps_pallas(xyz: jax.Array, npoint: int) -> jax.Array:
    """xyz: (B, N, 3) -> (B, npoint) int32 indices."""
    b, n, _ = xyz.shape
    n_pad = _round_up(n, 128)
    m_pad = _round_up(npoint, 128)
    bb = min(_batch_block(n_pad), _round_up(b, 8))
    b_pad = _round_up(b, bb)
    xyz_f = xyz.astype(jnp.float32)
    planes = []
    for d in range(3):
        p = xyz_f[:, :, d]
        p = jnp.pad(p, ((0, b_pad - b), (0, n_pad - n)))  # zero pad == self-masking
        planes.append(p)

    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint),
        out_shape=jax.ShapeDtypeStruct((b_pad, m_pad), jnp.int32),
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec((bb, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        * 3,
        out_specs=pl.BlockSpec((bb, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(*planes)
    return out[:b, :npoint]
