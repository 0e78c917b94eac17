"""Pallas TPU kernel for furthest point sampling.

FPS is inherently sequential in the number of samples m (each selection
depends on the running min-distance array).  The reference solves this with
one CUDA thread-block per batch row + shared-memory tree reduction
(/root/reference/third_party_pointnet2/pointnet2/_ext_src/src/sampling_gpu.cu:71-168).

On TPU the right design is to keep the whole point cloud (N x 3 floats,
~240 KB at N=20k) and the running min-distance array resident in VMEM for the
entire m-step loop, so the sequential loop never touches HBM.  Each step is a
fused VPU pass: distance update, masked max-reduce, first-index argmax.

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


def _fps_kernel(npoint: int, xyz_ref, out_ref, mind_ref):
    # xyz_ref: (1, 3, Npad) f32; out_ref: (1, 1, Mpad) i32; mind_ref: (1, Npad) f32
    n = xyz_ref.shape[-1]
    x = xyz_ref[0, 0:1, :]
    y = xyz_ref[0, 1:2, :]
    z = xyz_ref[0, 2:3, :]
    valid = (x * x + y * y + z * z) > _MAG_EPS
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    out_ref[0, 0, 0] = 0
    mind_ref[:] = jnp.full((1, n), _INIT_DIST, dtype=jnp.float32)

    def body(j, last):
        lx, ly, lz = last
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        m = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = m
        cand = jnp.where(valid, m, -1.0)
        best = jnp.max(cand)
        idx = jnp.min(jnp.where(cand == best, iota, n))
        out_ref[0, 0, j] = idx
        sel = iota == idx
        zeros = jnp.zeros_like(x)
        return (
            jnp.sum(jnp.where(sel, x, zeros)),
            jnp.sum(jnp.where(sel, y, zeros)),
            jnp.sum(jnp.where(sel, z, zeros)),
        )

    init = (x[0, 0], y[0, 0], z[0, 0])
    jax.lax.fori_loop(1, npoint, body, init)


@functools.partial(jax.jit, static_argnums=(1,))
def fps_pallas(xyz: jax.Array, npoint: int) -> jax.Array:
    """xyz: (B, N, 3) -> (B, npoint) int32 indices."""
    b, n, _ = xyz.shape
    n_pad = _round_up(n, 128)
    m_pad = _round_up(npoint, 128)
    # channels-first so N sits in lanes; zero padding is self-masking (|p|^2=0).
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))
    if n_pad != n:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - n)))

    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint),
        out_shape=jax.ShapeDtypeStruct((b, 1, m_pad), jnp.int32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32)],
    )(xyz_t)
    return out[:, 0, :npoint]
