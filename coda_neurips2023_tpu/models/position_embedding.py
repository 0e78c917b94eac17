"""Positional encodings over 3D coordinates (flax).

Re-implementation of PositionEmbeddingCoordsSine
(/root/reference/models/position_embedding.py:12-140).  Channels-last output
(B, N, d_pos) instead of the reference's (B, d_pos, N).

Fourier mode draws a fixed Gaussian projection matrix `gauss_B` at init; like
the reference buffer it is checkpoint state but not trainable, so it lives in
the "constants" variable collection (the reference registers it as a torch
buffer -- the random draw is part of the model identity).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from coda_neurips2023_tpu.ops.box_ops import shift_scale_points


class PositionEmbeddingCoordsSine(nn.Module):
    d_pos: int
    pos_type: str = "fourier"  # "fourier" | "sine"
    normalize: bool = True
    temperature: float = 10000.0
    scale: Optional[float] = None
    gauss_scale: float = 1.0
    d_in: int = 3

    def _fourier(self, xyz, num_channels, input_range):
        d_out = (num_channels or self.d_pos) // 2
        gauss_b = self.variable(
            "constants",
            "gauss_B",
            lambda rng: nn.initializers.normal(stddev=self.gauss_scale)(
                rng, (self.d_in, self.d_pos // 2), jnp.float32
            ),
            self.make_rng("params") if self.is_initializing() else None,
        ).value
        if self.normalize:
            xyz = shift_scale_points(xyz, input_range)
        xyz = xyz * (2 * np.pi)
        proj = jnp.einsum("bnd,dk->bnk", xyz, gauss_b[:, :d_out])
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def _sine(self, xyz, num_channels, input_range):
        # reference get_sine_embeddings (position_embedding.py:41-86)
        num_channels = num_channels or self.d_pos
        scale = self.scale if self.scale is not None else 2 * np.pi
        if self.normalize:
            xyz = shift_scale_points(xyz, input_range)
        ndim = num_channels // xyz.shape[2]
        if ndim % 2 != 0:
            ndim -= 1
        rems = num_channels - ndim * xyz.shape[2]
        embeds = []
        for d in range(xyz.shape[2]):
            cdim = ndim
            if rems > 0:
                cdim += 2
                rems -= 2
            dim_t = np.arange(cdim, dtype=np.float32)
            dim_t = self.temperature ** (2 * np.floor(dim_t / 2) / cdim)
            pos = xyz[:, :, d] * scale
            pos = pos[:, :, None] / jnp.asarray(dim_t)
            pos = jnp.stack([jnp.sin(pos[:, :, 0::2]), jnp.cos(pos[:, :, 1::2])], axis=3)
            embeds.append(pos.reshape(pos.shape[0], pos.shape[1], -1))
        return jnp.concatenate(embeds, axis=-1)

    @nn.compact
    def __call__(self, xyz, num_channels=None, input_range=None):
        """xyz: (B, N, 3) -> (B, N, d_pos). Non-differentiable in the reference
        (wrapped in no_grad); callers stop_gradient where it matters."""
        if self.pos_type == "fourier":
            return self._fourier(xyz, num_channels, input_range)
        return self._sine(xyz, num_channels, input_range)
