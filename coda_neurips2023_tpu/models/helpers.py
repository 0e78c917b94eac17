"""MLP building blocks (flax).

Re-design of the reference GenericMLP (/root/reference/models/helpers.py:45-112)
for channels-last TPU layout: the reference's 1x1 Conv1d over (B, C, N) is a
plain Dense over (B, N, C) here, which XLA maps straight onto the MXU.

Norm options mirror NORM_DICT (helpers.py:27-32): "bn1d" = BatchNorm over the
channel axis with batch statistics taken over (B, N) -- under a batch-sharded
global jit this is automatically synchronized across devices, giving the
semantics the reference gets from SyncBatchNorm (main.py:993) with zero extra
code; "ln" = LayerNorm; None = identity.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

ACT = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "leakyrelu": lambda x: nn.leaky_relu(x, negative_slope=0.1),
}


class GenericMLP(nn.Module):
    hidden_dims: Sequence[int]
    output_dim: int
    norm: Optional[str] = None  # "bn1d" | "ln" | None
    activation: str = "relu"
    dropout: Optional[float] = None
    hidden_use_bias: bool = False
    output_use_bias: bool = True
    output_use_activation: bool = False
    output_use_norm: bool = False
    weight_init: Optional[str] = None  # "xavier_uniform" | None
    dtype: jnp.dtype = jnp.float32

    def _dense(self, dim, use_bias, name):
        kernel_init = (
            nn.initializers.xavier_uniform()
            if self.weight_init == "xavier_uniform"
            else nn.initializers.lecun_normal()
        )
        return nn.Dense(
            dim, use_bias=use_bias, kernel_init=kernel_init, dtype=self.dtype, name=name
        )

    def _norm(self, x, train, name):
        if self.norm == "bn1d":
            # normalize in f32 regardless of compute dtype
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name=name
            )(x.astype(jnp.float32))
        if self.norm == "ln":
            return nn.LayerNorm(epsilon=1e-5, name=name)(x.astype(jnp.float32))
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = ACT[self.activation]
        for i, h in enumerate(self.hidden_dims):
            x = self._dense(h, self.hidden_use_bias, f"layer{i}")(x)
            x = self._norm(x, train, f"norm{i}")
            x = act(x)
            if self.dropout is not None and self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = self._dense(self.output_dim, self.output_use_bias, "out")(x)
        if self.output_use_norm:
            x = self._norm(x, train, "out_norm")
        if self.output_use_activation:
            x = act(x)
        return x
