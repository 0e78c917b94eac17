"""PointNet++ set-abstraction module (flax, channels-last).

Re-design of PointnetSAModuleVotes
(/root/reference/third_party_pointnet2/pointnet2/pointnet2_modules.py:161-280)
and SharedMLP (pytorch_utils.py:8-60):

  FPS -> gather centers -> ball-query+group (recentered, radius-normalized
  xyz prepended) -> per-point MLP -> max-pool over the neighborhood.

The reference's SharedMLP is a stack of 1x1 Conv2d+BN+ReLU over a
(B, C, npoint, nsample) tensor; in channels-last form each 1x1 conv is a
Dense over the last axis of (B, npoint, nsample, C), which XLA tiles onto the
MXU as one large (B*npoint*nsample, C) matmul.  BatchNorm statistics are over
(B, npoint, nsample) -- globally synchronized for free under batch-sharded
jit (reference needs SyncBatchNorm, main.py:993).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from coda_neurips2023_tpu.ops.grouping import query_and_group
from coda_neurips2023_tpu.ops.sampling import furthest_point_sample, gather_points


class SharedMLP(nn.Module):
    dims: Sequence[int]  # output dims per layer
    bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, use_bias=not self.bn, dtype=self.dtype, name=f"conv{i}")(x)
            if self.bn:
                # BN statistics/affine in f32 for stability; matmuls above run
                # in compute dtype
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=jnp.float32, name=f"bn{i}",
                )(x.astype(jnp.float32))
            x = nn.relu(x)
        return x


class PointnetSAModuleVotes(nn.Module):
    """Single-scale set abstraction with max pooling.

    Call: (xyz (B,N,3), features (B,N,C) or None) ->
          (new_xyz (B,npoint,3), new_features (B,npoint,mlp[-1]), inds (B,npoint)).
    """

    npoint: int
    radius: float
    nsample: int
    mlp_dims: Sequence[int]  # reference `mlp` list: [in_dim, h1, ..., out]
    use_xyz: bool = True
    normalize_xyz: bool = False
    pooling: str = "max"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, features=None, inds=None, train: bool = False):
        if inds is None:
            inds = furthest_point_sample(xyz, self.npoint)
        new_xyz = gather_points(xyz, inds)

        grouped, grouped_xyz = query_and_group(
            self.radius,
            self.nsample,
            xyz,
            new_xyz,
            features,
            normalize_xyz=self.normalize_xyz,
        )
        if not self.use_xyz and features is not None:
            grouped = grouped[..., 3:]

        # mlp_dims[0] is the input channel count (+3 handled by use_xyz concat)
        out = SharedMLP(tuple(self.mlp_dims[1:]), dtype=self.dtype, name="mlp_module")(
            grouped, train=train
        )
        if self.pooling == "max":
            new_features = jnp.max(out, axis=2)
        elif self.pooling == "avg":
            new_features = jnp.mean(out, axis=2)
        elif self.pooling == "rbf":
            sigma = self.radius / 2
            rbf = jnp.exp(
                -jnp.sum(grouped_xyz ** 2, axis=-1) / (sigma ** 2) / 2
            )  # (B, npoint, nsample)
            new_features = jnp.sum(out * rbf[..., None], axis=2) / float(self.nsample)
        else:
            raise ValueError(self.pooling)
        return new_xyz, new_features, inds
