"""Device mesh + sharding helpers: the TPU-native distributed substrate.

Replaces the reference's process-per-GPU DDP/NCCL stack
(/root/reference/utils/dist.py, main.py:964-1108) with single-controller
SPMD:

  * one 1-D mesh axis "dp" over all chips (ICI); the global batch is sharded
    over it (`shard_batch`), parameters/optimizer state are replicated;
  * ONE `jax.jit`-compiled train step over the mesh -- XLA inserts the
    gradient/loss collectives that DDP does by hand (allreduce via bucketing,
    dist.py:67-87) and keeps them on ICI;
  * BatchNorm statistics are computed over the global (sharded) batch inside
    the jit, which IS SyncBatchNorm (main.py:993) by construction;
  * eval-side metric gathering happens by device_get of the (already global)
    jit outputs -- the reference's all_gather_dict (dist.py:164-186)
    disappears.

The model is small (256/512-dim); TP/PP/SP/EP are deliberately absent, as in
the reference (SURVEY.md section 2.2): DP over ICI is the strategy, so the
mesh is 1-D.  `make_mesh` still accepts an axis spec so a 2-D (dp, mp) mesh
can be introduced without touching call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("dp",)) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over "dp"."""
    return NamedSharding(mesh, P("dp"))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params, optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict with the leading axis sharded over "dp".

    Every array in the batch must have a leading batch dim divisible by the
    mesh size (the data pipeline pads to the global batch size).
    """
    sharding = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)
