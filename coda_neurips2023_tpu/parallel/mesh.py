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

The model is small (256/512-dim), so DP over ICI is the *parity* strategy
(the reference is DDP-only, SURVEY.md section 2.2) and the default mesh is
1-D.  Tensor parallelism beyond parity lives in `parallel/tp.py`: a 2-D
(dp, mp) mesh with megatron-style head/FFN sharding rules, same train step,
GSPMD-inserted collectives.  PP/EP remain non-goals (8 tiny layers, no MoE).
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

    Multi-host (the mesh spans >1 process): `batch` holds only THIS process's
    rows (its loader shard, the reference's DistributedSampler contract,
    /root/reference/main.py:1014) and is assembled into a global jax.Array
    with `make_array_from_process_local_data` -- global row order is process
    order because `make_mesh` lays devices out in `jax.devices()` order
    (process-major).  Single-process keeps the plain device_put fast path.
    """
    sharding = batch_sharding(mesh)
    multiprocess = len({d.process_index for d in mesh.devices.flat}) > 1

    def put(x):
        if multiprocess and np.ndim(x) > 0:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)
