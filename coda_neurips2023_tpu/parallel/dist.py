"""Host-level distributed helpers.

The reference exposes a family of collectives (all_reduce_average,
reduce_dict, all_gather_dict, barrier; /root/reference/utils/dist.py:20-186)
because each GPU runs its own process.  Under single-controller JAX most of
them are identities on a single host; on multi-host deployments they map to
`jax.experimental.multihost_utils`.  Provided for API parity and for the
multi-host path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_distributed() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    return jax.process_index() == 0


def barrier():
    if is_distributed():
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("coda_barrier")


def all_reduce_average(tensor):
    """Mean over processes (dist.py:67-87). Inside-jit code never needs this:
    losses are already global under batch-sharded jit."""
    if not is_distributed():
        return tensor
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda x: np.mean(multihost_utils.process_allgather(x), axis=0), tensor
    )


def reduce_dict(input_dict, average=True):
    """Sorted-key stacked reduce (dist.py:91-115)."""
    if not is_distributed():
        return dict(input_dict)
    keys = sorted(input_dict.keys())
    stacked = jnp.stack([jnp.asarray(input_dict[k]) for k in keys])
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(stacked)
    red = gathered.mean(axis=0) if average else gathered.sum(axis=0)
    return {k: red[i] for i, k in enumerate(keys)}


def all_gather_dict(data):
    """Gather dict of arrays across processes, concatenated on batch axis
    (dist.py:164-186)."""
    if not is_distributed():
        return data
    from jax.experimental import multihost_utils

    return {
        k: np.concatenate(list(multihost_utils.process_allgather(v)), axis=0)
        for k, v in data.items()
    }
