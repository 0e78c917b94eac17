"""Tensor parallelism: megatron-style sharding rules for the 3DETR trunk.

The reference is data-parallel only (DDP, /root/reference/main.py:964-1108;
SURVEY.md section 2.2), so DP over a 1-D mesh is the *parity* strategy
(parallel/mesh.py).  This module goes beyond parity the TPU-native way: a 2-D
``(dp, mp)`` mesh where the transformer's attention heads and FFN hidden dim
are sharded over ``mp`` and XLA/GSPMD inserts the collectives.

Why this shape: each encoder/decoder block is

    x -> qkv projections -> per-head attention -> out projection -> +residual
    x -> linear1 -> act -> linear2 -> +residual

Sharding q/k/v kernels on the HEAD axis and ``out`` on its input (head) axis
makes the whole attention block compute head-local with ONE reduce-scatter /
all-reduce at the ``out`` matmul (inserted by GSPMD, riding ICI).  Likewise
``linear1`` column-sharded + ``linear2`` row-sharded makes the FFN hidden
activation mp-local with one collective at ``linear2``.  LayerNorms and
residuals stay replicated-on-mp (their operands are (B/dp, S, D) which is tiny
next to the sharded intermediates).  This is the standard megatron recipe
expressed as nothing but `NamedSharding` placements -- no comms code.

The rules are PATH REGEXES applied to the flattened state pytree, so the same
table shards ``params``, the AdamW ``mu``/``nu`` moments (their subtree paths
mirror the param paths), and leaves everything unmatched replicated.  A leaf
whose matched axis is not divisible by the mp size silently stays replicated
(correct, just not distributed), so tiny smoke models work on any mesh.

Pallas note: the fused eval attention kernels (CODA_MASKED_ATTN, default off)
have no GSPMD partitioning rule; under an mp>1 mesh keep them off (the default)
so attention lowers to plain XLA dots that GSPMD can split on the head axis.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, rank, sharded dim) -> PartitionSpec placing "mp" on that dim.
# Paths are "/"-joined flattened pytree key paths, e.g.
#   params/encoder/layer0/self_attn/query/kernel
#   opt_state/1/0/mu/decoder/layer3/linear1/kernel   (AdamW moments)
_MP_RULES: Sequence[tuple[str, int, int]] = (
    # attention: flax MultiHeadDotProductAttention
    #   q/k/v kernel (D, H, hd) + bias (H, hd): shard heads
    (r"/(self_attn|multihead_attn)/(query|key|value)/kernel$", 3, 1),
    (r"/(self_attn|multihead_attn)/(query|key|value)/bias$", 2, 0),
    #   out kernel (H, hd, D): shard the contracting head axis (row-parallel;
    #   GSPMD emits the block's single all-reduce here); out bias replicated
    (r"/(self_attn|multihead_attn)/out/kernel$", 3, 0),
    # FFN: linear1 column-parallel (D, F) + its bias, linear2 row-parallel
    # (F, D) with replicated bias
    (r"/linear1/kernel$", 2, 1),
    (r"/linear1/bias$", 1, 0),
    (r"/linear2/kernel$", 2, 0),
    # CLIP towers (models/clip.py ResidualAttentionBlock): flax MHA under
    # "attn" (same (D, H, hd) kernel layout as the trunk; FusedAttention's
    # _ProjParams share it, but keep the Pallas path OFF under mp -- no
    # GSPMD rule for pallas_call) and the c_fc/c_proj quick-GELU MLP.
    # Covers the stage-1 distillation teacher: head-local attention + one
    # collective per block, same megatron recipe.
    (r"/attn/(query|key|value)/kernel$", 3, 1),
    (r"/attn/(query|key|value)/bias$", 2, 0),
    (r"/attn/out/kernel$", 3, 0),
    (r"/c_fc/kernel$", 2, 1),
    (r"/c_fc/bias$", 1, 0),
    (r"/c_proj/kernel$", 2, 0),
)


def make_tp_mesh(n_devices: Optional[int] = None, mp: int = 2) -> Mesh:
    """A 2-D ``(dp, mp)`` mesh: dp = n_devices // mp."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % mp != 0:
        raise ValueError(f"mp={mp} does not divide {n} devices")
    return Mesh(np.asarray(devices).reshape(n // mp, mp), ("dp", "mp"))


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return "/" + "/".join(parts)


def partition_spec(path, leaf, mp_size: int) -> P:
    """The PartitionSpec for one state leaf under the megatron rules."""
    shape = getattr(leaf, "shape", ())
    name = _path_str(path)
    for pat, rank, dim in _MP_RULES:
        if re.search(pat, name) and len(shape) == rank:
            if shape[dim] % mp_size == 0:
                spec = [None] * rank
                spec[dim] = "mp"
                return P(*spec)
            return P()  # not divisible: stay replicated (still correct)
    return P()


def shard_state_tp(mesh: Mesh, state):
    """Place a TrainState (params + BN stats + AdamW moments) on a (dp, mp)
    mesh with the megatron rules; unmatched leaves are replicated."""
    mp_size = mesh.shape["mp"]

    def put(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, partition_spec(path, leaf, mp_size))
        )

    return jax.tree_util.tree_map_with_path(put, state)


def state_shardings(mesh: Mesh, state):
    """The NamedSharding pytree for a TrainState under the megatron rules."""
    mp_size = mesh.shape["mp"]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, partition_spec(path, leaf, mp_size)),
        state,
    )


def constrain_train_step(train_step, mesh: Mesh, state):
    """Pin the TP shardings on the train step's OUTPUT state.

    Plain `jit` leaves output shardings to GSPMD propagation, which is free to
    gather mp-sharded params back to replicated between steps (observed on the
    CPU mesh); re-jitting with explicit `out_shardings` keeps params + AdamW
    moments mp-sharded across the whole run -- the point of TP.  Metrics stay
    auto (they are scalars).  `state` is only read for its tree structure /
    leaf shapes.
    """
    return jax.jit(
        train_step, out_shardings=(state_shardings(mesh, state), None)
    )


def tp_param_summary(state, mp_size: int):
    """(n_sharded, n_total) leaves under the rules -- for tests/logging."""
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    n_sharded = sum(
        1 for path, leaf in flat if partition_spec(path, leaf, mp_size) != P()
    )
    return n_sharded, len(flat)
