"""DETR-style transformer encoder/decoder (flax, batch-first, pre-norm).

Re-design of /root/reference/models/transformer.py for TPU:
  * channels-last (B, S, C) instead of torch's (S, B, C);
  * attention is a single fused dot-product-attention per layer (XLA fuses the
    softmax chain; sequence lengths here are 2048 enc / 128 dec, small enough
    that a custom flash kernel is unnecessary);
  * pre-norm residual wiring identical to TransformerEncoderLayer.forward_pre
    (transformer.py:466-483) and TransformerDecoderLayer.forward_pre;
  * the decoder returns the stack of per-layer normalized activations
    (transformer.py:117-141), with the final layer's entry replaced by the
    shared output norm, exactly like the reference's intermediate.pop() trick;
  * MaskedTransformerEncoder reproduces compute_mask (transformer.py:154-161):
    attention is disallowed where euclidean distance >= masking_radius[i]
    (note the reference compares a *distance* against a *squared* radius --
    kept verbatim for parity) and FPS-downsamples after layer 0.

Attention-mask convention: `mask` is True where attention IS allowed
(flax style); the reference's torch masks are True where disallowed.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from coda_neurips2023_tpu.models.helpers import ACT

# Pallas fused (radius-masked / vanilla / cross) attention for the encoder
# and decoder eval paths (ops/pallas_masked_attention.py): "auto" = TPU
# backend only; "0" forces the stock flax layer everywhere.  Train mode
# ALWAYS uses stock flax (the kernel does not implement attention-weight
# dropout), so training numerics are unchanged by this switch.
# DEFAULT "auto" since the round-4 on-chip A/B: eval bench 267.6 vs 252.2
# scenes/s stock, back-to-back (+6%); the decoder cross shape needed a
# raised scoped-VMEM limit to compile at all (BASELINE.md round-4 table).
_FUSED_MASKED_ATTN = os.environ.get("CODA_MASKED_ATTN", "auto")
# operand dtype of the kernel's two big dots; bf16 matches the effective
# precision of the incumbent XLA f32 matmuls on v5e (allow_excess_precision)
_FUSED_MASKED_ATTN_DTYPE = os.environ.get("CODA_MASKED_ATTN_DTYPE", "bfloat16")


def _use_fused_masked_attn(train: bool, s: int, d_head: int) -> bool:
    if _FUSED_MASKED_ATTN == "0" or train:
        return False
    if s % 128 != 0 or s < 1024 or d_head % 8 != 0:
        # tiny smoke shapes keep XLA (cheap there; avoids small-shape Mosaic
        # edge cases -- same policy as the Pallas group gather's MIN_N gate)
        return False
    if _FUSED_MASKED_ATTN == "1":
        return True
    return jax.default_backend() == "tpu"


def _xavier_mha(num_heads, dropout_rate, name, dtype=jnp.float32):
    return nn.MultiHeadDotProductAttention(
        num_heads=num_heads,
        kernel_init=nn.initializers.xavier_uniform(),
        dropout_rate=dropout_rate,
        dtype=dtype,
        name=name,
    )


class FusedMaskedSelfAttention(nn.Module):
    """Radius-masked self-attention via the Pallas kernel.

    Param tree identical to nn.MultiHeadDotProductAttention (query/key/value/
    out DenseGeneral kernels+biases, xavier-initialized) so checkpoints and
    the torch converter are attention-impl-agnostic; the projections einsum
    straight into the kernel's layouts ((B,H,S,D) q/v, (B,H,D,S) k -- the k
    transpose rides the projection matmul).  Mirrors flax numerics: query
    scaled by 1/sqrt(D) after projection, finfo.min mask fill before
    softmax.  Reference mask semantics: models/transformer.py
    MaskedTransformerEncoder + /root/reference/models/transformer.py:154-161.
    """

    heads: int
    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, v_in, xyz, radius: float = 0.0, k_in=None):
        from coda_neurips2023_tpu.models.clip import _ProjParams
        from coda_neurips2023_tpu.ops.pallas_masked_attention import masked_attention

        h = self.heads
        d = self.d_model // h
        w_in = q_in.shape[-1]
        # flax MHA with dtype=self.dtype casts inputs AND params; mirror it
        q_in = q_in.astype(self.dtype)
        v_in = v_in.astype(self.dtype)
        # self-attention wiring (TransformerEncoderLayer): inputs_k == q_in;
        # decoder cross-attention passes k_in = memory(+pos), v_in = memory
        k_in = q_in if k_in is None else k_in.astype(self.dtype)
        xav = nn.initializers.xavier_uniform()

        def in_proj(name):
            kernel, bias = _ProjParams(
                (w_in, h, d), (h, d), kernel_init=xav, name=name
            )()
            return kernel.astype(self.dtype), bias.astype(self.dtype)

        qk, qb = in_proj("query")
        kk, kb = in_proj("key")
        vk, vb = in_proj("value")
        q = jnp.einsum("bsw,whd->bhsd", q_in, qk) + qb[None, :, None, :]
        k = jnp.einsum("bsw,whd->bhds", k_in, kk) + kb[None, :, :, None]
        v = jnp.einsum("bsw,whd->bhsd", v_in, vk) + vb[None, :, None, :]
        q = q / jnp.asarray(math.sqrt(d), q.dtype)  # flax scales pre-matmul

        if xyz is None:  # unmasked; kernel ignores coords (radius == 0)
            b = q_in.shape[0]
            qxyz = jnp.zeros((b, q_in.shape[1], 3), jnp.float32)
            kxyz_t = jnp.zeros((b, 3, v_in.shape[1]), jnp.float32)
            radius = 0.0
        else:
            qxyz = xyz.astype(jnp.float32)
            kxyz_t = jnp.transpose(qxyz, (0, 2, 1))
        out = masked_attention(
            q, k, v, qxyz, kxyz_t, float(radius), _FUSED_MASKED_ATTN_DTYPE
        )  # (B, H, Sq, D)

        ok, ob = _ProjParams(
            (h, d, self.d_model), (self.d_model,), fan_in_axes=(0, 1),
            kernel_init=xav, name="out",
        )()
        return jnp.einsum(
            "bhsd,hdw->bsw", out, ok.astype(self.dtype)
        ) + ob.astype(self.dtype)


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int = 4
    dim_feedforward: int = 128
    dropout: float = 0.1
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos=None, mask=None, train: bool = False,
                 mask_xyz=None, mask_radius=None):
        act = ACT[self.activation]
        src2 = nn.LayerNorm(epsilon=1e-5, name="norm1")(src)
        q = src2 if pos is None else src2 + pos
        fused_unmasked = (
            mask is None
            and mask_xyz is None
            and _use_fused_masked_attn(
                train, src.shape[1], self.d_model // self.nhead
            )
        )
        if mask_xyz is not None or fused_unmasked:
            # Pallas fused path (eval only; radius-masked when mask_xyz is
            # given, else plain attention for the vanilla encoder -- the
            # wired CoDA configs, where XLA otherwise writes the
            # (B, H, S, S) scores to HBM).  Same "self_attn" name + param
            # tree as the flax layer below.
            attn = FusedMaskedSelfAttention(
                heads=self.nhead, d_model=self.d_model, dtype=self.dtype,
                name="self_attn",
            )(q, src2, mask_xyz, 0.0 if mask_radius is None else mask_radius)
        else:
            attn = _xavier_mha(self.nhead, self.dropout, "self_attn", self.dtype)(
                inputs_q=q,
                inputs_k=q,
                inputs_v=src2,
                mask=mask,
                deterministic=not train,
            )
        src = src + nn.Dropout(self.dropout, deterministic=not train)(attn)
        src2 = nn.LayerNorm(epsilon=1e-5, name="norm2")(src)
        ff = nn.Dense(
            self.dim_feedforward,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            name="linear1",
        )(src2)
        ff = nn.Dropout(self.dropout, deterministic=not train)(act(ff))
        ff = nn.Dense(
            self.d_model, kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype, name="linear2"
        )(ff)
        src = src + nn.Dropout(self.dropout, deterministic=not train)(ff)
        return src.astype(jnp.float32)


class TransformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    nhead: int = 4
    dim_feedforward: int = 128
    dropout: float = 0.1
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32
    # remat: recompute each layer's activations in the backward pass instead
    # of keeping them in HBM (jax.checkpoint per layer).  Memory-for-FLOPs
    # lever for larger per-chip batches; numerics identical (dropout rngs are
    # lifted, so the recompute replays the same masks).  Train-time only.
    remat: bool = False

    @nn.compact
    def __call__(self, src, xyz=None, pos=None, mask=None, train: bool = False):
        out = src
        for i in range(self.num_layers):
            layer = TransformerEncoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                self.activation,
                self.dtype,
                name=f"layer{i}",
            )
            if self.remat and train:
                out = nn.remat(
                    lambda m, s, p, mk: m(s, pos=p, mask=mk, train=True)
                )(layer, out, pos, mask)
            else:
                out = layer(out, pos=pos, mask=mask, train=train)
        return xyz, out, None  # (xyz, features, inds): no downsampling here


class MaskedTransformerEncoder(nn.Module):
    """3-layer radius-masked encoder with interim FPS downsampling
    (reference transformer.py:146-212, builders model_3detr.py:3958-3977)."""

    num_layers: int
    d_model: int
    masking_radius: tuple  # len == num_layers; values are squared radii
    interim_npoint: int
    interim_radius: float = 0.4
    interim_nsample: int = 32
    nhead: int = 4
    dim_feedforward: int = 128
    dropout: float = 0.1
    activation: str = "relu"
    remat: bool = False  # see TransformerEncoder.remat

    @nn.compact
    def __call__(self, src, xyz, pos=None, train: bool = False):
        from coda_neurips2023_tpu.models.pointnet import PointnetSAModuleVotes
        from coda_neurips2023_tpu.ops.sampling import furthest_point_sample

        out = src
        inds = None
        for i in range(self.num_layers):
            mask = None
            mask_xyz = mask_radius = None
            if self.masking_radius[i] > 0:
                if _use_fused_masked_attn(
                    train, out.shape[1], self.d_model // self.nhead
                ):
                    # Pallas kernel rebuilds the mask in-VMEM from xyz --
                    # neither the (B, S, S) distances nor the (B, H, S, S)
                    # scores ever reach HBM (ops/pallas_masked_attention.py)
                    mask_xyz, mask_radius = xyz, float(self.masking_radius[i])
                else:
                    # |a-b|^2 via the MXU (never materializes (B, S, S, 3))
                    sq = jnp.sum(xyz * xyz, axis=-1)
                    cross = jnp.einsum("bnd,bmd->bnm", xyz, xyz)
                    d2 = jnp.maximum(
                        sq[:, :, None] + sq[:, None, :] - 2 * cross, 0.0
                    )
                    dist = jnp.sqrt(d2)
                    # reference quirk: euclidean distance vs squared radius
                    allowed = dist < self.masking_radius[i]
                    mask = allowed[:, None, :, :]  # (B, 1, S, S) over heads
            layer = TransformerEncoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                self.activation,
                name=f"layer{i}",
            )
            if self.remat and train:
                out = nn.remat(
                    lambda m, s, p, mk, mxyz, r=mask_radius: m(
                        s, pos=p, mask=mk, train=True,
                        mask_xyz=mxyz, mask_radius=r,
                    )
                )(layer, out, pos, mask, mask_xyz)
            else:
                out = layer(out, pos=pos, mask=mask, train=train,
                            mask_xyz=mask_xyz, mask_radius=mask_radius)
            if i == 0:
                sa = PointnetSAModuleVotes(
                    npoint=self.interim_npoint,
                    radius=self.interim_radius,
                    nsample=self.interim_nsample,
                    mlp_dims=(self.d_model, 256, 256, self.d_model),
                    normalize_xyz=True,
                    name="interim_downsampling",
                )
                xyz, out, inds = sa(xyz, out, train=train)
        return xyz, out, inds


class TransformerDecoderLayer(nn.Module):
    d_model: int
    nhead: int = 4
    dim_feedforward: int = 256
    dropout: float = 0.1
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, query_pos=None, pos=None, train: bool = False):
        act = ACT[self.activation]
        tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        q = tgt2 if query_pos is None else tgt2 + query_pos
        sa = _xavier_mha(self.nhead, self.dropout, "self_attn", self.dtype)(
            inputs_q=q, inputs_k=q, inputs_v=tgt2, deterministic=not train
        )
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train)(sa)

        tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        qq = tgt2 if query_pos is None else tgt2 + query_pos
        kk = memory if pos is None else memory + pos
        if (
            _use_fused_masked_attn(
                train, memory.shape[1], self.d_model // self.nhead
            )
            and qq.shape[1] % 128 == 0
        ):
            # fused cross-attention: nqueries x S memory reads stay in VMEM
            # (XLA otherwise writes (B, H, nq, S) scores to HBM per layer)
            ca = FusedMaskedSelfAttention(
                heads=self.nhead, d_model=self.d_model, dtype=self.dtype,
                name="multihead_attn",
            )(qq, memory, None, k_in=kk)
        else:
            ca = _xavier_mha(self.nhead, self.dropout, "multihead_attn", self.dtype)(
                inputs_q=qq, inputs_k=kk, inputs_v=memory, deterministic=not train
            )
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train)(ca)

        tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)
        ff = nn.Dense(
            self.dim_feedforward,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            name="linear1",
        )(tgt2)
        ff = nn.Dropout(self.dropout, deterministic=not train)(act(ff))
        ff = nn.Dense(
            self.d_model, kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype, name="linear2"
        )(ff)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train)(ff)
        return tgt.astype(jnp.float32)


class TransformerDecoder(nn.Module):
    num_layers: int
    d_model: int
    nhead: int = 4
    dim_feedforward: int = 256
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # see TransformerEncoder.remat

    @nn.compact
    def __call__(self, tgt, memory, query_pos=None, pos=None, train: bool = False):
        """Returns (num_layers, B, nq, C): per-layer normalized activations."""
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        out = tgt
        intermediate = []
        for i in range(self.num_layers):
            layer = TransformerDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                dtype=self.dtype,
                name=f"layer{i}",
            )
            if self.remat and train:
                out = nn.remat(
                    lambda m, t, mem, qp, p: m(
                        t, mem, query_pos=qp, pos=p, train=True
                    )
                )(layer, out, memory, query_pos, pos)
            else:
                out = layer(out, memory, query_pos=query_pos, pos=pos, train=train)
            intermediate.append(norm(out))
        # the reference replaces the last intermediate with the same final norm
        # output (transformer.py:132-137) -- identical here since norm is shared.
        return jnp.stack(intermediate, axis=0)
