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

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from coda_neurips2023_tpu.models.helpers import ACT


def _xavier_mha(num_heads, dropout_rate, name, dtype=jnp.float32):
    return nn.MultiHeadDotProductAttention(
        num_heads=num_heads,
        kernel_init=nn.initializers.xavier_uniform(),
        dropout_rate=dropout_rate,
        dtype=dtype,
        name=name,
    )


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int = 4
    dim_feedforward: int = 128
    dropout: float = 0.1
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos=None, mask=None, train: bool = False):
        act = ACT[self.activation]
        src2 = nn.LayerNorm(epsilon=1e-5, name="norm1")(src)
        q = src2 if pos is None else src2 + pos
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

    @nn.compact
    def __call__(self, src, xyz=None, pos=None, mask=None, train: bool = False):
        out = src
        for i in range(self.num_layers):
            out = TransformerEncoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                self.activation,
                self.dtype,
                name=f"layer{i}",
            )(out, pos=pos, mask=mask, train=train)
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

    @nn.compact
    def __call__(self, src, xyz, pos=None, train: bool = False):
        from coda_neurips2023_tpu.models.pointnet import PointnetSAModuleVotes
        from coda_neurips2023_tpu.ops.sampling import furthest_point_sample

        out = src
        inds = None
        for i in range(self.num_layers):
            mask = None
            if self.masking_radius[i] > 0:
                # |a-b|^2 via the MXU (never materializes (B, S, S, 3))
                sq = jnp.sum(xyz * xyz, axis=-1)
                cross = jnp.einsum("bnd,bmd->bnm", xyz, xyz)
                d2 = jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2 * cross, 0.0)
                dist = jnp.sqrt(d2)
                # reference quirk: euclidean distance vs squared radius
                allowed = dist < self.masking_radius[i]
                mask = allowed[:, None, :, :]  # (B, 1, S, S) broadcast over heads
            out = TransformerEncoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                self.activation,
                name=f"layer{i}",
            )(out, pos=pos, mask=mask, train=train)
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

    @nn.compact
    def __call__(self, tgt, memory, query_pos=None, pos=None, train: bool = False):
        """Returns (num_layers, B, nq, C): per-layer normalized activations."""
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        out = tgt
        intermediate = []
        for i in range(self.num_layers):
            out = TransformerDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                dtype=self.dtype,
                name=f"layer{i}",
            )(out, memory, query_pos=query_pos, pos=pos, train=train)
            intermediate.append(norm(out))
        # the reference replaces the last intermediate with the same final norm
        # output (transformer.py:132-137) -- identical here since norm is shared.
        return jnp.stack(intermediate, axis=0)
