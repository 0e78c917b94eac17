"""CLIP ViT-B/16 (image + text towers) in flax.

TPU-native re-implementation of the reference's vendored OpenAI CLIP
(/root/reference/CLIP/clip/model.py: VisionTransformer :595, CLIP :969,
encode_image :1066, encode_text :1069) -- only the pieces the two wired CoDA
models use: the ViT-B/16 visual tower, the text transformer, logit_scale,
and the tensor-native preprocessing (clip.py:95-101 `_transform_for_tensor`:
bicubic resize to 224 + center crop + /255 + mean/std normalize, no PIL).

Weights: `convert_openai_checkpoint` maps an OpenAI CLIP .pt state dict
(loaded with torch, CPU) into this module's flax params; random init is used
when no checkpoint is supplied (tests / data-free environments).

TPU notes: the whole crop batch (B * distillation_box_num crops) is encoded
in ONE forward -- the reference loops crops per sample through the tower
(model_3detr.py:984-1210).  Attention is jax dot-product attention; all
shapes static (77 text tokens, 197 image tokens).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

# Fused Pallas attention for the (mask-free) ViT tower: "auto" = on when the
# backend is TPU, "1"/"0" force.  The text tower (causal mask) always uses the
# stock flax path.  A/B and rationale: BASELINE.md (CLIP tower roofline).
_FUSED_ATTN = os.environ.get("CODA_CLIP_FUSED_ATTN", "auto")


def _use_fused_attn() -> bool:
    # Default OFF (round 5): stock flax MHDPA measured 80.7 ms/256 crops bf16
    # on v5e vs 91 ms for the QKV-concat fused path (lane-slice relayouts),
    # 108.8 ms for a leading-dim-split variant, and 20.0-vs-17.2 ms/12-layers
    # for the best Pallas kernel vs stock in-scan (scripts/bench_attn_scan.py,
    # scripts/bench_clip_tower.py).  At S=197 XLA's own attention is already
    # within ~2x of the HBM floor and every hand layout loses; keep the fused
    # paths selectable for future shapes.
    if _FUSED_ATTN == "1":
        return True
    return False


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _ProjParams(nn.Module):
    """Parameter holder shaped exactly like one flax-MHA projection
    ({kernel, bias}); exists so FusedAttention's param tree is
    indistinguishable from nn.MultiHeadDotProductAttention's (checkpoints
    and the OpenAI converter need no changes).  `fan_axes` mirrors flax
    DenseGeneral's lecun_normal fan computation ((in,), (heads, head_dim)
    for q/k/v; ((heads, head_dim), (out,)) for the out projection)."""

    kernel_shape: tuple
    bias_shape: tuple
    fan_in_axes: tuple = (0,)
    kernel_init: Optional[object] = None  # override (e.g. xavier for DETR)

    @nn.compact
    def __call__(self):
        n = len(self.kernel_shape)
        out_axes = tuple(i for i in range(n) if i not in self.fan_in_axes)
        init = self.kernel_init or nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal",
            in_axis=self.fan_in_axes, out_axis=out_axes,
        )
        kernel = self.param("kernel", init, self.kernel_shape)
        bias = self.param("bias", nn.initializers.zeros_init(), self.bias_shape)
        return kernel, bias


class FusedAttention(nn.Module):
    """Self-attention with a single fused QKV projection (mask-free ViT path).

    Math identical to flax MultiHeadDotProductAttention; the differences are
    layout only:

    * q/k/v are projected by ONE einsum over a stacked (w_in, 3, h, d)
      kernel, so x (77 MB of activations at the CLIP 256-crop shape) is read
      from HBM once instead of three times.
    * the 3 projections land on the LEADING axis of the einsum output
      ('bsw,wthd->tbshd') and are split by axis-0 indexing, which is
      tile-layout free.  Splitting a lane-packed (..., 3d) tensor at 64-lane
      offsets instead forces Mosaic relayout copies, measured +27 ms/12
      layers on v5e (scripts/bench_attn_scan.py, round 5) -- that lane-slice
      variant is what made the round-3/4 fused tower SLOWER than stock
      (91 vs 81.5 ms/256 crops).

    The inner attention is stock flax dot_product_attention by default; the
    Pallas vit_attention kernel remains selectable with
    CODA_VIT_ATTN_IMPL=pallas (in-scan A/B round 5: stock 17.2 ms vs kernel
    20.0 ms best at BB=8 -- XLA wins at this short-seq shape).  Params stay
    three separate {kernel, bias} trees (checkpoint/converter compatibility);
    the stack is 3.5 MB of weights per step, free next to the matmul."""

    heads: int
    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = self.heads
        d = self.width // h
        w_in = x.shape[-1]

        kb = [_ProjParams((w_in, h, d), (h, d), name=n)()
              for n in ("query", "key", "value")]
        kcat = jnp.stack(
            [k_.astype(self.dtype) for k_, _ in kb], axis=1
        )  # (w_in, 3, h, d)
        bcat = jnp.stack(
            [b_.astype(self.dtype) for _, b_ in kb], axis=0
        )  # (3, h, d)
        kernel, bias = _ProjParams(
            (h, d, self.width), (self.width,), fan_in_axes=(0, 1), name="out"
        )()
        if os.environ.get("CODA_VIT_ATTN_IMPL", "stock") == "pallas":
            from ..ops.pallas_vit_attention import vit_attention

            # head-major (B, H, S, D) rides the projection matmul's output
            # for free (an explicit transpose measured ~1 ms/tensor/layer).
            qkv = (jnp.einsum("bsw,wthd->tbhsd", x, kcat)
                   + bcat[:, None, :, None, :])
            out = vit_attention(qkv[0], qkv[1], qkv[2])  # (B, H, S, D)
            return jnp.einsum(
                "bhsd,hdw->bsw", out, kernel.astype(self.dtype)
            ) + bias.astype(self.dtype)
        qkv = (jnp.einsum("bsw,wthd->tbshd", x, kcat)
               + bcat[:, None, None, :, :])
        out = nn.dot_product_attention(qkv[0], qkv[1], qkv[2])  # (B, S, H, D)
        return jnp.einsum(
            "bshd,hdw->bsw", out, kernel.astype(self.dtype)
        ) + bias.astype(self.dtype)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None):
        # LayerNorms follow the tower dtype: with bf16 params+activations the
        # whole block stays one dtype (no convert/relayout chains -- the
        # round-2 bf16 regression); flax still computes the LN statistics in
        # f32 internally (force_float32_reductions).
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        # Fused path is bf16-only: the f32 kernel's VMEM footprint exceeds the
        # 16 MB scoped limit (measured 16.38M at the ViT-B/16 shape), and f32
        # fused measured SLOWER than stock anyway (101 vs 93 ms/256 crops --
        # BASELINE.md round-3).
        if attn_mask is None and self.dtype == jnp.bfloat16 and _use_fused_attn():
            y = FusedAttention(
                heads=self.heads, width=self.width, dtype=self.dtype,
                name="attn",
            )(y)
        else:
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=self.width,
                dtype=self.dtype, name="attn",
            )(inputs_q=y, inputs_k=y, inputs_v=y, mask=attn_mask)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(self.width * 4, dtype=self.dtype, name="c_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.width, dtype=self.dtype, name="c_proj")(y)
        return x + y


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None):
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, self.dtype, name=f"resblock{i}"
            )(x, attn_mask)
        return x


class VisionTransformer(nn.Module):
    input_resolution: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) preprocessed -> (B, output_dim)."""
        b = x.shape[0]
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.width,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = x.reshape(b, -1, self.width)  # (B, grid*grid, width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(self.width ** -0.5), (self.width,)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.width)), x], axis=1)
        n_tok = (self.input_resolution // self.patch_size) ** 2 + 1
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.width ** -0.5),
            (n_tok, self.width),
        )
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        x = Transformer(
            self.width, self.layers, self.heads, self.dtype, name="transformer"
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x[:, 0, :])
        proj = self.param(
            "proj",
            nn.initializers.normal(self.width ** -0.5),
            (self.width, self.output_dim),
        )
        return (x @ proj.astype(x.dtype)).astype(jnp.float32)


def _insert_prompt_embeddings(x_ori, tokens, former, later):
    """Vectorized re-arrangement [SOT, former, name-tokens, later, EOT, pad]
    of per-row token embeddings (reference does a python loop over the batch,
    CLIP/clip/model.py:1095-1114).  Row lengths are traced (argmax of token
    ids); prompt lengths are static."""
    lf = 0 if former is None else former.shape[0]
    ll = 0 if later is None else later.shape[0]
    if lf == 0 and ll == 0:
        return x_ori
    _, seq_len, _ = x_ori.shape
    lt = (jnp.argmax(tokens, axis=-1) + 1)[:, None]  # (B, 1) incl. SOT+EOT
    p = jnp.arange(seq_len)[None, :]  # (1, L)
    in_former = jnp.logical_and(p >= 1, p <= lf)
    in_later = jnp.logical_and(p >= lf + lt - 1, p <= lf + lt - 2 + ll)
    # source index into the original row for the non-prompt positions:
    # SOT at 0; name tokens shifted by lf; EOT shifted by lf+ll; the tail
    # takes x_ori[lt+lf+ll:] UNSHIFTED (the reference drops the lf+ll
    # displaced padding embeddings, model.py:1113)
    src = jnp.where(
        p == 0,
        0,
        jnp.where(
            p <= lf + lt - 2,
            p - lf,
            jnp.where(p == lf + ll + lt - 1, p - lf - ll, p),
        ),
    )
    src = jnp.clip(src, 0, seq_len - 1)
    out = jnp.take_along_axis(x_ori, src[..., None], axis=1)
    if lf:
        fvals = former[jnp.clip(p - 1, 0, lf - 1)]  # (1, L, W)
        out = jnp.where(in_former[..., None], fvals.astype(out.dtype), out)
    if ll:
        lidx = jnp.clip(p - (lf + lt - 1), 0, ll - 1)  # (B, L)
        lvals = later[lidx]
        out = jnp.where(in_later[..., None], lvals.astype(out.dtype), out)
    return out


class TextTransformer(nn.Module):
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    output_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text_tokens, prompt_former=None, prompt_later=None):
        """text_tokens: (B, 77) int32 -> (B, output_dim). Pools at the argmax
        token (the EOT token has the highest id in CLIP BPE).

        With prompt_former/prompt_later ((Lf, W)/(Ll, W) arrays of learned
        prompt embeddings), the token-embedding sequence is rearranged to
        [SOT, former..., name-tokens, later..., EOT, padding...] per row
        (reference encode_text_with_prompt_embedding, CLIP/clip/model.py:
        1084-1127).  The EOT pooling still gathers at the ORIGINAL argmax
        position of the token ids -- a reference quirk kept for parity (the
        shifted sequence's true EOT sits Lf+Ll later)."""
        emb = nn.Embed(self.vocab_size, self.width, name="token_embedding")
        x = emb(text_tokens)
        x = _insert_prompt_embeddings(x, text_tokens, prompt_former, prompt_later)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = x + pos
        causal = jnp.tril(
            jnp.ones((self.context_length, self.context_length), bool)
        )[None, None]
        x = Transformer(
            self.width, self.layers, self.heads, self.dtype, name="transformer"
        )(x.astype(self.dtype), attn_mask=causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        eot = jnp.argmax(text_tokens, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width ** -0.5),
            (self.width, self.output_dim),
        )
        return (pooled @ proj.astype(pooled.dtype)).astype(jnp.float32)


class CLIP(nn.Module):
    """Combined towers + logit_scale (reference model.py:969-1146)."""

    embed_dim: int = 512
    image_resolution: int = 224
    vision_patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    context_length: int = 77
    vocab_size: int = 49408
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.visual = VisionTransformer(
            input_resolution=self.image_resolution,
            patch_size=self.vision_patch_size,
            width=self.vision_width,
            layers=self.vision_layers,
            heads=self.vision_width // 64,
            output_dim=self.embed_dim,
            dtype=self.dtype,
        )
        self.text = TextTransformer(
            context_length=self.context_length,
            vocab_size=self.vocab_size,
            width=self.text_width,
            layers=self.text_layers,
            heads=self.text_heads,
            output_dim=self.embed_dim,
            dtype=self.dtype,
        )
        self.logit_scale = self.param(
            "logit_scale", lambda rng: jnp.asarray(np.log(1 / 0.07), jnp.float32)
        )

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, tokens):
        return self.text(tokens)

    def encode_text_with_prompt_embedding(self, tokens, prompt_former=None,
                                          prompt_later=None):
        """Learned-prompt text encoding (reference CLIP/clip/model.py:1084);
        used by the prompt-tuning loss variants (criterion loss_prompt_*)."""
        return self.text(tokens, prompt_former=prompt_former, prompt_later=prompt_later)

    def __call__(self, images, tokens):
        img = self.encode_image(images)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * img @ txt.T, (scale * txt @ img.T)


def preprocess_images(images: jnp.ndarray, resolution: int = 224) -> jnp.ndarray:
    """Tensor-native CLIP preprocessing (reference clip.py:95-101):
    bicubic resize (short side -> resolution), center crop, scale to [0,1],
    normalize. images: (B, H, W, 3) uint8/float in [0, 255]."""
    images = images.astype(jnp.float32)
    b, h, w, _ = images.shape
    # resize short side to `resolution`, preserving aspect
    if h <= w:
        nh, nw = resolution, max(int(round(w * resolution / h)), resolution)
    else:
        nh, nw = max(int(round(h * resolution / w)), resolution), resolution
    images = jax.image.resize(images, (b, nh, nw, 3), method="cubic")
    top = (nh - resolution) // 2
    left = (nw - resolution) // 2
    images = jax.lax.dynamic_slice(
        images, (0, top, left, 0), (b, resolution, resolution, 3)
    )
    images = images / 255.0
    return (images - IMAGE_MEAN) / IMAGE_STD


# ---------------------------------------------------------------- converter


def _torch_state_dict(ckpt_path: str):
    import torch

    obj = torch.jit.load(ckpt_path, map_location="cpu") if ckpt_path.endswith(".pt") else None
    try:
        sd = obj.state_dict()
    except Exception:
        sd = torch.load(ckpt_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    return {k: v.float().numpy() for k, v in sd.items()}


def _mha_params(sd, prefix):
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    w = sd[prefix + "in_proj_weight"]  # (3w, w)
    b = sd[prefix + "in_proj_bias"]
    width = w.shape[1]
    heads_w = {}
    for i, name in enumerate(["query", "key", "value"]):
        wi = w[i * width:(i + 1) * width].T  # (in, out)
        bi = b[i * width:(i + 1) * width]
        heads_w[name] = {"kernel": wi, "bias": bi}
    heads_w["out"] = {
        "kernel": sd[prefix + "out_proj.weight"].T,
        "bias": sd[prefix + "out_proj.bias"],
    }
    return heads_w


def _reshape_mha_for_flax(p, num_heads):
    """flax MHA expects kernels shaped (in, heads, head_dim)."""
    out = {}
    for name in ["query", "key", "value"]:
        k = p[name]["kernel"]
        width_in, width_out = k.shape
        hd = width_out // num_heads
        out[name] = {
            "kernel": k.reshape(width_in, num_heads, hd),
            "bias": p[name]["bias"].reshape(num_heads, hd),
        }
    k = p["out"]["kernel"]
    width_in, width_out = k.shape
    hd = width_in // num_heads
    out["out"] = {
        "kernel": k.reshape(num_heads, hd, width_out),
        "bias": p["out"]["bias"],
    }
    return out


def _block_params(sd, prefix, heads):
    return {
        "ln_1": {"scale": sd[prefix + "ln_1.weight"], "bias": sd[prefix + "ln_1.bias"]},
        "ln_2": {"scale": sd[prefix + "ln_2.weight"], "bias": sd[prefix + "ln_2.bias"]},
        "attn": _reshape_mha_for_flax(_mha_params(sd, prefix + "attn."), heads),
        "c_fc": {
            "kernel": sd[prefix + "mlp.c_fc.weight"].T,
            "bias": sd[prefix + "mlp.c_fc.bias"],
        },
        "c_proj": {
            "kernel": sd[prefix + "mlp.c_proj.weight"].T,
            "bias": sd[prefix + "mlp.c_proj.bias"],
        },
    }


def convert_openai_checkpoint(ckpt_path: str) -> dict:
    """OpenAI CLIP .pt -> flax params for the CLIP module above."""
    return convert_openai_state_dict(_torch_state_dict(ckpt_path))


def convert_openai_state_dict(sd: dict, vision_heads=None, text_heads=None) -> dict:
    """OpenAI CLIP state dict (name -> np array) -> flax params.

    Head counts follow the OpenAI convention width//64 (CLIP/clip/model.py:
    990,1007) unless overridden (tiny test configs)."""
    vision_layers = len(
        {k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")}
    )
    text_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")}
    )
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_heads = vision_heads or max(vision_width // 64, 1)
    text_width = sd["ln_final.weight"].shape[0]
    text_heads = text_heads or max(text_width // 64, 1)

    visual = {
        "conv1": {"kernel": sd["visual.conv1.weight"].transpose(2, 3, 1, 0)},
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": {
            "scale": sd["visual.ln_pre.weight"],
            "bias": sd["visual.ln_pre.bias"],
        },
        "ln_post": {
            "scale": sd["visual.ln_post.weight"],
            "bias": sd["visual.ln_post.bias"],
        },
        "proj": sd["visual.proj"],
        "transformer": {
            f"resblock{i}": _block_params(
                sd, f"visual.transformer.resblocks.{i}.", vision_heads
            )
            for i in range(vision_layers)
        },
    }
    text = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]},
        "text_projection": sd["text_projection"],
        "transformer": {
            f"resblock{i}": _block_params(sd, f"transformer.resblocks.{i}.", text_heads)
            for i in range(text_layers)
        },
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": sd["logit_scale"],
    }
