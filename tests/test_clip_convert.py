"""OpenAI-CLIP checkpoint conversion: tree structure + numerical wiring.

Builds a tiny torch-style state dict (same key scheme as the OpenAI ViT
archives), converts with convert_openai_checkpoint's mapping helpers, and
verifies the flax modules accept the params and produce finite outputs; the
attention mapping is additionally validated against a manual torch-semantics
reference computation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coda_neurips2023_tpu.models.clip import (
    CLIP,
    _block_params,
    _mha_params,
    _reshape_mha_for_flax,
)


def fake_state_dict(vw=64, vl=2, tw=32, tl=2, embed=16, patch=8, res=16, ctx=8, vocab=64):
    rng = np.random.default_rng(0)
    sd = {}

    def add(name, shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.05

    add("visual.conv1.weight", (vw, 3, patch, patch))
    add("visual.class_embedding", (vw,))
    add("visual.positional_embedding", ((res // patch) ** 2 + 1, vw))
    add("visual.ln_pre.weight", (vw,)); add("visual.ln_pre.bias", (vw,))
    add("visual.ln_post.weight", (vw,)); add("visual.ln_post.bias", (vw,))
    add("visual.proj", (vw, embed))
    for i in range(vl):
        p = f"visual.transformer.resblocks.{i}."
        add(p + "ln_1.weight", (vw,)); add(p + "ln_1.bias", (vw,))
        add(p + "ln_2.weight", (vw,)); add(p + "ln_2.bias", (vw,))
        add(p + "attn.in_proj_weight", (3 * vw, vw))
        add(p + "attn.in_proj_bias", (3 * vw,))
        add(p + "attn.out_proj.weight", (vw, vw))
        add(p + "attn.out_proj.bias", (vw,))
        add(p + "mlp.c_fc.weight", (4 * vw, vw)); add(p + "mlp.c_fc.bias", (4 * vw,))
        add(p + "mlp.c_proj.weight", (vw, 4 * vw)); add(p + "mlp.c_proj.bias", (vw,))
    add("token_embedding.weight", (vocab, tw))
    add("positional_embedding", (ctx, tw))
    add("ln_final.weight", (tw,)); add("ln_final.bias", (tw,))
    add("text_projection", (tw, embed))
    for i in range(tl):
        p = f"transformer.resblocks.{i}."
        add(p + "ln_1.weight", (tw,)); add(p + "ln_1.bias", (tw,))
        add(p + "ln_2.weight", (tw,)); add(p + "ln_2.bias", (tw,))
        add(p + "attn.in_proj_weight", (3 * tw, tw))
        add(p + "attn.in_proj_bias", (3 * tw,))
        add(p + "attn.out_proj.weight", (tw, tw))
        add(p + "attn.out_proj.bias", (tw,))
        add(p + "mlp.c_fc.weight", (4 * tw, tw)); add(p + "mlp.c_fc.bias", (4 * tw,))
        add(p + "mlp.c_proj.weight", (tw, 4 * tw)); add(p + "mlp.c_proj.bias", (tw,))
    sd["logit_scale"] = np.float32(np.log(1 / 0.07))
    return sd


def convert_fake(sd):
    # mirrors convert_openai_checkpoint without the torch loader
    vision_layers = len({k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")})
    text_layers = len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")})
    vw = sd["visual.conv1.weight"].shape[0]
    tw = sd["ln_final.weight"].shape[0]
    visual = {
        "conv1": {"kernel": sd["visual.conv1.weight"].transpose(2, 3, 1, 0)},
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": {"scale": sd["visual.ln_pre.weight"], "bias": sd["visual.ln_pre.bias"]},
        "ln_post": {"scale": sd["visual.ln_post.weight"], "bias": sd["visual.ln_post.bias"]},
        "proj": sd["visual.proj"],
        "transformer": {
            # vision heads = width // 64, like the real converter
            f"resblock{i}": _block_params(sd, f"visual.transformer.resblocks.{i}.", vw // 64)
            for i in range(vision_layers)
        },
    }
    text = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]},
        "text_projection": sd["text_projection"],
        "transformer": {
            f"resblock{i}": _block_params(sd, f"transformer.resblocks.{i}.", tw // 16)
            for i in range(text_layers)
        },
    }
    return {"visual": visual, "text": text, "logit_scale": sd["logit_scale"]}


def test_converted_params_apply():
    sd = fake_state_dict()
    params = convert_fake(sd)
    model = CLIP(
        embed_dim=16, image_resolution=16, vision_patch_size=8, vision_width=64,
        vision_layers=2, text_width=32, text_layers=2, text_heads=2,
        context_length=8, vocab_size=64,
    )
    imgs = jnp.zeros((2, 16, 16, 3))
    toks = jnp.asarray([[1, 5, 63, 0, 0, 0, 0, 0]] * 2, jnp.int32)
    # structural check: converted tree must match the module's init tree
    ref = model.init(jax.random.PRNGKey(0), imgs, toks)["params"]
    ref_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(ref)[0], key=lambda t: jax.tree_util.keystr(t[0])),
        sorted(jax.tree_util.tree_flatten_with_path(params)[0], key=lambda t: jax.tree_util.keystr(t[0])),
    ):
        assert np.shape(a) == np.shape(b), (jax.tree_util.keystr(pa), np.shape(a), np.shape(b))
    logits_i, logits_t = model.apply({"params": params}, imgs, toks)
    assert np.all(np.isfinite(np.asarray(logits_i)))


def test_attention_mapping_matches_torch_semantics():
    """flax MHA with the converted in_proj weights == manual torch attention."""
    sd = fake_state_dict()
    prefix = "visual.transformer.resblocks.0.attn."
    width, heads = 64, 4
    p = _reshape_mha_for_flax(_mha_params(sd, prefix), heads)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 5, width)).astype(np.float32)

    # torch MultiheadAttention semantics (manual numpy)
    wqkv = sd[prefix + "in_proj_weight"]
    bqkv = sd[prefix + "in_proj_bias"]
    q = x @ wqkv[:width].T + bqkv[:width]
    k = x @ wqkv[width : 2 * width].T + bqkv[width : 2 * width]
    v = x @ wqkv[2 * width :].T + bqkv[2 * width :]
    hd = width // heads

    def split(a):
        return a.reshape(1, 5, heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    att = np.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
    att = np.exp(att - att.max(-1, keepdims=True))
    att = att / att.sum(-1, keepdims=True)
    out = np.einsum("bhqk,bhkd->bhqd", att, vh).transpose(0, 2, 1, 3).reshape(1, 5, width)
    want = out @ sd[prefix + "out_proj.weight"].T + sd[prefix + "out_proj.bias"]

    import flax.linen as nn

    mha = nn.MultiHeadDotProductAttention(num_heads=heads, qkv_features=width)
    got = mha.apply({"params": p}, inputs_q=jnp.asarray(x), inputs_k=jnp.asarray(x), inputs_v=jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
