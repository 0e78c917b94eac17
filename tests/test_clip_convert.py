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


@pytest.mark.parametrize("dtype,rtol", [(np.float32, 2e-5), ("bfloat16", 2e-2)])
def test_fused_vit_attention_matches_flax(dtype, rtol):
    """Pallas fused ViT attention (interpret mode, the TPU fast path for the
    CLIP image tower) == flax dot_product_attention, at the real ragged
    197-token length (Mosaic tile-padding path exercised)."""
    import flax.linen as nn

    from coda_neurips2023_tpu.ops import pallas_vit_attention as pva

    rng = np.random.default_rng(2)
    b, s, h, d = 3, 197, 4, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, s, h, d)), dtype=jnp.dtype(dtype))
        for _ in range(3)
    )
    want = np.asarray(nn.dot_product_attention(q, k, v), np.float32)
    old = pva._INTERPRET
    pva._INTERPRET = True
    try:
        got = np.asarray(pva.fused_attention_fn(q, k, v), np.float32)
    finally:
        pva._INTERPRET = old
    np.testing.assert_allclose(got, want, rtol=rtol, atol=rtol)


def test_fused_attention_module_matches_flax_mha():
    """clip.FusedAttention (einsum projections + Pallas kernel) produces the
    SAME param tree as nn.MultiHeadDotProductAttention and, applied with the
    flax-MHA-initialized params, the same output — the guarantee that lets
    checkpoints/converter stay attention-impl-agnostic."""
    import flax.linen as nn

    from coda_neurips2023_tpu.models import clip as clip_mod
    from coda_neurips2023_tpu.ops import pallas_vit_attention as pva

    width, heads, s, b = 64, 4, 13, 2
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((b, s, width)), jnp.float32)

    mha = nn.MultiHeadDotProductAttention(num_heads=heads, qkv_features=width)
    params = mha.init(jax.random.PRNGKey(0), x, x, x)["params"]
    want = np.asarray(mha.apply({"params": params}, x, x, x))

    fused = clip_mod.FusedAttention(heads=heads, width=width)
    old = pva._INTERPRET
    pva._INTERPRET = True
    try:
        fused_tree = fused.init(jax.random.PRNGKey(0), x)["params"]
        got = np.asarray(fused.apply({"params": params}, x))
    finally:
        pva._INTERPRET = old
    flat_a = {
        jax.tree_util.keystr(p): np.shape(v)
        for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    flat_b = {
        jax.tree_util.keystr(p): np.shape(v)
        for p, v in jax.tree_util.tree_flatten_with_path(fused_tree)[0]
    }
    assert flat_a == flat_b
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_vit_attention_custom_vjp():
    """The custom VJP (plain-XLA attention pullback; exists so the fused
    stage-1 value_and_grad trace never jvp-expands the pallas kernel) agrees
    with autodiff through the reference jnp attention."""
    import flax.linen as nn

    from coda_neurips2023_tpu.ops import pallas_vit_attention as pva

    rng = np.random.default_rng(4)
    b, h, s, d = 2, 3, 11, 8
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        for _ in range(3)
    )

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(pva._attention_reference(q, k, v)))

    def loss_kernel(q, k, v):
        return jnp.sum(jnp.sin(pva.vit_attention(q, k, v)))

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    old = pva._INTERPRET
    pva._INTERPRET = True
    try:
        got = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    finally:
        pva._INTERPRET = old
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)
