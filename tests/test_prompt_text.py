"""encode_text_with_prompt_embedding parity vs a literal numpy re-implementation
of the reference's per-row loop (CLIP/clip/model.py:1084-1127)."""

import numpy as np

import jax
import jax.numpy as jnp

from coda_neurips2023_tpu.models.clip import CLIP, _insert_prompt_embeddings


def reference_insert(x_ori, tokens, former, later):
    """Direct transcription of the reference loop semantics in numpy."""
    b, seq_len, w = x_ori.shape
    lf = 0 if former is None else former.shape[0]
    ll = 0 if later is None else later.shape[0]
    out = np.zeros_like(x_ori)
    for i in range(b):
        lt = int(np.argmax(tokens[i])) + 1
        parts = [x_ori[i][0:1]]
        if lf:
            parts.append(former)
        parts.append(x_ori[i][1 : lt - 1])
        if ll:
            parts.append(later)
        parts.append(x_ori[i][lt - 1 : lt])
        parts.append(x_ori[i][lt + lf + ll :])
        out[i] = np.concatenate(parts, 0)
    return out


def test_insert_matches_reference_loop():
    rng = np.random.default_rng(0)
    b, seq_len, w = 3, 16, 8
    x = rng.standard_normal((b, seq_len, w)).astype(np.float32)
    # token rows: SOT(1) name... EOT(high id) pad(0); varying lengths
    tokens = np.zeros((b, seq_len), np.int32)
    for i, lt in enumerate([4, 7, 10]):
        tokens[i, 0] = 1
        tokens[i, 1 : lt - 1] = 5
        tokens[i, lt - 1] = 99  # EOT = max id
    former = rng.standard_normal((2, w)).astype(np.float32)
    later = rng.standard_normal((3, w)).astype(np.float32)

    for f, l in [(former, later), (former, None), (None, later), (None, None)]:
        got = np.asarray(
            _insert_prompt_embeddings(
                jnp.asarray(x), jnp.asarray(tokens),
                None if f is None else jnp.asarray(f),
                None if l is None else jnp.asarray(l),
            )
        )
        ref = reference_insert(x, tokens, f, l)
        np.testing.assert_allclose(got, ref, rtol=1e-6, err_msg=f"lf={f is not None} ll={l is not None}")


def test_clip_prompt_encode_runs():
    model = CLIP(
        embed_dim=16, image_resolution=16, vision_patch_size=8, vision_width=64,
        vision_layers=1, text_width=16, text_layers=1, text_heads=2,
        context_length=12, vocab_size=64,
    )
    tokens = jnp.zeros((2, 12), jnp.int32).at[:, 0].set(1).at[:, 3].set(63)
    imgs = jnp.zeros((1, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, tokens)
    former = jnp.ones((2, 16), jnp.float32)
    later = jnp.ones((1, 16), jnp.float32)
    out = model.apply(
        variables, tokens, former, later,
        method=model.encode_text_with_prompt_embedding,
    )
    assert out.shape == (2, 16)
    assert np.all(np.isfinite(np.asarray(out)))
    # prompts must change the embedding vs plain encode_text
    plain = model.apply(variables, tokens, method=model.encode_text)
    assert not np.allclose(np.asarray(out), np.asarray(plain))


def test_packaged_bpe_table_is_default_and_produces_canonical_ids():
    """The real BPE merge table ships in datasets/assets/ and is the DEFAULT
    tokenizer path (no env var / flag needed).  Golden ids are the canonical
    CLIP tokenizations (verified against the upstream SimpleTokenizer with
    the same bpe_simple_vocab_16e6.txt.gz the reference vendors,
    /root/reference/CLIP/clip/simple_tokenizer.py + clip.py:279)."""
    import os

    from coda_neurips2023_tpu.models.tokenizer import (
        PACKAGED_BPE_PATH,
        SimpleTokenizer,
        tokenize,
    )

    assert os.path.exists(PACKAGED_BPE_PATH)
    SimpleTokenizer()  # resolves the packaged copy without any configuration

    goldens = {
        "a photo of a chair in the scene":
            [49406, 320, 1125, 539, 320, 4269, 530, 518, 3562, 49407],
        "a photo of a night stand in the scene":
            [49406, 320, 1125, 539, 320, 930, 2087, 530, 518, 3562, 49407],
        "table": [49406, 2175, 49407],
        # case-folding + whitespace normalization (whitespace_clean/lower)
        "A PHOTO of  a   Bathtub":
            [49406, 320, 1125, 539, 320, 39942, 49407],
    }
    for text, ids in goldens.items():
        got = tokenize(text)[0]
        assert got.shape == (77,)
        np.testing.assert_array_equal(got[: len(ids)], ids)
        assert np.all(got[len(ids):] == 0)
