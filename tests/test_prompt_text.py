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
