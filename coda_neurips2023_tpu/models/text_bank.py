"""CLIP text embedding banks.

The reference model ctor precomputes text features for four vocabularies at
init (model_3detr.py:325-399): train-range classes, test classes, the cmp
(OV-3DETR) vocabulary, and the LVIS-1201 superset; prompts are
'a photo of a {name} in the scene' (model_3detr.py:280).  --if_clip_more_prompts
selects the full test-range vocabulary for the train bank.

Without CLIP weights / class assets (data-free runs), banks are deterministic
pseudo-embeddings seeded by the class names, so every code path still runs.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np


def prompt(name: str) -> str:
    return "a photo of a " + name.replace("_", " ").lower() + " in the scene"


def _pseudo_embedding(names, dim=512):
    rows = []
    for n in names:
        seed = int(hashlib.md5(n.encode()).hexdigest()[:8], 16)
        rows.append(np.random.default_rng(seed).standard_normal(dim))
    e = np.stack(rows).astype(np.float32)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


def encode_names(names, clip_model=None, clip_variables=None, bpe_path=None, batch=64):
    """names -> (len(names), 512) row-normalized float32."""
    if clip_model is None or clip_variables is None:
        return _pseudo_embedding(names)
    import jax.numpy as jnp

    from coda_neurips2023_tpu.models.tokenizer import tokenize

    ctx_len = getattr(clip_model, "context_length", 77)
    toks = tokenize([prompt(n) for n in names], context_length=ctx_len, bpe_path=bpe_path)
    toks = np.minimum(toks, clip_model.vocab_size - 1)
    outs = []
    for i in range(0, len(names), batch):
        t = jnp.asarray(toks[i : i + batch])
        emb = clip_model.apply(clip_variables, t, method=clip_model.encode_text)
        outs.append(np.asarray(emb, np.float32))
    e = np.concatenate(outs, 0)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


def build_text_banks(
    dataset_config,
    train_range_max: int,
    test_range_max: int,
    superset_names: Optional[list] = None,
    cmp_names: Optional[list] = None,
    if_clip_more_prompts: bool = False,
    clip_model=None,
    clip_variables=None,
    bpe_path=None,
):
    """Returns {train, test, cmp, superset} -> (ncls, 512) normalized arrays.

    Like the reference: the "train" bank covers the full test vocabulary when
    if_clip_more_prompts (model_3detr.py:252-270) -- the criterion then slices
    [:train_range_max] for seen-class losses (forward, model_3detr.py:1790).
    """
    class_names = [
        dataset_config.class2type.get(i, f"class_{i:04d}") for i in range(test_range_max)
    ]
    enc = lambda names: encode_names(names, clip_model, clip_variables, bpe_path)
    test_bank = enc(class_names)
    train_bank = test_bank if if_clip_more_prompts else test_bank[:train_range_max]
    banks = {
        "train": train_bank,
        "test": test_bank,
        "cmp": enc(cmp_names) if cmp_names else test_bank,
    }
    if superset_names:
        # superset = test classes first, then the LVIS additions
        # (model_3detr.py:286-300 dedups against the test vocabulary)
        extra = [n for n in superset_names if n not in set(class_names)]
        banks["superset"] = np.concatenate([test_bank, enc(extra)], 0)
    else:
        banks["superset"] = test_bank
    return banks
