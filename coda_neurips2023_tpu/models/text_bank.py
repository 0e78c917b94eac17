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


def encode_prompts(prompts, clip_model=None, clip_variables=None, bpe_path=None, batch=64):
    """full prompt strings -> (len(prompts), 512) row-normalized float32."""
    if clip_model is None or clip_variables is None:
        return _pseudo_embedding(prompts)
    import jax.numpy as jnp

    from coda_neurips2023_tpu.models.tokenizer import tokenize

    ctx_len = getattr(clip_model, "context_length", 77)
    toks = tokenize(list(prompts), context_length=ctx_len, bpe_path=bpe_path)
    toks = np.minimum(toks, clip_model.vocab_size - 1)
    outs = []
    for i in range(0, len(prompts), batch):
        t = jnp.asarray(toks[i : i + batch])
        emb = clip_model.apply(clip_variables, t, method=clip_model.encode_text)
        outs.append(np.asarray(emb, np.float32))
    e = np.concatenate(outs, 0)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


def encode_names(names, clip_model=None, clip_variables=None, bpe_path=None, batch=64):
    """names -> (len(names), 512) row-normalized float32."""
    return encode_prompts(
        [prompt(n) for n in names], clip_model, clip_variables, bpe_path, batch
    )


def superset_prompt_list(class_names, superset_names, seen_idx):
    """The LVIS-superset prompt list, reference-exact
    (model_3detr.py:286-321): prompts of the SEEN classes first (first 10 of
    the vocabulary for SUN RGB-D, seen_idx rows for ScanNet), then every
    superset prompt not already present, deduplicating at the PROMPT level in
    order.  The seen classes therefore occupy rows [0, n_seen) -- the stage-2
    novelty gate is `argmax >= train_range_max`."""
    keys = []
    for i in seen_idx:
        p = prompt(class_names[i])
        if p not in keys:
            keys.append(p)
    for n in superset_names:
        p = prompt(n)
        if p not in keys:
            keys.append(p)
    return keys


def build_text_banks(
    dataset_config,
    train_range_max: int,
    test_range_max: int,
    superset_names: Optional[list] = None,
    cmp_names: Optional[list] = None,
    seen_idx: Optional[list] = None,
    if_clip_more_prompts: bool = False,
    clip_model=None,
    clip_variables=None,
    bpe_path=None,
):
    """Returns {train, test, cmp, superset} -> (ncls, 512) normalized arrays
    plus "superset_prompts" (the resolved prompt list, for tests/debug).

    Like the reference: the "train" bank covers the full test vocabulary when
    if_clip_more_prompts (model_3detr.py:252-270) -- the criterion then slices
    [:train_range_max] for seen-class losses (forward, model_3detr.py:1790);
    the superset bank is seen-classes-first + LVIS additions
    (superset_prompt_list); the cmp bank is the OV-3DETR vocabulary
    (model_3detr.py:344-353).  seen_idx defaults to the first train_range_max
    vocabulary rows (SUN RGB-D); ScanNet passes the config's seen positions.
    """
    class_names = getattr(dataset_config, "vocab_names", None) or [
        dataset_config.class2type.get(i, f"class_{i:04d}") for i in range(test_range_max)
    ]
    class_names = list(class_names)[:test_range_max]
    while len(class_names) < test_range_max:
        class_names.append(f"class_{len(class_names):04d}")
    encp = lambda prompts: encode_prompts(prompts, clip_model, clip_variables, bpe_path)
    enc = lambda names: encode_names(names, clip_model, clip_variables, bpe_path)
    test_bank = enc(class_names)
    train_bank = test_bank if if_clip_more_prompts else test_bank[:train_range_max]
    banks = {
        "train": train_bank,
        "test": test_bank,
        "cmp": enc(cmp_names) if cmp_names else test_bank,
    }
    if superset_names:
        if seen_idx is None:
            seen_idx = list(range(train_range_max))
        keys = superset_prompt_list(class_names, superset_names, seen_idx)
        # seen rows reuse the already-encoded test-bank embeddings (identical
        # prompts); only the additions are encoded
        n_seen = 0
        seen_rows = []
        seen_prompt_set = set()
        for i in seen_idx:
            p = prompt(class_names[i])
            if p not in seen_prompt_set:
                seen_prompt_set.add(p)
                seen_rows.append(test_bank[i])
                n_seen += 1
        extra = keys[n_seen:]
        parts = [np.stack(seen_rows)] if seen_rows else []
        if extra:
            parts.append(encp(extra))
        banks["superset"] = np.concatenate(parts, 0)
        banks["superset_prompts"] = keys
    else:
        banks["superset"] = test_bank
        banks["superset_prompts"] = [prompt(n) for n in class_names]
    return banks
