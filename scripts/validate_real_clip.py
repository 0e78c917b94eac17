"""Real-CLIP-weights re-validation runbook.

Round-2/3 caveat: every CLIP-dependent validation (bf16 gate agreement,
bilinear-vs-bicubic crop drift, text-bank parity) ran with RANDOM CLIP
weights because `ViT-B-16.pt` is not in this environment.  This script is
the single command that retires those caveats the moment the asset lands:

    python scripts/validate_real_clip.py --clip /path/to/ViT-B-16.pt

re-runs, with the real tower:
  1. converter fidelity: flax image/text embeddings vs the reference torch
     CLIP (built from the same checkpoint via CLIP/clip/model.py build_model)
  2. bf16-vs-fp32 gate agreement on live crops (the 0.3/0.5 discovery gates)
  3. crop-pipeline drift: our device bilinear-white crop vs host
     bicubic+antialias (torchvision semantics, documented deviation in
     models/distillation.py:18-21) through the SAME tower
  4. text-bank norms/structure from real-BPE prompts (+ torch text-tower
     cross-check when real weights are loaded)

Without --clip it dry-runs every protocol with random weights (converter
cross-checks are skipped; everything else executes) so the harness itself
stays verified.  Exit 0 = all executed checks passed their thresholds.

Reference anchors: model_3detr.py:325 (tower load), 557-900 (crop scores),
CLIP/clip/clip.py:95-101 (preprocess), simple_tokenizer.py (BPE).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_CROPS = 16
PROMPTS = [
    "a photo of a chair in the scene",
    "a photo of a table in the scene",
    "a photo of a sofa in the scene",
    "a photo of a bookshelf in the scene",
    "a photo of a bathtub in the scene",
    "a photo of a night stand in the scene",
]


def _flax_tower(clip_path, dtype):
    import jax
    import jax.numpy as jnp

    from coda_neurips2023_tpu.models.clip import CLIP, convert_openai_checkpoint

    model = CLIP(dtype=dtype)
    if clip_path:
        params = convert_openai_checkpoint(clip_path)
        variables = {"params": params}
        real = True
    else:
        toks = jnp.zeros((1, model.context_length), jnp.int32)
        imgs = jnp.zeros((1, 224, 224, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), imgs, toks)
        real = False
    return model, variables, real


def _crops(n=N_CROPS, seed=5):
    """Synthetic [0,255] crops with low-frequency structure (pure noise makes
    every score identical; gradients + blobs give the towers something to
    disagree about)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(224), np.arange(224), indexing="ij")
    crops = []
    for _ in range(n):
        base = (
            rng.uniform(0, 120)
            + rng.uniform(0.1, 1.0) * xx / 224 * 130
            + rng.uniform(0.1, 1.0) * yy / 224 * 130
        )
        for _ in range(3):
            cy, cx, r = rng.uniform(30, 194, 2).tolist() + [rng.uniform(15, 60)]
            blob = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r)))
            base = base + rng.uniform(-80, 80) * blob
        crops.append(np.stack([base] * 3, -1) + rng.normal(0, 6, (224, 224, 3)))
    return np.clip(np.stack(crops), 0, 255).astype(np.float32)


def _encode_image(model, variables, images_01_255):
    import jax.numpy as jnp

    from coda_neurips2023_tpu.models.distillation import preprocess_crops

    x = preprocess_crops(jnp.asarray(images_01_255))
    feats = model.apply(variables, x, method=model.encode_image)
    feats = np.asarray(feats, np.float32)
    return feats / np.linalg.norm(feats, axis=-1, keepdims=True)


def _text_bank(model, variables, prompts):
    import jax.numpy as jnp

    from coda_neurips2023_tpu.models.tokenizer import tokenize

    toks = jnp.asarray(tokenize(prompts, context_length=model.context_length))
    feats = np.asarray(
        model.apply(variables, toks, method=model.encode_text), np.float32
    )
    return feats / np.linalg.norm(feats, axis=-1, keepdims=True), np.asarray(toks)


# ------------------------------------------------------------------ checks
def check_converter(clip_path, model, variables, crops):
    """flax-vs-torch embedding parity from the same checkpoint (real weights
    only -- with random weights there is no torch side to compare)."""
    if not clip_path:
        feats, _ = _text_bank(model, variables, PROMPTS)
        img = _encode_image(model, variables, crops[:4])
        ok = np.all(np.isfinite(feats)) and np.all(np.isfinite(img))
        return {"mode": "dryrun", "finite": bool(ok)}, bool(ok)

    import torch

    from coda_neurips2023_tpu.models.clip import _torch_state_dict
    from coda_neurips2023_tpu.models.tokenizer import tokenize
    from tests.ref_import import install_stubs, restore

    saved = install_stubs()
    try:
        import importlib

        ref_clip_model = importlib.import_module("CLIP.clip.model")
        sd = {k: torch.as_tensor(v) for k, v in _torch_state_dict(clip_path).items()}
        ref = ref_clip_model.build_model(sd).float().eval()

        from coda_neurips2023_tpu.models.distillation import preprocess_crops

        x = np.asarray(preprocess_crops(crops[:4]))
        with torch.no_grad():
            ref_img = ref.encode_image(
                torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()
            ).numpy()
        toks = tokenize(PROMPTS, context_length=model.context_length)
        with torch.no_grad():
            ref_txt = ref.encode_text(torch.from_numpy(toks).long()).numpy()
    finally:
        restore(saved)
    ref_img = ref_img / np.linalg.norm(ref_img, axis=-1, keepdims=True)
    ref_txt = ref_txt / np.linalg.norm(ref_txt, axis=-1, keepdims=True)

    our_img = _encode_image(model, variables, crops[:4])
    our_txt, _ = _text_bank(model, variables, PROMPTS)
    img_cos = np.sum(our_img * ref_img, -1).min()
    txt_cos = np.sum(our_txt * ref_txt, -1).min()
    ok = img_cos > 0.999 and txt_cos > 0.999
    return {"mode": "real", "img_cos_min": float(img_cos),
            "txt_cos_min": float(txt_cos)}, bool(ok)


def check_bf16_gates(clip_path, crops):
    """fp32-vs-bf16 tower on the same crops: weak-label argmax agreement and
    the 0.3/0.5 discovery-gate agreement (BASELINE.md protocol, previously
    random-weights-only)."""
    import jax.numpy as jnp

    results = {}
    for dt in (jnp.float32, jnp.bfloat16):
        model, variables, _ = _flax_tower(clip_path, dt)
        bank, _ = _text_bank(model, variables, PROMPTS)
        img = _encode_image(model, variables, crops)
        scores = 100.0 * img @ bank.T
        probs = np.exp(scores - scores.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        results[str(jnp.dtype(dt))] = (np.argmax(probs, -1), probs.max(-1))
    lab32, conf32 = results["float32"]
    lab16, conf16 = results["bfloat16"]
    label_agree = float(np.mean(lab32 == lab16))
    gates = {
        f"gate{thr}": float(np.mean((conf32 > thr) == (conf16 > thr)))
        for thr in (0.3, 0.5)
    }
    ok = label_agree >= 0.95 and all(v >= 0.95 for v in gates.values())
    return {"label_agree": label_agree, **gates}, bool(ok)


def check_crop_drift(clip_path):
    """Device bilinear-white crop vs host bicubic+antialias (torchvision
    Resize semantics) from the SAME source rects, scored by the SAME tower:
    quantifies the documented deviation (models/distillation.py:18-21)."""
    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from coda_neurips2023_tpu.models.distillation import crop_square_resize_white

    rng = np.random.default_rng(9)
    H, W = 240, 320
    image = _crops(1, seed=11)[0]
    image = np.asarray(
        jax.image.resize(jnp.asarray(image), (H, W, 3), "linear"), np.float32
    )
    rects = []
    for _ in range(12):
        x0, y0 = rng.integers(0, W - 40), rng.integers(0, H - 40)
        x1 = rng.integers(x0 + 24, min(x0 + 160, W))
        y1 = rng.integers(y0 + 24, min(y0 + 160, H))
        rects.append([x0, y0, x1, y1])
    rects = np.asarray(rects, np.int32)

    ours = np.asarray(
        jax.vmap(lambda r: crop_square_resize_white(jnp.asarray(image), r))(
            jnp.asarray(rects)
        )
    )

    ref_crops = []
    for x0, y0, x1, y1 in rects:
        crop = image[y0:y1, x0:x1]
        h, w = crop.shape[:2]
        edge = max(h, w)
        sq = np.full((edge, edge, 3), 255.0, np.float32)
        oy, ox = (edge - h) // 2, (edge - w) // 2
        sq[oy : oy + h, ox : ox + w] = crop
        t = torch.from_numpy(sq).permute(2, 0, 1)[None]
        t = F.interpolate(t, (224, 224), mode="bicubic", antialias=True)
        ref_crops.append(t[0].permute(1, 2, 0).numpy())
    ref_crops = np.clip(np.stack(ref_crops), 0, 255)

    model, variables, _ = _flax_tower(clip_path, jnp.float32)
    bank, _ = _text_bank(model, variables, PROMPTS)
    e_ours = _encode_image(model, variables, ours)
    e_ref = _encode_image(model, variables, ref_crops)
    emb_cos = np.sum(e_ours * e_ref, -1)

    def probs(e):
        s = 100.0 * e @ bank.T
        p = np.exp(s - s.max(-1, keepdims=True))
        return p / p.sum(-1, keepdims=True)

    p_ours, p_ref = probs(e_ours), probs(e_ref)
    label_agree = float(np.mean(np.argmax(p_ours, -1) == np.argmax(p_ref, -1)))
    gate_agree = float(
        np.mean((p_ours.max(-1) > 0.3) == (p_ref.max(-1) > 0.3))
    )
    ok = emb_cos.min() > 0.9 and label_agree >= 0.9 and gate_agree >= 0.9
    return {
        "emb_cos_min": float(emb_cos.min()),
        "emb_cos_mean": float(emb_cos.mean()),
        "label_agree": label_agree,
        "gate0.3_agree": gate_agree,
    }, bool(ok)


def check_text_banks(clip_path, model, variables):
    """Real-BPE prompt bank structure: unit norms, finite, distinct prompts
    -> distinct embeddings.  (With real weights the torch cross-check already
    ran in check_converter.)"""
    bank, toks = _text_bank(model, variables, PROMPTS)
    norms = np.linalg.norm(bank, axis=-1)
    gram = bank @ bank.T
    off_diag = gram[~np.eye(len(bank), dtype=bool)]
    ok = (
        np.all(np.isfinite(bank))
        and np.allclose(norms, 1.0, atol=1e-3)
        and float(off_diag.max()) < 0.9999
        and toks[0][0] == 49406  # real BPE table resolved (not hash fallback)
    )
    return {
        "norm_max_dev": float(np.abs(norms - 1).max()),
        "off_diag_cos_max": float(off_diag.max()),
        "sot_token": int(toks[0][0]),
    }, bool(ok)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clip", default=None, help="path to ViT-B-16.pt")
    a = p.parse_args()
    if a.clip and not os.path.exists(a.clip):
        sys.exit(f"--clip {a.clip}: not found")

    import jax.numpy as jnp

    model, variables, real = _flax_tower(a.clip, jnp.float32)
    crops = _crops()
    print(f"=== validate_real_clip ({'REAL weights' if real else 'random-weights DRY RUN'}) ===")

    all_ok = True
    # bf16_gates / crop_drift are STATISTICAL: with random weights the score
    # distribution clusters at the 0.3 gate by construction (the round-2
    # caveat this runbook exists to retire), so their thresholds only gate
    # the run with real weights; the dry run checks they EXECUTE.
    statistical = {"bf16_gates", "crop_drift"}
    for name, fn in [
        ("converter", lambda: check_converter(a.clip, model, variables, crops)),
        ("bf16_gates", lambda: check_bf16_gates(a.clip, crops)),
        ("crop_drift", lambda: check_crop_drift(a.clip)),
        ("text_banks", lambda: check_text_banks(a.clip, model, variables)),
    ]:
        stats, ok = fn()
        if not real and name in statistical:
            tag = "PASS" if ok else "INFO (threshold waived: random weights)"
        else:
            tag = "PASS" if ok else "FAIL"
            all_ok &= ok
        print(f"[{tag}] {name}: "
              + ", ".join(f"{k}={v}" for k, v in stats.items()))
    print("=== " + ("ALL PASS" if all_ok else "FAILURES above") + " ===")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
