"""Measure the joint effect of the documented discovery-pipeline deviations
on stage-2 pseudo-label populations (VERDICT round-2 weak #7).

Round-3 knobs audited (both since resolved):
  * crop resampling: round-3's bilinear point-sampling deviated from the
    reference's torchvision bicubic+antialias; round 4 replaced the shipped
    crop with reference-faithful bicubic matrices (crop-only deviation was
    P=0.971 / label-agree=0.912; expected ~1.0 now);
  * survivor compaction: top-`max_discovery_crops`=32 slots by objectness vs
    the reference's unbounded python loop (measured: zero effect).

This script runs, over synthetic scenes with a (shared) random CLIP tower,
a host-side REFERENCE-FAITHFUL discovery (unbounded survivors, torch
F.interpolate bicubic+antialias crops with the uint8 round, otherwise
identical steps) against our jitted pipeline, with each deviation also
toggled in isolation, and reports pseudo-label set agreement: per-scene
counts, precision/recall of the survivor sets (proposals are index-aligned,
so set agreement is exact), and class-label agreement on common survivors.
The host path with (crop_mode="ours", cap=32) doubles as an oracle for the
jitted implementation; crop_mode="bilinear" re-measures the retired round-3
kernel.

Usage: python scripts/measure_discovery_deviations.py [--scenes 8] [--nq 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _setup(n_scenes, nq, crop_size, seed=0):
    """Tiny model forward on synthetic image scenes -> (outputs_last, batch,
    clip pieces).  Mirrors the dryrun discovery harness."""
    import jax
    import jax.numpy as jnp

    from coda_neurips2023_tpu.datasets.config import SunrgbdAnonymousConfig
    from coda_neurips2023_tpu.datasets.loader import collate
    from coda_neurips2023_tpu.datasets.synthetic import SyntheticDetectionDataset
    from coda_neurips2023_tpu.models.clip import CLIP
    from coda_neurips2023_tpu.models.model_3detr import CoDA3DETR

    cfg = SunrgbdAnonymousConfig()
    ds = SyntheticDetectionDataset(
        cfg, num_scenes=n_scenes, num_points=1024, with_images=True,
        image_hw=(48, 64), seed=seed,
    )
    batch = collate([ds[i] for i in range(n_scenes)])
    arrays = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)}

    model = CoDA3DETR(
        dataset_config=cfg, enc_dim=32, dec_dim=64, enc_nlayers=2, dec_nlayers=2,
        enc_ffn_dim=32, dec_ffn_dim=32, preenc_npoints=128, nqueries=nq,
    )
    inputs = {
        "point_clouds": arrays["point_clouds"],
        "point_cloud_dims_min": arrays["point_cloud_dims_min"],
        "point_cloud_dims_max": arrays["point_cloud_dims_max"],
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), inputs
    )
    outs = model.apply(variables, inputs, train=False)
    outputs_last = {k: v[-1] for k, v in outs.items() if k not in ("enc_xyz", "enc_inds", "query_xyz")}

    clip = CLIP(
        embed_dim=64, image_resolution=crop_size, vision_patch_size=8,
        vision_width=64, vision_layers=2, text_width=32, text_layers=1,
        text_heads=2, context_length=8, vocab_size=64,
    )
    clip_vars = clip.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, crop_size, crop_size, 3), jnp.float32),
        jnp.zeros((1, 8), jnp.int32),
    )

    def clip_fn(images):
        return clip.apply(clip_vars, images, method=clip.encode_image)

    rng = np.random.default_rng(2)
    bank = rng.standard_normal((20, 64)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    return outputs_last, arrays, clip_fn, jnp.asarray(bank)


def _host_discovery(
    outputs_last, batch, clip_fn, bank, *, train_range_max, save_objectness,
    keep_thres, crop_mode, cap, crop_size, logit_scale=51.3,
):
    """Reference-faithful host discovery.  Steps identical to
    models/discovery.py docstring; crop_mode/cap toggle the two deviations."""
    import jax
    import jax.numpy as jnp

    from coda_neurips2023_tpu.models.discovery import (
        _corners_to_aabb,
        aabb_iou_3d,
    )
    from coda_neurips2023_tpu.models.distillation import (
        crop_square_resize_white,
        crop_square_resize_white_bilinear,
        preprocess_crops,
    )
    from coda_neurips2023_tpu.ops.projection import (
        corners_to_image_rects,
        unaugment_corners,
    )

    corners_xyz = np.asarray(outputs_last["box_corners_xyz"])
    b, nq = corners_xyz.shape[:2]
    objectness = np.asarray(outputs_last["objectness_prob"])
    size_unnorm = np.asarray(outputs_last["size_unnormalized"])

    un_corners = unaugment_corners(
        jnp.asarray(corners_xyz), batch["scale_array"], batch["rot_array"],
        batch["flip_array"], batch.get("zx_flip_array"),
    )
    rects, min_depth = corners_to_image_rects(
        un_corners, batch["K"], batch["Rtilt"], batch["ori_width"],
        batch["ori_height"], batch["x_offset"], batch["y_offset"],
        batch["image_flip_array"], batch["flip_length"],
    )
    rects = np.asarray(rects)
    min_depth = np.asarray(min_depth)

    valid = (
        (size_unnorm.max(-1) >= 1e-16)
        & (rects[..., 2] - rects[..., 0] > 0)
        & (rects[..., 3] - rects[..., 1] > 0)
        & (min_depth >= 0)
    )
    scores = np.where(valid, objectness, -1.0)

    pred_aabb = np.asarray(_corners_to_aabb(outputs_last["box_corners"]))
    gt_aabb = np.asarray(_corners_to_aabb(batch["gt_box_corners"]))
    gt_live = np.asarray(batch["gt_box_present"]) > 0

    images = np.asarray(batch["input_image"], np.float32)
    survivors = []
    for i in range(b):
        # greedy 2D NMS @ 0.25 (torchvision semantics, highest score first)
        order = np.argsort(-scores[i], kind="stable")
        alive = np.ones(nq, bool)
        keep = np.zeros(nq, bool)
        r = np.where(
            valid[i][:, None], rects[i].astype(np.float32),
            np.asarray([0.0, 0.0, 2.0, 2.0]),
        )
        area = np.maximum(r[:, 2] - r[:, 0], 0) * np.maximum(r[:, 3] - r[:, 1], 0)
        for j in order:
            if not alive[j] or scores[i, j] <= -np.inf:
                continue
            keep[j] = True
            xx1 = np.maximum(r[j, 0], r[:, 0]); yy1 = np.maximum(r[j, 1], r[:, 1])
            xx2 = np.minimum(r[j, 2], r[:, 2]); yy2 = np.minimum(r[j, 3], r[:, 3])
            inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
            iou = inter / np.maximum(area[j] + area - inter, 1e-12)
            alive &= ~(iou > 0.25)
        iou_gt = np.asarray(aabb_iou_3d(jnp.asarray(pred_aabb[i]), jnp.asarray(gt_aabb[i])))
        iou_gt = np.where(gt_live[i][None, :], iou_gt, 0.0)
        overlaps = iou_gt.max(1) > 0.25
        mask = keep & ~overlaps & (scores[i] >= save_objectness) & valid[i]
        idxs = np.nonzero(mask)[0]
        if cap is not None and len(idxs) > cap:
            idxs = idxs[np.argsort(-scores[i, idxs], kind="stable")[:cap]]
        if len(idxs) == 0:
            survivors.append({})
            continue

        crops = []
        for j in idxs:
            if crop_mode == "ours":  # the shipped jitted kernel (bicubic)
                crops.append(np.asarray(crop_square_resize_white(
                    jnp.asarray(images[i]), jnp.asarray(rects[i, j], jnp.int32),
                    crop_size,
                )))
            elif crop_mode == "bilinear":  # retired round-3 kernel
                crops.append(np.asarray(crop_square_resize_white_bilinear(
                    jnp.asarray(images[i]), jnp.asarray(rects[i, j], jnp.int32),
                    crop_size,
                )))
            else:  # torchvision-faithful bicubic+antialias on the white square
                import torch
                import torch.nn.functional as F

                x0, y0, x1, y1 = rects[i, j].astype(int)
                crop = images[i, y0:y1, x0:x1]
                h, w = crop.shape[:2]
                edge = max(h, w, 1)
                sq = np.full((edge, edge, 3), 255.0, np.float32)
                oy, ox = (edge - h) // 2, (edge - w) // 2
                sq[oy : oy + h, ox : ox + w] = crop
                t = torch.from_numpy(sq).permute(2, 0, 1)[None]
                t = F.interpolate(t, (crop_size, crop_size), mode="bicubic",
                                  antialias=True)
                # reference resizes a uint8 tensor: torchvision rounds+clamps
                crops.append(np.round(np.clip(t[0].permute(1, 2, 0).numpy(), 0, 255)))
        crops = np.stack(crops)
        emb = np.array(clip_fn(preprocess_crops(jnp.asarray(crops))), np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-32
        logits = emb @ np.asarray(bank).T * logit_scale
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        cls = probs.argmax(-1)
        top = probs.max(-1)
        sel = (top > keep_thres) & (cls >= train_range_max)
        survivors.append({int(j): int(c) for j, c, s in zip(idxs, cls, sel) if s})
    return survivors


def _jitted_discovery(outputs_last, batch, clip_fn, bank, *, train_range_max,
                      save_objectness, keep_thres, crop_size):
    import jax.numpy as jnp

    from coda_neurips2023_tpu.models.discovery import discover_novel_boxes

    out = discover_novel_boxes(
        outputs_last, batch, clip_fn, bank, jnp.float32(51.3),
        train_range_max=train_range_max, save_objectness=save_objectness,
        clip_driven_keep_thres=keep_thres, crop_size=crop_size,
    )
    mask = np.asarray(out["novel_mask"])
    info = np.asarray(out["save_box_info"])
    return [
        {int(j): int(info[i, j, 7]) for j in np.nonzero(mask[i])[0]}
        for i in range(mask.shape[0])
    ]


def agreement(a_sets, b_sets):
    """a vs b survivor dicts {proposal_idx: class} -> counts + P/R + label
    agreement on the intersection."""
    na = sum(len(s) for s in a_sets)
    nb = sum(len(s) for s in b_sets)
    inter = 0
    label_match = 0
    for sa, sb in zip(a_sets, b_sets):
        common = set(sa) & set(sb)
        inter += len(common)
        label_match += sum(sa[j] == sb[j] for j in common)
    prec = inter / na if na else 1.0
    rec = inter / nb if nb else 1.0
    lab = label_match / inter if inter else 1.0
    return {"count_a": na, "count_b": nb, "precision": round(prec, 4),
            "recall": round(rec, 4), "label_agree": round(lab, 4)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenes", type=int, default=8)
    p.add_argument("--nq", type=int, default=64)
    p.add_argument("--crop_size", type=int, default=32)
    p.add_argument("--save_objectness", type=float, default=0.0)
    p.add_argument("--keep_thres", type=float, default=0.04)
    a = p.parse_args()

    outputs_last, batch, clip_fn, bank = _setup(a.scenes, a.nq, a.crop_size)
    kw = dict(train_range_max=10, save_objectness=a.save_objectness,
              keep_thres=a.keep_thres, crop_size=a.crop_size)

    ours = _jitted_discovery(outputs_last, batch, clip_fn, bank, **kw)
    oracle = _host_discovery(outputs_last, batch, clip_fn, bank,
                             crop_mode="ours", cap=32, **kw)
    ref_full = _host_discovery(outputs_last, batch, clip_fn, bank,
                               crop_mode="torch", cap=None, **kw)
    cap_only = _host_discovery(outputs_last, batch, clip_fn, bank,
                               crop_mode="torch", cap=32, **kw)
    crop_only = _host_discovery(outputs_last, batch, clip_fn, bank,
                                crop_mode="bilinear", cap=None, **kw)

    print("scenes:", a.scenes, "nq:", a.nq,
          "thresholds: obj>=%.2f clip>%.2f" % (a.save_objectness, a.keep_thres))
    print("oracle (jitted vs host same-kernel+cap32, should be ~exact):",
          agreement(ours, oracle))
    print("JOINT deviation (ours vs reference-faithful torch-bicubic+unbounded):",
          agreement(ours, ref_full))
    print("  cap-only effect   (torch-bicubic+cap32 vs unbounded):",
          agreement(cap_only, ref_full))
    print("  retired-bilinear  (bilinear+unbounded vs torch-bicubic+unbounded):",
          agreement(crop_only, ref_full))


if __name__ == "__main__":
    main()
