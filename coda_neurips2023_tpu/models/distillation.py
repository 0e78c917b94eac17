"""CLIP crop distillation targets -- fully batched on device.

Re-design of get_predicted_box_clip_embedding
(/root/reference/models/model_3detr.py:902-1210).  The reference runs a
python loop per sample per box: crop with tensor slicing, pad to a white
square, torchvision-resize, then one CLIP forward per sample.  That loop is
the reference's hot spot #3 (SURVEY.md call stack) and forces host syncs.

Here the whole thing is one jitted pipeline over static shapes:
  1. un-augment predicted corners, project through K/Rtilt, build integer
     crop rects in padded-image coordinates (ops/projection.py);
  2. select `distillation_box_num` of the nq proposals per sample with an
     on-device random permutation (reference: np.random.choice,
     model_3detr.py:997);
  3. separable-matmul square crop: the reference white-pads the crop to a
     square and resizes with torchvision BICUBIC (model_3detr.py:362-363,
     applied at :800/:1067; tensor path == torch F.interpolate bicubic
     antialias, the PIL algorithm: a=-0.5 kernel, support scaled by the
     downscale factor, window truncated at the square bounds and
     renormalized).  Here the identical math is expressed as two
     interpolation matmuls over the ORIGINAL image axes plus a separable
     white-mass term (see crop_square_resize_white), so no (max_edge,
     max_edge) square is ever materialized and shapes stay static.
     Round-3's bilinear hat kernel was the last quantified parity deviation
     (discovery label-agreement 0.912); the bicubic matrices close it.
  4. ONE CLIP image forward over the (B * n_sel) crop batch;
  5. scatter embeddings back to (B, nq, 512) + validity mask; derive CLIP
     weak labels/confidences (model_3detr.py:1160-1185).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from coda_neurips2023_tpu.models.clip import IMAGE_MEAN, IMAGE_STD
from coda_neurips2023_tpu.ops.projection import corners_to_image_rects, unaugment_corners


def _interp_matrix(coords, size: int):
    """Bilinear interpolation matrix: rows are hat-kernel weights around the
    (clipped) source coordinate -- at most two taps per row, row-sum 1."""
    coords = jnp.clip(coords, 0.0, size - 1.0)
    i = jnp.arange(size, dtype=jnp.float32)
    return jnp.clip(1.0 - jnp.abs(coords[:, None] - i[None, :]), 0.0, 1.0)


def _cubic_kernel(x):
    """PIL / torch-antialias cubic convolution kernel, a = -0.5."""
    ax = jnp.abs(x)
    near = ((1.5 * ax - 2.5) * ax) * ax + 1.0
    far = ((-0.5 * ax + 2.5) * ax - 4.0) * ax + 2.0
    return jnp.where(ax <= 1.0, near, jnp.where(ax < 2.0, far, 0.0))


def _bicubic_matrix(edge, crop_min, begin, crop_len, size_img: int,
                    out_size: int, max_taps: int):
    """Bicubic+antialias interpolation matrix over the ORIGINAL image axis.

    Models torch F.interpolate(..., mode='bicubic', antialias=True) -- the
    algorithm torchvision Resize runs on tensors (reference
    model_3detr.py:362-363 via CLIP/clip/clip.py:95-101) -- applied to the
    virtual white square of size `edge` holding the crop
    [crop_min, crop_min+crop_len) at offset `begin`:
      center_o = (o + 0.5) * edge / out,  filter scale s = max(edge/out, 1),
      window [max(center-2s+.5, 0), min(center+2s+.5, edge)) truncated at the
      square bounds, weights cubic((t - center + .5)/s) normalized over the
      FULL window (white taps included).
    Returns (K, m): K (out, size_img) holds the in-crop weights mapped to
    image coordinates; m (out,) = per-row in-crop weight mass, so the white
    contribution of a separable crop is 255 * (1 - m_y[:, None] * m_x[None]).
    Dense by construction (one cubic eval per (o, image-coord) pair) -- no
    scatter, and the two downstream matmuls are unchanged from the bilinear
    version.  `max_taps` only bounds the normalizer arange; it must be >=
    4 * max(edge/out, 1) + 2 for every edge the caller can produce."""
    edge_f = edge.astype(jnp.float32)
    o = jnp.arange(out_size, dtype=jnp.float32)
    scale_raw = edge_f / out_size
    center = scale_raw * (o + 0.5)  # (out,)
    scale = jnp.maximum(scale_raw, 1.0)
    support = 2.0 * scale
    tmin = jnp.maximum(jnp.floor(center - support + 0.5), 0.0)
    tend = jnp.minimum(jnp.floor(center + support + 0.5), edge_f)
    # full-window normalizer (includes taps that land on white padding)
    k = jnp.arange(max_taps, dtype=jnp.float32)
    t_full = tmin[:, None] + k[None, :]
    w_full = _cubic_kernel((t_full - center[:, None] + 0.5) / scale)
    w_full = w_full * (t_full < tend[:, None])
    norm = jnp.sum(w_full, axis=1)
    norm = jnp.where(norm > 0, norm, 1.0)  # degenerate rect: avoid NaN
    # dense in-crop weights addressed by image coordinate
    r = jnp.arange(size_img, dtype=jnp.float32)
    t_r = r[None, :] - crop_min.astype(jnp.float32) + begin  # square coords
    w = _cubic_kernel((t_r - center[:, None] + 0.5) / scale)
    w = w * (t_r >= tmin[:, None]) * (t_r < tend[:, None])
    in_crop = (r >= crop_min) & (r < (crop_min + crop_len).astype(jnp.float32))
    kmat = w * in_crop[None, :] / norm[:, None]
    return kmat, jnp.sum(kmat, axis=1)


def _crop_max_taps(h_img: int, w_img: int, out_size: int) -> int:
    import math

    return int(math.ceil(4.0 * max(1.0, max(h_img, w_img) / out_size))) + 2


def crop_square_resize_white(image, rect, out_size: int = 224):
    """image: (H, W, 3) float in [0, 255]; rect: (4,) int32
    [xmin, ymin, xmax, ymax].  Returns (out_size, out_size, 3): the rect
    cropped, white-padded to square (centered), bicubic+antialias resized,
    rounded back to integral values -- reference-faithful end to end
    (model_3detr.py:1040-1067: uint8 white square -> torchvision
    Resize(224, BICUBIC) -> uint8; torchvision's tensor path rounds+clamps).

    TPU note: the resample is SEPARABLE, so instead of 16 2-D gathers per
    output pixel (XLA general gather -- the round-1 stage-1 bottleneck at
    ~500 ms/step for 256 crops) the crop is two small interpolation matmuls
    out = Ky @ image @ Kx^T + white-mass term that run on the MXU."""
    h_img, w_img = image.shape[0], image.shape[1]
    xmin, ymin, xmax, ymax = rect[0], rect[1], rect[2], rect[3]
    w = ymax - ymin  # vertical extent (reference naming, model_3detr.py:783)
    h = xmax - xmin  # horizontal extent
    max_edge = jnp.maximum(w, h)
    y_begin = ((max_edge - w) // 2).astype(jnp.float32)
    x_begin = ((max_edge - h) // 2).astype(jnp.float32)

    max_taps = _crop_max_taps(h_img, w_img, out_size)
    ky, my = _bicubic_matrix(max_edge, ymin, y_begin, w, h_img, out_size, max_taps)
    kx, mx = _bicubic_matrix(max_edge, xmin, x_begin, h, w_img, out_size, max_taps)
    tmp = jnp.einsum("oh,hwc->owc", ky, image)
    val = jnp.einsum("pw,owc->opc", kx, tmp)
    val = val + 255.0 * (1.0 - my[:, None] * mx[None, :])[..., None]
    return jnp.round(jnp.clip(val, 0.0, 255.0))


def crop_square_resize_white_bilinear(image, rect, out_size: int = 224):
    """Round-3 bilinear variant (hat-kernel matmuls, mask-after-interp white
    padding).  Kept for A/B in scripts/measure_discovery_deviations.py; the
    shipped path is the reference-faithful bicubic above."""
    h_img, w_img = image.shape[0], image.shape[1]
    xmin, ymin, xmax, ymax = rect[0], rect[1], rect[2], rect[3]
    w = (ymax - ymin).astype(jnp.float32)  # vertical extent (reference naming)
    h = (xmax - xmin).astype(jnp.float32)  # horizontal extent
    max_edge = jnp.maximum(w, h)
    y_begin = jnp.floor((max_edge - w) / 2)
    x_begin = jnp.floor((max_edge - h) / 2)

    grid = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * max_edge / out_size - 0.5
    sy = grid - y_begin + ymin.astype(jnp.float32)  # (out,) image y coords
    sx = grid - x_begin + xmin.astype(jnp.float32)  # (out,) image x coords

    row_in = (sy >= ymin) & (sy <= ymax.astype(jnp.float32) - 1)
    col_in = (sx >= xmin) & (sx <= xmax.astype(jnp.float32) - 1)
    inside = row_in[:, None] & col_in[None, :]

    ky = _interp_matrix(sy, h_img)  # (out, H)
    kx = _interp_matrix(sx, w_img)  # (out, W)
    tmp = jnp.einsum("oh,hwc->owc", ky, image)
    val = jnp.einsum("pw,owc->opc", kx, tmp)
    return jnp.where(inside[..., None], val, 255.0)


def preprocess_crops(crops):
    """(N, 224, 224, 3) in [0,255] -> CLIP-normalized."""
    crops = crops / 255.0
    return (crops - jnp.asarray(IMAGE_MEAN)) / jnp.asarray(IMAGE_STD)


def clip_crop_scores(
    outputs_last: dict,
    batch: dict,
    clip_apply_fn,
    text_features: jnp.ndarray,
    logit_scale,
    crop_size: int = 224,
    expand_box: bool = False,
):
    """Eval-time CLIP zero-shot classification of ALL predicted boxes
    (reference clip_to_class_training, model_3detr.py:557-900: used by the
    baseline 3detrmulticlasshead with --if_with_clip).

    Returns sem_cls_prob (B, nq, ncls); invalid boxes (zero size, degenerate
    rect, behind camera) keep zero scores like the reference's zero-init.
    Batch rows are processed under lax.map so the (nq, S, S, 3) crop tensor
    exists for one sample at a time (the reference loops samples too).
    With `expand_box` (--if_expand_box, model_3detr.py:750-762) the shorter
    rect side is grown to a square (centered, clamped to image bounds) before
    cropping, instead of white-padding the rectangular crop.
    """
    corners_xyz = outputs_last["box_corners_xyz"]
    size_unnorm = outputs_last["size_unnormalized"]
    b, nq = corners_xyz.shape[:2]

    un_corners = unaugment_corners(
        corners_xyz,
        batch.get("scale_array", jnp.ones((b, 3))),
        batch.get("rot_array", jnp.tile(jnp.eye(3)[None], (b, 1, 1))),
        batch.get("flip_array", jnp.ones((b,))),
        batch.get("zx_flip_array"),
    )
    rects, min_depth = corners_to_image_rects(
        un_corners,
        batch["K"],
        batch["Rtilt"],
        batch["ori_width"],
        batch["ori_height"],
        batch["x_offset"],
        batch["y_offset"],
        batch.get("image_flip_array", jnp.ones((b,))),
        batch.get("flip_length", batch["ori_width"]),
    )
    if expand_box:
        # grow the shorter side to a square around the same center, clamp to
        # the padded image bounds (reference expands BEFORE the degeneracy
        # check, so expansion can rescue a zero-width rect)
        xmin, ymin, xmax, ymax = (rects[..., i] for i in range(4))
        bw = xmax - xmin
        bh = ymax - ymin
        dx = jnp.where(bh > bw, (bh - bw) // 2, 0)
        dy = jnp.where(bh > bw, 0, (bw - bh) // 2)
        img_h = batch["input_image"].shape[1]
        img_w = batch["input_image"].shape[2]
        rects = jnp.stack(
            [
                jnp.clip(xmin - dx, 0, img_w),
                jnp.clip(ymin - dy, 0, img_h),
                jnp.clip(xmax + dx, 0, img_w),
                jnp.clip(ymax + dy, 0, img_h),
            ],
            axis=-1,
        )
    valid = (
        (jnp.max(size_unnorm, axis=-1) >= 1e-16)
        & (rects[..., 2] - rects[..., 0] > 0)
        & (rects[..., 3] - rects[..., 1] > 0)
        & (min_depth >= 0)
    )

    text = text_features.astype(jnp.float32)

    def per_sample(args):
        img, rcts, val = args
        crops = jax.vmap(lambda r: crop_square_resize_white(img, r, crop_size))(rcts)
        emb = clip_apply_fn(preprocess_crops(crops))
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-32)
        logits = jnp.einsum("qc,kc->qk", emb.astype(jnp.float32), text) * logit_scale
        probs = jax.nn.softmax(logits, axis=-1)
        return probs * val[:, None]

    images = batch["input_image"].astype(jnp.float32)
    return jax.lax.map(per_sample, (images, rects, valid))


def keep_novel_boxes_as_gt(
    outputs: dict,
    batch: dict,
    sel: jnp.ndarray,
    emb: jnp.ndarray,
    valid: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale,
    keep_objectness: float,
    train_range_max: int,
    enabled,
):
    """--if_keep_box (reference model_3detr.py:1108-1155): among the
    distillation-crop boxes, those with objectness > keep_objectness whose
    CLIP crop classifies as a novel class (max prob > 0.5, argmax >=
    train_range_max) are APPENDED to the sample's GT set (present mask, box
    geometry, angle labels from the predictions), capped at max_num_obj.

    `enabled` is a traced bool (epoch gating happens outside).  Returns the
    updated gt_* target arrays.
    """
    b, n_sel = sel.shape
    nq = outputs["objectness_prob"].shape[-1]
    max_obj = batch["gt_box_present"].shape[1]

    norm = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-32)
    logits = jnp.einsum("bsc,kc->bsk", norm, text_features.astype(jnp.float32))
    probs = jax.nn.softmax(logits * logit_scale, axis=-1)
    max_score = jnp.max(probs, axis=-1)
    max_idx = jnp.argmax(probs, axis=-1)
    obj_sel = jnp.take_along_axis(outputs["objectness_prob"], sel, axis=1)
    keep = (
        valid
        & (obj_sel > keep_objectness)
        & (max_score > 0.5)
        & (max_idx >= train_range_max)
        & enabled
    )  # (B, n_sel)

    nactual = jnp.sum(batch["gt_box_present"], axis=1).astype(jnp.int32)  # (B,)
    pos = nactual[:, None] + jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(keep & (pos < max_obj), pos, max_obj)  # max_obj == dropped

    def take(key):
        x = outputs[key]
        return jnp.take_along_axis(
            x, sel.reshape(b, n_sel, *([1] * (x.ndim - 2))), axis=1
        )

    angle_cls = jnp.argmax(take("angle_logits"), axis=-1)
    angle_res = jnp.take_along_axis(take("angle_residual"), angle_cls[..., None], -1)[..., 0]

    def scatter(target, values):
        return jax.vmap(lambda t, p, v: t.at[p].set(v, mode="drop"))(target, pos, values)

    updates = {
        "gt_box_present": scatter(batch["gt_box_present"], jnp.ones_like(keep, jnp.float32)),
        "gt_angle_class_label": scatter(
            batch["gt_angle_class_label"].astype(jnp.int32), angle_cls.astype(jnp.int32)
        ),
        "gt_angle_residual_label": scatter(batch["gt_angle_residual_label"], angle_res),
        "gt_box_sizes_normalized": scatter(
            batch["gt_box_sizes_normalized"], take("size_normalized")
        ),
        "gt_box_corners": scatter(batch["gt_box_corners"], take("box_corners")),
        "gt_box_angles": scatter(batch["gt_box_angles"], take("angle_continuous")),
        "gt_box_centers_normalized": scatter(
            batch["gt_box_centers_normalized"], take("center_normalized")
        ),
    }
    if "gt_box_sizes" in batch:
        updates["gt_box_sizes"] = scatter(batch["gt_box_sizes"], take("size_unnormalized"))
    if "gt_box_corners_xyz" in batch:
        updates["gt_box_corners_xyz"] = scatter(
            batch["gt_box_corners_xyz"], take("box_corners_xyz")
        )
    return updates


def build_clip_distillation_targets(
    rng,
    outputs: dict,
    batch: dict,
    clip_apply_fn,
    text_features: Optional[jnp.ndarray] = None,
    logit_scale: Optional[jnp.ndarray] = None,
    distillation_box_num: int = 32,
    if_clip_weak_labels: bool = False,
    crop_size: int = 224,
    if_keep_box: bool = False,
    keep_objectness: float = 0.5,
    train_range_max: int = 10,
    keep_enabled=False,
    if_select_box_by_objectness: bool = False,
    objectness_select_enabled=False,
):
    """Returns the criterion targets produced by the reference forward:
    gt_text_correlation_embedding (B, nq, 512),
    gt_text_correlation_embedding_mask (B, nq, 1),
    weak_box_cate_label (B, nq) int, weak_confidence_weight (B, nq).

    `outputs` must hold the LAST decoder layer's box quantities (index [-1]
    of the stacked model outputs).  `clip_apply_fn(images)` is the frozen
    CLIP image tower.
    """
    corners_xyz = jax.lax.stop_gradient(outputs["box_corners_xyz"])
    size_unnorm = jax.lax.stop_gradient(outputs["size_unnormalized"])
    b, nq = corners_xyz.shape[:2]
    n_sel = distillation_box_num

    un_corners = unaugment_corners(
        corners_xyz,
        batch["scale_array"],
        batch["rot_array"],
        batch["flip_array"],
        batch.get("zx_flip_array"),
    )
    rects, min_depth = corners_to_image_rects(
        un_corners,
        batch["K"],
        batch["Rtilt"],
        batch["ori_width"],
        batch["ori_height"],
        batch["x_offset"],
        batch["y_offset"],
        batch["image_flip_array"],
        batch["flip_length"],
    )

    # per-sample random selection of distillation boxes
    keys = jax.random.split(rng, b)
    sel = jax.vmap(lambda k: jax.random.permutation(k, nq)[:n_sel])(keys)  # (B, n_sel)
    if if_select_box_by_objectness:
        # --if_select_box_by_objectness (reference model_3detr.py:990-1005,
        # active once curr_epoch >= 540): prefer boxes with objectness > 0.05
        # (in query order), fill the remainder with random low-objectness
        # boxes.  The reference keeps ALL above-threshold boxes when there are
        # more than distillation_box_num; static shapes cap at n_sel.
        objectness = jax.lax.stop_gradient(outputs["objectness_prob"])  # (B, nq)
        fg = objectness > 0.05

        def per_sample(key, fg_row):
            noise = jax.random.uniform(key, (nq,))
            # sort key: foreground first by query index, then background in
            # random order
            idx = jnp.arange(nq)
            rank = jnp.where(fg_row, idx.astype(jnp.float32), nq + noise * nq)
            return jnp.argsort(rank)[:n_sel]

        sel_obj = jax.vmap(per_sample)(keys, fg)
        sel = jnp.where(jnp.asarray(objectness_select_enabled), sel_obj, sel)

    sel_rects = jnp.take_along_axis(rects, sel[..., None], axis=1)  # (B, n_sel, 4)
    sel_depth = jnp.take_along_axis(min_depth, sel, axis=1)
    sel_size = jnp.take_along_axis(size_unnorm, sel[..., None], axis=1)
    valid = (
        (jnp.max(sel_size, axis=-1) >= 1e-16)
        & (sel_rects[..., 2] - sel_rects[..., 0] > 0)
        & (sel_rects[..., 3] - sel_rects[..., 1] > 0)
        & (sel_depth >= 0)
    )  # (B, n_sel)

    images = batch["input_image"].astype(jnp.float32)  # (B, H, W, 3)
    crops = jax.vmap(
        lambda img, rcts: jax.vmap(
            lambda r: crop_square_resize_white(img, r, crop_size)
        )(rcts)
    )(images, sel_rects)  # (B, n_sel, S, S, 3)
    crops = preprocess_crops(crops.reshape(b * n_sel, crop_size, crop_size, 3))

    emb = clip_apply_fn(crops)  # (B * n_sel, 512)
    emb = emb.reshape(b, n_sel, -1).astype(jnp.float32)
    emb = emb * valid[..., None]

    gt_emb = jnp.zeros((b, nq, emb.shape[-1]), jnp.float32)
    mask = jnp.zeros((b, nq, 1), jnp.float32)
    gt_emb = jax.vmap(lambda g, s, e: g.at[s].set(e))(gt_emb, sel, emb)
    mask = jax.vmap(lambda m, s, v: m.at[s].set(v[:, None]))(
        mask, sel, valid.astype(jnp.float32)
    )

    targets = {
        "gt_text_correlation_embedding": gt_emb,
        "gt_text_correlation_embedding_mask": mask,
    }
    if if_keep_box and text_features is not None:
        targets.update(
            keep_novel_boxes_as_gt(
                outputs, batch, sel, emb, valid, text_features, logit_scale,
                keep_objectness, train_range_max, keep_enabled,
            )
        )
    if if_clip_weak_labels and text_features is not None:
        norm = gt_emb / (jnp.linalg.norm(gt_emb, axis=-1, keepdims=True) + 1e-32)
        logits = jnp.einsum("bqc,kc->bqk", norm, text_features.astype(jnp.float32))
        scores = jax.nn.softmax(logits * logit_scale, axis=-1)
        conf = jnp.max(scores, axis=-1)
        label = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        conf = jnp.where(mask[..., 0] < 1, 0.0, conf)
        targets["weak_box_cate_label"] = label
        targets["weak_confidence_weight"] = conf
    else:
        targets["weak_box_cate_label"] = jnp.zeros((b, nq), jnp.int32)
        targets["weak_confidence_weight"] = jnp.zeros((b, nq), jnp.float32)
    return targets
