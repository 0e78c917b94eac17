"""Stage-2 online novel-object discovery (the CoDA novelty).

Re-design of get_predicted_box_clip_embedding_nms_iou_save_keep_clip_driven_
with_cate_confidence (/root/reference/models/model_3detr.py:1212-1541):
on save epochs (curr_epoch % online_nms_update_save_epoch == 0) the forward
pass mines novel-object pseudo labels:

  1. un-augment predicted boxes (center/size/angle AND corners) back to the
     un-augmented scene frame;
  2. project to the image, build 2D rects; invalid boxes (zero size,
     degenerate rect, behind camera) get score -1;
  3. greedy 2D NMS @ IoU 0.25 over the rects (reference: torchvision.ops.nms);
  4. drop survivors whose axis-aligned 3D IoU with any seen GT box > 0.25;
  5. gate by objectness >= save_objectness;
  6. CLIP-classify the survivors' crops against the (superset) text bank;
     keep max-prob > clip_driven_keep_thres AND argmax >= train_range_max
     (i.e. a non-seen class);
  7. append [center(3), size(3), angle, class, cate_prob, objectness] rows to
     the per-scan `_novel_bbox.npy` (host writer), accumulating across rounds
     when if_accumulate_former_pseudo_labels.

Device/host split: steps 1-6 are ONE jitted function with static shapes
(crops for all nq proposals would be wasteful, so survivors are compacted to
a fixed `max_discovery_crops` slots by score -- the reference's python loop
is unbounded but in practice yields far fewer); step 7 is a host loop over
the batch (the reference also writes from inside forward,
model_3detr.py:1526-1541).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from coda_neurips2023_tpu.models.distillation import (
    crop_square_resize_white,
    preprocess_crops,
)
from coda_neurips2023_tpu.ops.projection import corners_to_image_rects, unaugment_corners


def nms_2d_greedy_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float):
    """torchvision.ops.nms semantics on device. boxes: (N, 4) [y1,x1,y2,x2]
    (any consistent corner convention), scores: (N,) -> keep mask (N,) bool."""
    n = boxes.shape[0]
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(y2 - y1, 0) * jnp.maximum(x2 - x1, 0)

    def pair_iou(i):
        yy1 = jnp.maximum(y1[i], y1)
        xx1 = jnp.maximum(x1[i], x1)
        yy2 = jnp.minimum(y2[i], y2)
        xx2 = jnp.minimum(x2[i], x2)
        inter = jnp.maximum(yy2 - yy1, 0) * jnp.maximum(xx2 - xx1, 0)
        return inter / jnp.maximum(area[i] + area - inter, 1e-12)

    def body(_, state):
        keep, alive = state
        cand = jnp.where(alive, scores, -jnp.inf)
        i = jnp.argmax(cand)
        valid = cand[i] > -jnp.inf
        keep = keep.at[i].set(jnp.logical_or(keep[i], valid))
        iou = pair_iou(i)
        suppress = jnp.logical_or(iou > iou_threshold, jnp.arange(n) == i)
        alive = jnp.where(valid, jnp.logical_and(alive, ~suppress), alive)
        return keep, alive

    keep0 = jnp.zeros((n,), bool)
    alive0 = jnp.ones((n,), bool)
    keep, _ = jax.lax.fori_loop(0, n, body, (keep0, alive0))
    return keep


def aabb_iou_3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray):
    """(N, 6) x (M, 6) [xmin ymin zmin xmax ymax zmax] -> (N, M) IoU
    (reference cal_iou used at model_3detr.py:1381-1394)."""
    lo = jnp.maximum(boxes_a[:, None, :3], boxes_b[None, :, :3])
    hi = jnp.minimum(boxes_a[:, None, 3:], boxes_b[None, :, 3:])
    inter = jnp.prod(jnp.maximum(hi - lo, 0), axis=-1)
    vol_a = jnp.prod(boxes_a[:, 3:] - boxes_a[:, :3], axis=-1)
    vol_b = jnp.prod(boxes_b[:, 3:] - boxes_b[:, :3], axis=-1)
    return inter / jnp.maximum(vol_a[:, None] + vol_b[None, :] - inter, 1e-12)


def _corners_to_aabb(corners):
    return jnp.concatenate(
        [jnp.min(corners, axis=-2), jnp.max(corners, axis=-2)], axis=-1
    )


def discover_novel_boxes(
    outputs_last: dict,
    batch: dict,
    clip_apply_fn,
    superset_text_features: jnp.ndarray,
    logit_scale,
    train_range_max: int,
    save_objectness: float = 0.3,
    clip_driven_keep_thres: float = 0.3,
    nms_iou: float = 0.25,
    gt_iou_thres: float = 0.25,
    max_discovery_crops: int = 32,
    crop_size: int = 224,
):
    """Jittable. Returns dict of device arrays:
      save_box_info (B, nq, 10), novel_mask (B, nq) bool."""
    corners_xyz = jax.lax.stop_gradient(outputs_last["box_corners_xyz"])
    b, nq = corners_xyz.shape[:2]
    max_discovery_crops = min(max_discovery_crops, nq)
    objectness = jax.lax.stop_gradient(outputs_last["objectness_prob"])
    size_unnorm = jax.lax.stop_gradient(outputs_last["size_unnormalized"])

    zx = batch.get("zx_flip_array")
    un_corners = unaugment_corners(
        corners_xyz, batch["scale_array"], batch["rot_array"], batch["flip_array"], zx
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

    # un-augmented box parameters for the saved rows (model_3detr.py:1239-1253)
    center = jax.lax.stop_gradient(outputs_last["center_unnormalized"])
    angle = jax.lax.stop_gradient(outputs_last["angle_continuous"])
    ori_center = center * batch["scale_array"][:, None, :]
    ori_size = size_unnorm * batch["scale_array"][:, None, :]
    ori_center = jnp.einsum("bqi,bij->bqj", ori_center, batch["rot_array"])
    ori_angle = angle + batch["rot_angle"][:, None]
    if zx is not None:
        ori_center = ori_center.at[..., 1].multiply(zx[:, None])
        ori_angle = jnp.where(zx[:, None] < 0, math.pi - ori_angle, ori_angle)
    ori_center = ori_center.at[..., 0].multiply(batch["flip_array"][:, None])
    ori_angle = jnp.where(batch["flip_array"][:, None] < 0, math.pi - ori_angle, ori_angle)

    valid = (
        (jnp.max(size_unnorm, axis=-1) >= 1e-16)
        & (rects[..., 2] - rects[..., 0] > 0)
        & (rects[..., 3] - rects[..., 1] > 0)
        & (min_depth >= 0)
    )
    scores = jnp.where(valid, objectness, -1.0)

    # 2D NMS per sample (reference passes [ymin, xmin, ymax, xmax])
    nms_boxes = jnp.stack(
        [rects[..., 1], rects[..., 0], rects[..., 3], rects[..., 2]], axis=-1
    ).astype(jnp.float32)
    # invalid entries use the dummy (0,0,2,2) rect like the reference
    dummy = jnp.asarray([0.0, 0.0, 2.0, 2.0])
    nms_boxes = jnp.where(valid[..., None], nms_boxes, dummy)
    keep_nms = jax.vmap(lambda bx, sc: nms_2d_greedy_mask(bx, sc, nms_iou))(
        nms_boxes, scores
    )

    # exclude predictions overlapping seen GT (axis-aligned 3D IoU > 0.25)
    pred_aabb = _corners_to_aabb(jax.lax.stop_gradient(outputs_last["box_corners"]))
    gt_aabb = _corners_to_aabb(batch["gt_box_corners"])
    gt_live = batch["gt_box_present"] > 0

    def per_sample_gt_overlap(pa, ga, live):
        iou = aabb_iou_3d(pa, ga)
        iou = jnp.where(live[None, :], iou, 0.0)
        return jnp.max(iou, axis=1) > gt_iou_thres

    overlaps_gt = jax.vmap(per_sample_gt_overlap)(pred_aabb, gt_aabb, gt_live)

    save_mask = keep_nms & ~overlaps_gt & (scores >= save_objectness) & valid

    # compact survivors into max_discovery_crops slots by score
    comp_scores = jnp.where(save_mask, scores, -jnp.inf)
    _, top_idx = jax.lax.top_k(comp_scores, max_discovery_crops)  # (B, S)
    slot_valid = jnp.take_along_axis(save_mask, top_idx, axis=1)

    sel_rects = jnp.take_along_axis(rects, top_idx[..., None], axis=1)
    images = batch["input_image"].astype(jnp.float32)
    crops = jax.vmap(
        lambda img, rcts: jax.vmap(lambda r: crop_square_resize_white(img, r, crop_size))(
            rcts
        )
    )(images, sel_rects)
    crops = preprocess_crops(crops.reshape(b * max_discovery_crops, crop_size, crop_size, 3))
    emb = clip_apply_fn(crops).reshape(b, max_discovery_crops, -1).astype(jnp.float32)
    emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-32)
    logits = jnp.einsum("bsc,kc->bsk", emb, superset_text_features.astype(jnp.float32))
    probs = jax.nn.softmax(logits * logit_scale, axis=-1)
    max_score = jnp.max(probs, axis=-1)
    max_idx = jnp.argmax(probs, axis=-1)
    novel_slot = (
        slot_valid
        & (max_score > clip_driven_keep_thres)
        & (max_idx >= train_range_max)
    )  # (B, S)

    # scatter slot results back to (B, nq)
    novel_mask = jnp.zeros((b, nq), bool)
    cls_full = jnp.full((b, nq), -1.0)
    prob_full = jnp.zeros((b, nq))
    novel_mask = jax.vmap(lambda m, i, v: m.at[i].set(v, mode="drop"))(
        novel_mask, top_idx, novel_slot
    )
    cls_full = jax.vmap(lambda m, i, v: m.at[i].set(v, mode="drop"))(
        cls_full, top_idx, jnp.where(novel_slot, max_idx.astype(jnp.float32), -1.0)
    )
    prob_full = jax.vmap(lambda m, i, v: m.at[i].set(v, mode="drop"))(
        prob_full, top_idx, jnp.where(novel_slot, max_score, 0.0)
    )

    save_box_info = jnp.concatenate(
        [
            ori_center,
            ori_size,
            ori_angle[..., None],
            cls_full[..., None],
            prob_full[..., None],
            jnp.where(novel_mask, scores, 0.0)[..., None],
        ],
        axis=-1,
    )  # (B, nq, 10)
    return {"save_box_info": save_box_info, "novel_mask": novel_mask}


def write_pseudo_labels(
    save_box_info: np.ndarray,
    novel_mask: np.ndarray,
    pseudo_box_paths: list,
    gt_ori_box_num: np.ndarray,
    accumulate: bool = True,
    max_num_obj: int = 64,
):
    """Host writer (reference model_3detr.py:1515-1541): per-scan append of
    10-dim pseudo rows, capped so ori_num + new <= max_num_obj."""
    for i, path in enumerate(pseudo_box_paths):
        if not path or path == "_":
            continue
        rows = save_box_info[i][novel_mask[i]]
        budget = max(max_num_obj - int(gt_ori_box_num[i]), 0)
        rows = rows[:budget]
        if rows.shape[0] == 0:
            continue
        if accumulate and os.path.exists(path):
            former = np.load(path)
            rows = rows if former.shape[0] == 0 else np.concatenate([former, rows], 0)
        np.save(path, rows)
