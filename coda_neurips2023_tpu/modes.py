"""Secondary CLI modes.

Re-implementations of the reference's auxiliary entry points
(/root/reference/main.py:625-961 + engine.py:962-2553):
  * show_boxes    (--show_only):   dump point clouds + predicted/GT boxes as
                                   PLY/OBJ for inspection (engine.py:1356)
  * save_novel    (--save_novel_only): eval-time novel-box mining -> per-scan
                                   `_novel_bbox.npy` (engine.py:2141)
  * save_novel_with_class (--save_novel_with_class_only): same + CLIP class &
                                   prob columns (engine.py:2341) -- our
                                   discovery rows always carry them
  * save_seen     (--save_seen_feat_only): CLIP embeddings of GT ("seen") box
                                   crops per scan (engine.py:1935)
  * crop_boxes    (--crop_only):   save 2D crops of predicted boxes as PNGs
                                   (engine.py:962)
  * cal_classes   (--cal_class_only): prediction/GT class confusion counts
                                   (engine.py:1127 calculate_wrong_class)

All modes reuse the jitted forward / discovery / crop machinery -- no
separate model paths.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from coda_neurips2023_tpu.utils.ply import write_bbox_obj, write_ply


def _forward_last(model, state, batch):
    variables = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "constants": state.constants,
    }
    outputs = model.apply(variables, batch, train=False)
    return {
        k: v[-1]
        for k, v in outputs.items()
        if k not in ("query_xyz", "enc_xyz", "enc_inds")
    }


def show_boxes(model, state, batches, out_dir: str, objectness_thresh: float = 0.5,
               after_nms: bool = False):
    """--show_only; with after_nms (--if_after_nms, reference main.py:1040 ->
    pred_boxes) only NMS-surviving boxes are written."""
    from coda_neurips2023_tpu.utils.nms import nms_3d_faster

    os.makedirs(out_dir, exist_ok=True)
    fwd = jax.jit(lambda s, b: _forward_last(model, s, b))
    n = 0
    for batch in batches:
        device_batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        out = jax.device_get(fwd(state, device_batch))
        pcs = np.asarray(batch["point_clouds"])
        for i in range(pcs.shape[0]):
            scan = int(np.asarray(batch["scan_idx"])[i])
            write_ply(pcs[i, :, :3], os.path.join(out_dir, f"{scan:06d}_pc.ply"))
            keep = out["objectness_prob"][i] > objectness_thresh
            if after_nms and keep.any():
                # greedy 3D NMS over axis-aligned corner extents
                # (reference parse_predictions protocol, ap_calculator.py:903)
                corners = np.asarray(out["box_corners_xyz"][i])
                boxes = np.concatenate(
                    [corners.min(axis=1), corners.max(axis=1),
                     np.asarray(out["objectness_prob"][i])[:, None]], axis=1
                )
                pick = nms_3d_faster(boxes[keep], 0.25)
                idx = np.flatnonzero(keep)[pick]
                keep = np.zeros_like(keep)
                keep[idx] = True
            if keep.any():
                write_bbox_obj(
                    out["box_corners_xyz"][i][keep],
                    os.path.join(out_dir, f"{scan:06d}_pred_boxes.obj"),
                )
            gt_keep = np.asarray(batch["gt_box_present"])[i] > 0
            if gt_keep.any():
                write_bbox_obj(
                    np.asarray(batch["gt_box_corners_xyz"])[i][gt_keep],
                    os.path.join(out_dir, f"{scan:06d}_gt_boxes.obj"),
                )
            n += 1
    return n


def save_novel_boxes(model, state, batches, stage_ctx, with_class: bool = True):
    """Eval-time pseudo-label mining (engine.py:2141 / 2341). Writes the
    10-dim rows (center,size,angle,class,cate_prob,objectness) to each scan's
    pseudo_box_path; `with_class=False` zeroes the class/prob columns like the
    classless variant."""
    fwd = jax.jit(lambda s, b: _forward_last(model, s, b))
    discovery = stage_ctx.discovery_fn()
    total = 0
    for batch in batches:
        device_batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        last = fwd(state, device_batch)
        needed = {
            k: last[k]
            for k in (
                "box_corners", "box_corners_xyz", "center_unnormalized",
                "size_unnormalized", "angle_continuous", "objectness_prob",
            )
        }
        total += stage_ctx.run_discovery_and_write(discovery, needed, batch)
    return total


def save_seen_feats(model, state, batches, stage_ctx, out_dir: str):
    """CLIP embeddings of GT box crops per scan (engine.py:1935)."""
    from coda_neurips2023_tpu.models.distillation import (
        crop_square_resize_white,
        preprocess_crops,
    )
    from coda_neurips2023_tpu.ops.projection import corners_to_image_rects

    os.makedirs(out_dir, exist_ok=True)
    clip_model = stage_ctx.clip_model
    crop_size = stage_ctx.crop_size
    clip_vars_device = jax.device_put(stage_ctx.clip_variables)

    # CLIP weights are a jit ARGUMENT (closures bake them into the HLO and
    # overflow the compile service, see stages.make_targets_step)
    @jax.jit
    def gt_embeddings(batch, clip_vars):
        def clip_fn(images):
            return jax.lax.stop_gradient(
                clip_model.apply(clip_vars, images, method=clip_model.encode_image)
            )
        corners = batch["gt_box_corners_xyz"]
        b, k = corners.shape[:2]
        rects, depth = corners_to_image_rects(
            corners,
            batch["K"], batch["Rtilt"], batch["ori_width"], batch["ori_height"],
            batch["x_offset"], batch["y_offset"],
            batch.get("image_flip_array", jnp.ones((b,))),
            batch.get("flip_length", batch["ori_width"]),
        )
        images = batch["input_image"].astype(jnp.float32)
        crops = jax.vmap(
            lambda img, rcts: jax.vmap(
                lambda r: crop_square_resize_white(img, r, crop_size)
            )(rcts)
        )(images, rects)
        emb = clip_fn(preprocess_crops(crops.reshape(b * k, crop_size, crop_size, 3)))
        return emb.reshape(b, k, -1)

    n = 0
    for batch in batches:
        device_batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        emb = np.asarray(gt_embeddings(device_batch, clip_vars_device))
        present = np.asarray(batch["gt_box_present"])
        for i in range(emb.shape[0]):
            scan = int(np.asarray(batch["scan_idx"])[i])
            live = present[i] > 0
            np.save(os.path.join(out_dir, f"{scan:06d}_seen_feat.npy"), emb[i][live])
            n += int(live.sum())
    return n


def crop_boxes(model, state, batches, stage_ctx, out_dir: str, max_per_scene: int = 8):
    """Save PNG crops of high-objectness predicted boxes (engine.py:962)."""
    import cv2

    from coda_neurips2023_tpu.models.distillation import crop_square_resize_white
    from coda_neurips2023_tpu.ops.projection import corners_to_image_rects, unaugment_corners

    os.makedirs(out_dir, exist_ok=True)
    fwd = jax.jit(lambda s, b: _forward_last(model, s, b))
    n = 0
    for batch in batches:
        device_batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        out = jax.device_get(fwd(state, device_batch))
        b = out["objectness_prob"].shape[0]
        un = unaugment_corners(
            jnp.asarray(out["box_corners_xyz"]),
            device_batch.get("scale_array", jnp.ones((b, 3))),
            device_batch.get("rot_array", jnp.tile(jnp.eye(3)[None], (b, 1, 1))),
            device_batch.get("flip_array", jnp.ones((b,))),
        )
        rects, _ = corners_to_image_rects(
            un,
            device_batch["K"], device_batch["Rtilt"],
            device_batch["ori_width"], device_batch["ori_height"],
            device_batch["x_offset"], device_batch["y_offset"],
            device_batch.get("image_flip_array", jnp.ones((b,))),
            device_batch.get("flip_length", device_batch["ori_width"]),
        )
        rects = np.asarray(rects)
        for i in range(b):
            order = np.argsort(-out["objectness_prob"][i])[:max_per_scene]
            scan = int(np.asarray(batch["scan_idx"])[i])
            img = jnp.asarray(np.asarray(batch["input_image"])[i], jnp.float32)
            for j in order:
                crop = np.asarray(
                    crop_square_resize_white(img, jnp.asarray(rects[i, j]), 224)
                ).astype(np.uint8)
                cv2.imwrite(
                    os.path.join(out_dir, f"{scan:06d}_{int(j):03d}.png"),
                    cv2.cvtColor(crop, cv2.COLOR_RGB2BGR),
                )
                n += 1
    return n


def calculate_class_confusion(eval_step, state, batches, num_classes: int):
    """Confusion counts between predicted argmax class and best-matched GT
    class (engine.py:1127 calculate_wrong_class)."""
    confusion = np.zeros((num_classes, num_classes), np.int64)
    for batch in batches:
        device_batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        out = jax.device_get(eval_step(state, device_batch))
        pred_cls = np.argmax(out["sem_cls_prob"], -1)
        obj = out["objectness_prob"]
        gt_cls = np.asarray(batch["gt_box_sem_cls_label"])
        gt_present = np.asarray(batch["gt_box_present"])
        gt_centers = np.asarray(batch["gt_box_centers"])
        centers = out["center_unnormalized"]
        for i in range(pred_cls.shape[0]):
            live = gt_present[i] > 0
            if not live.any():
                continue
            gts = gt_centers[i][live]
            gcls = gt_cls[i][live]
            for j in range(pred_cls.shape[1]):
                if obj[i, j] <= 0.5:
                    continue
                d = np.linalg.norm(gts - centers[i, j], axis=1)
                g = int(gcls[np.argmin(d)])
                p = int(pred_cls[i, j])
                if g < num_classes and p < num_classes:
                    confusion[g, p] += 1
    return confusion


def save_box_points(model, state, batches, out_dir: str,
                    objectness_thresh: float = 0.05, min_points: int = 5):
    """--show_box_points (reference save_box_points, engine.py:1604-1725):
    for every predicted box with objectness >= 0.05 containing >= 5 points,
    write `{scan}_{box:04d}_pred_box.npy` (center,size,angle,objectness
    8-vector) and `..._pred_pc.npy` (the points inside the depth-frame box)."""
    from coda_neurips2023_tpu.utils.ap_calculator import (
        flip_axis_to_depth_np,
        points_in_box_mask,
    )

    os.makedirs(out_dir, exist_ok=True)
    fwd = jax.jit(lambda s, b: _forward_last(model, s, b))
    n_written = 0
    for batch in batches:
        device_batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        out = jax.device_get(fwd(state, device_batch))
        pcs = np.asarray(batch["point_clouds"])
        names = batch.get("im_name")
        for i in range(pcs.shape[0]):
            if names is not None:
                stem = os.path.basename(str(names[i])).rsplit(".", 1)[0]
            else:
                stem = f"{int(np.asarray(batch['scan_idx'])[i]):06d}"
            for j in range(out["box_corners"].shape[1]):
                obj = float(out["objectness_prob"][i, j])
                if obj < objectness_thresh:
                    continue
                box3d = flip_axis_to_depth_np(np.asarray(out["box_corners"][i, j]))
                mask = points_in_box_mask(pcs[i, :, :3], box3d)
                if mask.sum() < min_points:
                    continue
                row = np.concatenate(
                    [
                        np.asarray(out["center_unnormalized"][i, j]),
                        np.asarray(out["size_unnormalized"][i, j]),
                        [float(out["angle_continuous"][i, j])],
                        [obj],
                    ]
                )[None]
                np.save(os.path.join(out_dir, f"{stem}_{j:04d}_pred_box.npy"), row)
                np.save(
                    os.path.join(out_dir, f"{stem}_{j:04d}_pred_pc.npy"),
                    pcs[i][mask],
                )
                n_written += 1
    return n_written
