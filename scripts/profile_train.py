"""Component-level timing of the TRAIN step on the real chip.

Decomposes the baseline jitted train step (bs 8, 20k pts, shipped SUN RGB-D
config) into: train-mode forward, criterion (matcher + gIoU + losses over the
9 stacked decoder layers), value_and_grad, and the full step with AdamW.
Directs optimization work; not part of the test suite.
"""

import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _drain(out):
    leaf = jax.tree.leaves(out)[-1]
    np.asarray(leaf)


def timeit(fn, *args, iters=8, warmup=2):
    out = fn(*args)
    _drain(out)
    for _ in range(warmup):
        _drain(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from coda_neurips2023_tpu.criterion import build_criterion
    from coda_neurips2023_tpu.datasets.config import SunrgbdAnonymousConfig
    from coda_neurips2023_tpu.datasets.synthetic import (
        SyntheticDetectionDataset,
        collate,
    )
    from coda_neurips2023_tpu.engine import (
        _TARGET_KEYS,
        create_train_state,
        make_train_step,
    )
    from coda_neurips2023_tpu.models.model_3detr import CoDA3DETR
    from coda_neurips2023_tpu.optimizer import build_optimizer

    B, N = 8, 20000
    cfg = SunrgbdAnonymousConfig()
    model = CoDA3DETR(dataset_config=cfg)
    ds = SyntheticDetectionDataset(cfg, num_scenes=B, num_points=N)
    batch = collate([ds[i] for i in range(B)])
    batch = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)}

    args = types.SimpleNamespace(
        base_lr=1.97e-4, warm_lr=1e-6, warm_lr_epochs=18, final_lr=1e-6,
        lr_scheduler="cosine", weight_decay=0.1, filter_biases_wd=False,
        clip_gradient=0.1, max_epoch=1080,
        matcher_cls_cost=1, matcher_giou_cost=3, matcher_center_cost=5,
        matcher_objectness_cost=5,
        loss_giou_weight=0.0, loss_sem_cls_weight=0.0,
        loss_sem_cls_softmax_weight=0.0,
        loss_sem_cls_softmax_skip_none_gt_sample_weight=1.0,
        loss_no_object_weight=0.05, loss_no_object_contrast_weight=0.05,
        loss_angle_cls_weight=0.1, loss_angle_reg_weight=0.5,
        loss_center_weight=5.0, loss_size_weight=1.0,
        loss_predicted_region_embed_l1_weight=0.0,
        loss_feat_seen_softmax_weakly_loss_with_novel_cate_confi_weight=0.0,
        loss_contrast_object_text=0.0,
        train_range_max=10, test_range_max=46,
        confidence_type="non-confidence",
        if_clip_more_prompts=True, if_clip_superset=False,
        if_clip_weak_labels=False, distillation_box_num=32,
        clip_model_path=None, clip_bpe_path=None,
        online_nms_update_save_novel_label_clip_driven_with_cate_confidence=False,
        online_nms_update_save_epoch=50,
        save_objectness=0.3, clip_driven_keep_thres=0.3,
        if_accumulate_former_pseudo_labels=False,
    )
    tx, schedule = build_optimizer(args, None, 600)
    criterion = build_criterion(args, cfg)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(1)

    # 1. full train step.  The step DONATES its state argument on device
    # backends (engine.make_train_step), so every call must rebind -- reusing
    # a donated state raises "Array has been deleted" on chip.
    step = make_train_step(model, criterion, tx, lr_schedule=schedule)

    def run_step(s):
        s, m = step(s, batch, rng)
        return s, m["loss"]

    tstate, loss = run_step(state)
    _drain(loss)
    for _ in range(2):
        tstate, loss = run_step(tstate)
        _drain(loss)
    t0 = time.perf_counter()
    for _ in range(8):
        tstate, loss = run_step(tstate)
    _drain(loss)
    t_full = (time.perf_counter() - t0) / 8 * 1e3
    del tstate
    # re-make the (donated) initial state for the sub-profiles below
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    print(f"full train step:        {t_full:7.1f} ms")

    # 2. train-mode forward only
    fwd = jax.jit(
        lambda p, bs, c, b, r: model.apply(
            {"params": p, "batch_stats": bs, "constants": c},
            b, train=True, rngs={"dropout": r}, mutable=["batch_stats"],
        )[0]["box_corners"]
    )
    t_fwd = timeit(fwd, state.params, state.batch_stats, state.constants, batch, rng)
    print(f"train-mode forward:     {t_fwd:7.1f} ms")

    # 3. criterion alone on precomputed stacked outputs
    outputs = jax.jit(
        lambda p, bs, c, b, r: model.apply(
            {"params": p, "batch_stats": bs, "constants": c},
            b, train=True, rngs={"dropout": r}, mutable=["batch_stats"],
        )[0]
    )(state.params, state.batch_stats, state.constants, batch, rng)
    outputs = jax.tree.map(jax.lax.stop_gradient, outputs)
    targets = {k: batch[k] for k in _TARGET_KEYS if k in batch}
    crit_fn = jax.jit(lambda o, t: criterion(o, t)[0])
    t_crit = timeit(crit_fn, outputs, targets)
    print(f"criterion (fwd only):   {t_crit:7.1f} ms")

    # 3b. matcher + gIoU only (per stacked layer, as the criterion runs them)
    from coda_neurips2023_tpu.ops.giou import generalized_box3d_iou
    from coda_neurips2023_tpu.ops.hungarian import matcher_assignments

    L = outputs["sem_cls_logits"].shape[0]
    corners = outputs["box_corners"]
    nactual = targets["gt_box_present"].sum(axis=1).astype(jnp.int32)

    def giou_stack(corners_stack):
        return jax.vmap(
            lambda c: generalized_box3d_iou(
                c, targets["gt_box_corners"], nactual, rotated_boxes=True
            )
        )(corners_stack)

    g_fn = jax.jit(giou_stack)
    t_giou = timeit(g_fn, corners)
    print(f"gIoU x{L} layers:        {t_giou:7.1f} ms")

    gious = g_fn(corners)
    cost_stack = -3.0 * gious  # representative (B,nq,ngt) cost per layer

    def match_stack(costs):
        return jax.vmap(
            lambda c: matcher_assignments(c, nactual)["per_prop_gt_inds"]
        )(costs)

    m_fn = jax.jit(match_stack)
    t_match = timeit(m_fn, cost_stack)
    print(f"matcher x{L} layers:     {t_match:7.1f} ms")

    # 4. value_and_grad of fwd+criterion (no optimizer)
    def loss_fn(p, bs, c, b, r):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs, "constants": c},
            b, train=True, rngs={"dropout": r}, mutable=["batch_stats"],
        )
        t = {k: b[k] for k in _TARGET_KEYS if k in b}
        loss, _ = criterion(out, t)
        return loss

    # return value AND grads: returning only the value lets XLA DCE the
    # entire backward pass (jit outputs are always materialized)
    vg = jax.jit(lambda *a: jax.value_and_grad(loss_fn)(*a))
    t_vg = timeit(vg, state.params, state.batch_stats, state.constants, batch, rng)
    print(f"value_and_grad:         {t_vg:7.1f} ms")
    print(f"(optimizer+clip = full - vg ~= {t_full - t_vg:.1f} ms)")


if __name__ == "__main__":
    main()
