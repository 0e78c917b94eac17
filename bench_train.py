"""Training-step throughput benchmark (not the driver headline; see bench.py).

Measures the full jitted train step at the shipped SUN RGB-D config
(bs 8, 20k points, enc 256 / dec 512, 128 queries):
  * baseline: detection losses only (coda_baseline_sunrgbd.sh minus CLIP eval)
  * stage1:   + CLIP ViT-B/16 crop distillation inside the step
              (coda_sunrgbd_stage1.sh)
Prints scenes/s for each.
"""

import time
import types

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from coda_neurips2023_tpu.criterion import build_criterion
    from coda_neurips2023_tpu.datasets.config import (
        SunrgbdAnonymousConfig,
        SunrgbdImageConfig,
    )
    from coda_neurips2023_tpu.datasets.synthetic import (
        SyntheticDetectionDataset,
        collate,
    )
    from coda_neurips2023_tpu.engine import create_train_state, make_train_step
    from coda_neurips2023_tpu.models.model_3detr import CoDA3DETR
    from coda_neurips2023_tpu.optimizer import build_optimizer

    B, N = 8, 20000
    cfg = SunrgbdAnonymousConfig()
    eval_cfg = SunrgbdImageConfig()
    model = CoDA3DETR(dataset_config=cfg)
    ds = SyntheticDetectionDataset(
        cfg, num_scenes=B, num_points=N, with_images=True, image_hw=(531, 730)
    )
    batch = collate([ds[i] for i in range(B)])
    batch = {k: v for k, v in batch.items() if not isinstance(v, list)}

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
        loss_predicted_region_embed_l1_weight=1.0,
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

    def timed(name, criterion_args, extra_fn):
        criterion = build_criterion(criterion_args, cfg)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
        step = make_train_step(model, criterion, tx, extra_targets_fn=extra_fn, lr_schedule=schedule)
        rng = jax.random.PRNGKey(1)
        state, m = step(state, batch, rng)
        float(m["loss"])  # block through compile
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch, rng)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1000:.0f} ms/step, {B/dt:.1f} scenes/s")
        from coda_neurips2023_tpu.utils.flops import compiled_costs, roofline_str

        print(f"{name} {roofline_str(compiled_costs(step, state, batch, rng), dt)}")
        # per-iteration host sync (the reference engine's every-step loss
        # check, engine.py:152-157; our train_one_epoch batches the finite
        # check every log_every steps instead -- this quantifies the gain)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch, rng)
            float(m["loss"])
        dt_sync = (time.perf_counter() - t0) / iters
        print(
            f"{name} (per-step sync): {dt_sync*1000:.0f} ms/step "
            f"(batched finite-check gain {100*(dt_sync-dt)/dt_sync:.1f}%)"
        )
        return dt

    base_args = types.SimpleNamespace(**vars(args))
    base_args.loss_predicted_region_embed_l1_weight = 0.0
    timed("baseline train step", base_args, None)
    # stage-1 (CLIP distillation) timing lives in bench_stage1.py: it uses the
    # two-phase jits (a single fused jit would bake the CLIP weights into the
    # HLO and overflow the compile service).


if __name__ == "__main__":
    from coda_neurips2023_tpu.utils.probe import (
        enable_persistent_compile_cache,
        exit_unless_backend_alive,
    )

    enable_persistent_compile_cache()

    _probe_ms = exit_unless_backend_alive("sunrgbd_train_step_ms", "ms")
    print(f"probe_ms: {_probe_ms:.2f} (tiny-jit round trip; healthy ~1-10 ms)")
    main()
