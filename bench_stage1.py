"""Stage-1 (CLIP distillation) train-step throughput — two-phase jits.

--dtype sets the DETECTOR compute dtype; --clip_dtype sets the CLIP tower
dtype (default float32, matching the shipped main.py default; the reference
runs CLIP fp16, CLIP/clip/model.py:1146 convert_weights, but bf16 CLIP
measured ~1.5x slower here -- see BASELINE.md); --agreement additionally
checks that bf16 CLIP-score-driven gates agree with fp32 (the 0.3/0.5
discovery thresholds tolerate small numeric drift)."""

import argparse
import time
import types

import numpy as np


def main():
    cli = argparse.ArgumentParser()
    cli.add_argument("--dtype", default="float32", choices=["float32", "bf16"])
    cli.add_argument("--clip_dtype", default="float32",
                     choices=["float32", "bf16"],
                     help="CLIP tower dtype; float32 is the shipped default "
                          "(main.py --clip_dtype) and what BASELINE.md's "
                          "headline stage-1 numbers were measured with -- "
                          "bf16 CLIP measured ~1.5x SLOWER on v5e, see "
                          "BASELINE.md")
    cli.add_argument("--agreement", action="store_true")
    cli.add_argument("--decompose", action="store_true",
                     help="time phase A (targets) and phase B (train) separately")
    cli.add_argument("--fused", action="store_true",
                     help="ONE jit: targets computed inside the train step "
                          "(round-1 compile blowup retry)")
    cli_args = cli.parse_args()
    import jax

    from coda_neurips2023_tpu.criterion import build_criterion
    from coda_neurips2023_tpu.datasets.config import (
        SunrgbdAnonymousConfig,
        SunrgbdImageConfig,
    )
    from coda_neurips2023_tpu.datasets.synthetic import (
        SyntheticDetectionDataset,
        collate,
    )
    from coda_neurips2023_tpu.engine import create_train_state
    from coda_neurips2023_tpu.models.model_3detr import CoDA3DETR
    from coda_neurips2023_tpu.optimizer import build_optimizer
    from coda_neurips2023_tpu.stages import StageContext

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
        loss_sem_cls_softmax_2d_box_iou_supervised_skip_none_gt_sample_weight=0.0,
        loss_sem_cls_softmax_skip_none_gt_sample_en_discovery_objectness_weight=0.0,
        loss_sem_cls_softmax_skip_none_gt_sample_keep_discovery_objectness_weight=0.0,
        loss_sem_cls_softmax_discovery_novel_objectness_weight=0.0,
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
        if_keep_box=False,
        compute_dtype=cli_args.dtype,
        clip_dtype=cli_args.clip_dtype,
    )
    args.if_clip_weak_labels = cli_args.agreement
    tx, schedule = build_optimizer(args, None, 600)
    ctx = StageContext(args, eval_cfg)
    criterion = build_criterion(args, cfg)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    if cli_args.fused:
        step = ctx.make_fused_train_step(model, criterion, tx, lr_schedule=schedule)
    else:
        step = ctx.make_two_phase_train_step(model, criterion, tx, lr_schedule=schedule)

    t0 = time.perf_counter()
    state, m = step(state, batch, jax.random.PRNGKey(1))
    print(f"stage-1 compile+first step: {time.perf_counter()-t0:.0f} s", flush=True)
    float(m["loss"])
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, jax.random.PRNGKey(1))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(
        f"stage-1 train step [{cli_args.dtype}]: {dt*1000:.0f} ms, "
        f"{B/dt:.1f} scenes/s", flush=True
    )
    from coda_neurips2023_tpu.utils.flops import compiled_costs, roofline_str

    # two-phase mode wraps two jits in python (no .lower) -> prints n/a;
    # --fused exposes the single jit and gets the real roofline
    print("stage-1 " + roofline_str(
        compiled_costs(step, state, batch, jax.random.PRNGKey(1)), dt
    ), flush=True)

    if cli_args.decompose:
        import jax.numpy as jnp

        targets_step = ctx.make_targets_step(model)
        tgt = targets_step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(tgt)
        t0 = time.perf_counter()
        for _ in range(iters):
            tgt = targets_step(state, batch, jax.random.PRNGKey(1))
        float(jnp.sum(tgt["gt_text_correlation_embedding_mask"]))
        dt_a = (time.perf_counter() - t0) / iters
        print(f"phase A (fwd + crops + CLIP): {dt_a*1000:.0f} ms")
        print("phase A " + roofline_str(
            compiled_costs(targets_step, state, batch, jax.random.PRNGKey(1)),
            dt_a,
        ))

        from coda_neurips2023_tpu.engine import make_train_step

        tstep = make_train_step(
            model, criterion, tx, criterion_consts=ctx.criterion_consts(),
            lr_schedule=schedule,
        )
        batch_b = {**batch, **jax.device_get(tgt)}
        # tstep DONATES its state input (engine.make_train_step): give it a
        # fresh state and rebind every call, keeping `state` alive for the
        # sections below
        s2 = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
        s2, m2 = tstep(s2, batch_b, jax.random.PRNGKey(1))
        float(m2["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            s2, m2 = tstep(s2, batch_b, jax.random.PRNGKey(1))
        float(m2["loss"])
        dt_b = (time.perf_counter() - t0) / iters
        print(f"phase B (train fwd+bwd+opt): {dt_b*1000:.0f} ms")
        print("phase B " + roofline_str(
            compiled_costs(tstep, s2, batch_b, jax.random.PRNGKey(1)), dt_b
        ))

        # CLIP image tower alone at the crop batch size
        n_crops = B * args.distillation_box_num
        crops = jnp.zeros((n_crops, 224, 224, 3), jnp.float32)
        clip_vars = jax.device_put(ctx.clip_variables)
        clip_model = ctx.clip_model

        @jax.jit
        def clip_fwd(v, x):
            return clip_model.apply(v, x, method=clip_model.encode_image)

        e = clip_fwd(clip_vars, crops)
        jax.block_until_ready(e)
        t0 = time.perf_counter()
        for _ in range(iters):
            e = clip_fwd(clip_vars, crops)
        float(jnp.sum(e))
        dt_c = (time.perf_counter() - t0) / iters
        print(f"CLIP tower alone ({n_crops} crops): {dt_c*1000:.0f} ms")
        # the one matmul-dominated component: MFU is meaningful here
        print("CLIP tower " + roofline_str(
            compiled_costs(clip_fwd, clip_vars, crops), dt_c
        ))

    if cli_args.agreement:
        # fp32-vs-bf16 CLIP gate agreement on the SAME batch/rng: weak-label
        # argmax and the 0.3/0.5 score thresholds
        import jax.numpy as jnp

        results = {}
        for dt_name in ("float32", "bf16"):
            args.compute_dtype = dt_name
            args.clip_dtype = dt_name
            ctx_d = StageContext(args, eval_cfg)
            targets_step = ctx_d.make_targets_step(model)
            tgt = jax.device_get(targets_step(state, batch, jax.random.PRNGKey(1)))
            results[dt_name] = tgt
        lab32 = results["float32"]["weak_box_cate_label"]
        lab16 = results["bf16"]["weak_box_cate_label"]
        conf32 = results["float32"]["weak_confidence_weight"]
        conf16 = results["bf16"]["weak_confidence_weight"]
        live = np.asarray(results["float32"]["gt_text_correlation_embedding_mask"])[..., 0] > 0
        n = max(live.sum(), 1)
        label_agree = float((np.asarray(lab32 == lab16) & live).sum()) / n
        for thr in (0.3, 0.5):
            gate_agree = float(
                (((np.asarray(conf32) > thr) == (np.asarray(conf16) > thr)) & live).sum()
            ) / n
            print(f"bf16 gate>{thr} agreement on live crops: {gate_agree:.4f}")
        print(f"bf16 weak-label argmax agreement on live crops: {label_agree:.4f}")


if __name__ == "__main__":
    from coda_neurips2023_tpu.utils.probe import (
        enable_persistent_compile_cache,
        exit_unless_backend_alive,
    )

    enable_persistent_compile_cache()

    _probe_ms = exit_unless_backend_alive("sunrgbd_stage1_step_ms", "ms")
    print(f"probe_ms: {_probe_ms:.2f} (tiny-jit round trip; healthy ~1-10 ms)")
    main()
