"""CLI entry point.

Flag-compatible with the reference argparse surface (main.py:37-304) so the
six shipped run scripts work verbatim (scripts/coda_*_stage{1,2}.sh,
coda_baseline_*.sh):  `python -m coda_neurips2023_tpu.main --dataset_name … `.

Differences by design (TPU single-controller SPMD):
  * no process spawning / --dist_url rendezvous: one process drives the whole
    mesh; --ngpus is interpreted as the number of chips to put in the "dp"
    mesh (extra flags are accepted and ignored with a note);
  * checkpoints are orbax directories rather than .pth files.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

import numpy as np


def make_args_parser():
    parser = argparse.ArgumentParser("CoDA-TPU: open-vocabulary 3D detection", add_help=False)

    ##### Optimizer #####
    parser.add_argument("--base_lr", default=5e-4, type=float)
    parser.add_argument("--warm_lr", default=1e-6, type=float)
    parser.add_argument("--warm_lr_epochs", default=9, type=int)
    parser.add_argument("--final_lr", default=1e-6, type=float)
    parser.add_argument("--lr_scheduler", default="cosine", type=str)
    parser.add_argument("--weight_decay", default=0.1, type=float)
    parser.add_argument("--filter_biases_wd", default=False, action="store_true")
    parser.add_argument("--clip_gradient", default=0.1, type=float)

    ##### Model #####
    parser.add_argument("--model_name", default="3detr_predictedbox_distillation", type=str)
    parser.add_argument("--num_semcls", default=2, type=int)
    parser.add_argument("--test_num_semcls", default=46, type=int)
    parser.add_argument("--enc_type", default="vanilla", choices=["masked", "vanilla"])
    parser.add_argument("--enc_nlayers", default=3, type=int)
    parser.add_argument("--enc_dim", default=256, type=int)
    parser.add_argument("--enc_ffn_dim", default=128, type=int)
    parser.add_argument("--enc_dropout", default=0.1, type=float)
    parser.add_argument("--enc_nhead", default=4, type=int)
    parser.add_argument("--enc_activation", default="relu", type=str)
    parser.add_argument("--dec_nlayers", default=8, type=int)
    parser.add_argument("--dec_dim", default=256, type=int)
    parser.add_argument("--dec_ffn_dim", default=256, type=int)
    parser.add_argument("--dec_dropout", default=0.1, type=float)
    parser.add_argument("--dec_nhead", default=4, type=int)
    parser.add_argument("--mlp_dropout", default=0.3, type=float)
    parser.add_argument("--nsemcls", default=-1, type=int)
    parser.add_argument("--preenc_npoints", default=2048, type=int)
    parser.add_argument("--pos_embed", default="fourier", choices=["fourier", "sine"])
    parser.add_argument("--nqueries", default=256, type=int)
    parser.add_argument("--use_color", default=False, action="store_true")
    parser.add_argument(
        "--compute_dtype", default="float32", choices=["float32", "bf16", "bfloat16"],
        help="matmul/attention compute dtype (params stay f32); ours, not a reference flag",
    )
    parser.add_argument(
        "--clip_dtype", default="float32", choices=["float32", "bf16", "bfloat16"],
        help="frozen CLIP tower compute dtype (the reference runs CLIP fp16, "
             "convert_weights CLIP/clip/model.py:1146, but on v5e fp32 "
             "matmuls already run as bf16 MXU passes and explicit bf16 "
             "measured SLOWER end-to-end: 507 vs 332 ms/step -- see "
             "BASELINE.md); ours, not a reference flag",
    )
    parser.add_argument(
        "--remat", default=False, action="store_true",
        help="per-transformer-layer activation checkpointing "
             "(jax.checkpoint): recompute layer activations in the backward "
             "pass instead of holding them in HBM -- enables larger per-chip "
             "batches at ~1/3 extra layer FLOPs; numerics identical (tested). "
             "Ours, not a reference flag",
    )
    parser.add_argument(
        "--if_two_phase_stage_step", default=False, action="store_true",
        help="split stage training into a targets jit + train jit instead of "
             "the fused single jit (fallback; ours, not a reference flag)",
    )
    parser.add_argument(
        "--if_per_replica_loss_norm", default=True, action="store_true",
        help="normalize loss_sem_cls_softmax_skip_none_gt_sample per dp "
             "replica exactly like the reference's DDP (per-replica "
             "cnt_has_object; reference criterion.py:235-244 + DDP grad "
             "averaging).  DEFAULT since round 5: a dp=8 A/B at a 10%% "
             "empty-scene stress rate measured up to 34%% single-step "
             "divergence on this loss (1.7%% on the total) under the old "
             "global-count formula, so the reference-exact formula ships.  "
             "--if_global_batch_loss_norm restores the global formula "
             "(ours, not a reference flag)",
    )
    parser.add_argument(
        "--if_global_batch_loss_norm", default=False, action="store_true",
        help="opt out of the per-replica DDP normalizer for "
             "loss_sem_cls_softmax_skip_none_gt_sample and use the "
             "global-count formula global_sum/(global_cnt*nq) -- weights "
             "every non-empty scene equally instead of up-weighting scenes "
             "on replicas with fewer of them (ours, not a reference flag)",
    )

    # accepted-for-compat knobs of unwired reference variants
    parser.add_argument("--cross_enc_dim", default=256, type=int)
    parser.add_argument("--cross_num_layers", default=3, type=int)
    parser.add_argument("--cross_heads", default=4, type=int)
    parser.add_argument("--cross_enc_nlayers", default=3, type=int)
    parser.add_argument("--cross_enc_ffn_dim", default=128, type=int)
    parser.add_argument("--cross_enc_dropout", default=0.1, type=float)
    parser.add_argument("--cross_enc_nhead", default=4, type=int)
    parser.add_argument("--every_number", default=4, type=int)
    parser.add_argument("--pooling_methods", default="average", type=str)
    parser.add_argument("--cross_enc_activation", default="relu", type=str)
    parser.add_argument("--enc_pos_embed", default=None, type=str)
    parser.add_argument("--trans_layer_numbers", default=3, type=int)
    parser.add_argument("--trans_head_numbers", default=4, type=int)
    parser.add_argument("--if_add_norm", default=False, action="store_true")
    parser.add_argument("--if_concat_transformer", default=False, action="store_true")
    parser.add_argument("--if_detach_the_guidence_attention", default=False, action="store_true")
    parser.add_argument("--if_with_larger_embedding", default=False, action="store_true")
    parser.add_argument("--if_adopt_region_embed", default=False, action="store_true")
    parser.add_argument("--if_adopt_2d_box_iou_supervision", default=False, action="store_true")
    parser.add_argument("--box2d_iou_thres", default=1.0, type=float)
    parser.add_argument("--box2d_gt_score_thres", default=0.0, type=float)
    parser.add_argument("--iou_match_thres", default=0.25, type=float)
    parser.add_argument("--if_distill_also_match", default=False, action="store_true")
    parser.add_argument("--conclusion_thres", default=1000, type=int)
    parser.add_argument("--clip_with_objectness", default=-1.0, type=float)
    parser.add_argument("--if_clip_trainable", default=False, action="store_true")
    parser.add_argument("--if_clip_text_only_seen", default=False, action="store_true")
    parser.add_argument("--if_only_novel_prompt", default=False, action="store_true")
    parser.add_argument("--former_prompt_len", default=3, type=int)
    parser.add_argument("--later_prompt_len", default=3, type=int)
    parser.add_argument("--prompt_embedding_dir", default=None, type=str)

    ##### CLIP / open-vocab #####
    parser.add_argument("--if_with_clip", default=False, action="store_true")
    parser.add_argument("--if_with_clip_embed", default=False, action="store_true")
    parser.add_argument("--if_use_gt_box", default=False, action="store_true")
    parser.add_argument("--if_expand_box", default=False, action="store_true")
    parser.add_argument("--if_with_fake_classes", default=False, action="store_true")
    parser.add_argument("--if_clip_more_prompts", default=False, action="store_true")
    parser.add_argument("--if_clip_superset", default=False, action="store_true")
    parser.add_argument("--if_clip_weak_labels", default=False, action="store_true")
    parser.add_argument("--clip_model_path", default="./CLIP/pretrain_models/ViT-B-16.pt", type=str)
    parser.add_argument("--clip_bpe_path", default=None, type=str)
    parser.add_argument("--distillation_box_num", default=32, type=int)
    parser.add_argument("--eval_layer_id", default=-1, type=int)

    ##### Stage-2 discovery #####
    parser.add_argument("--if_keep_box", default=False, action="store_true")
    parser.add_argument("--begin_keep_epoch", default=540, type=int)
    parser.add_argument("--if_select_box_by_objectness", default=False, action="store_true")
    parser.add_argument("--keep_objectness", default=0.5, type=float)
    parser.add_argument("--save_objectness", default=0.3, type=float)
    parser.add_argument("--clip_driven_keep_thres", default=0.3, type=float)
    parser.add_argument("--online_nms_update_novel_label", default=False, action="store_true")
    parser.add_argument("--online_nms_update_accumulate_novel_label", default=False, action="store_true")
    parser.add_argument("--online_nms_update_save_novel_label_clip_driven_with_cate_confidence",
                        default=False, action="store_true")
    # other online-NMS pseudo-label strategies (reference main.py:90-110);
    # accepted for surface parity -- the shipped scripts use only the
    # clip_driven_with_cate_confidence strategy above
    parser.add_argument("--online_nms_update_novel_label_for_objectness", default=False, action="store_true")
    parser.add_argument("--online_nms_update_novel_label_for_objectness_with_max_number",
                        default=False, action="store_true")
    parser.add_argument("--online_nms_update_novel_label_for_clip_driven_objectness",
                        default=False, action="store_true")
    parser.add_argument("--online_nms_update_save_novel_label", default=False, action="store_true")
    parser.add_argument("--online_nms_update_save_novel_label_with_prob", default=False, action="store_true")
    parser.add_argument("--online_nms_update_save_novel_label_clip_driven", default=False, action="store_true")
    parser.add_argument("--online_nms_update_save_novel_label_clip_driven_with_cate_confidence_2d_box",
                        default=False, action="store_true")
    parser.add_argument("--online_nms_update_save_novel_label_clip_driven_with_cate_confidence_iou_match_weakly",
                        default=False, action="store_true")
    parser.add_argument("--online_nms_update_max_num_epoch", default=10, type=int)
    parser.add_argument("--if_online_keep_max_box_number", default=False, action="store_true")
    parser.add_argument("--nms_iou_keep", default=0.25, type=float)
    parser.add_argument("--repeat_time", default=2, type=int)
    parser.add_argument("--online_nms_update_save_epoch", default=50, type=int)
    parser.add_argument("--online_nms_update_accumulate_epoch", default=10, type=int)
    parser.add_argument("--if_accumulate_former_pseudo_labels", default=False, action="store_true")
    parser.add_argument("--if_reset_epoch_periodically", default=False, action="store_true")
    parser.add_argument("--reset_epoch_periodically", default=50, type=int)
    parser.add_argument("--pseudo_setting", default="setting0", type=str)
    parser.add_argument("--confidence_type", default="non-confidence", type=str)
    parser.add_argument("--confidence_type_in_datalayer", default="weight_one", type=str)
    parser.add_argument("--if_only_seen_in_loss", default=False, action="store_true")
    parser.add_argument("--if_skip_no_seen_scene_objectness", default=False, action="store_true")
    parser.add_argument("--only_image_class", default=False, action="store_true")
    parser.add_argument("--only_prompt_loss", default=False, action="store_true")

    ##### Matcher #####
    parser.add_argument("--matcher_giou_cost", default=2, type=float)
    parser.add_argument("--matcher_cls_cost", default=1, type=float)
    parser.add_argument("--matcher_center_cost", default=0, type=float)
    parser.add_argument("--matcher_objectness_cost", default=0, type=float)

    ##### Loss weights (reference main.py:160-260) #####
    for name, default in [
        ("loss_giou_weight", 0.0),
        ("loss_sem_cls_weight", 1.0),
        ("loss_sem_cls_softmax_weight", 0.0),
        ("loss_sem_cls_softmax_skip_none_gt_sample_weight", 0.0),
        ("loss_sem_cls_softmax_2d_box_iou_supervised_skip_none_gt_sample_weight", 0.0),
        ("loss_sem_cls_softmax_skip_none_gt_sample_en_discovery_objectness_weight", 0.0),
        ("loss_sem_cls_softmax_skip_none_gt_sample_keep_discovery_objectness_weight", 0.0),
        ("loss_sem_cls_softmax_discovery_novel_objectness_weight", 0.0),
        ("loss_no_object_weight", 0.2),
        ("loss_no_object_contrast_weight", 0.05),
        ("loss_angle_cls_weight", 0.1),
        ("loss_angle_reg_weight", 0.5),
        ("loss_center_weight", 5.0),
        ("loss_size_weight", 1.0),
        ("loss_contrastive_weight", 0.0),
        ("loss_sem_focal_cls_weight", 0.0),
        ("loss_region_embed_weight", 0.0),
        ("loss_predicted_region_embed_l1_weight", 0.0),
        ("loss_predicted_region_embed_l1_only_last_layer_weight", 0.0),
        ("loss_predicted_region_embed_cos_weight", 0.0),
        ("loss_contrast_object_text", 0.0),
        ("loss_batchwise_contrastive_weight", 0.0),
        ("loss_image_seen_class_weight", 0.0),
        ("loss_feat_seen_softmax_loss_weight", 0.0),
        ("loss_feat_seen_softmax_weakly_loss_weight", 0.0),
        ("loss_feat_seen_softmax_weakly_loss_with_novel_cate_confi_weight", 0.0),
        ("loss_feat_seen_softmax_iou_match_weakly_loss_with_novel_cate_confi_weight", 0.0),
        ("loss_feat_seen_softmax_loss_with_novel_cate_confi_weight", 0.0),
        ("loss_feat_seen_sigmoid_with_full_image_loss_weight", 0.0),
        ("loss_feat_seen_sigmoid_loss_weight", 0.0),
        ("loss_3d_2d_region_embed_weight", 0.0),
        ("loss_contrast_3dto2d_text_weight", 0.0),
        ("loss_prompt_softmax_weight", 0.0),
        ("loss_prompt_sigmoid_weight", 0.0),
    ]:
        parser.add_argument(f"--{name}", default=default, type=float)

    ##### Dataset #####
    parser.add_argument("--dataset_name", default="sunrgbd_anonymous_aligned_image", type=str)
    parser.add_argument("--dataset_root_dir", type=str, default=None)
    parser.add_argument("--meta_data_dir", type=str, default=None)
    parser.add_argument("--asset_dir", type=str, default="datasets")
    parser.add_argument("--object_aug_dir", type=str, default=None,
                        help="virtual-object .npy dir for the _object_aug dataset variant")
    parser.add_argument("--calib_dir", type=str, default=None)
    parser.add_argument("--image_dir", type=str, default=None)
    parser.add_argument("--dataset_num_workers", default=4, type=int)
    parser.add_argument("--dataset_num_workers_test", default=4, type=int)
    parser.add_argument("--batchsize_per_gpu", default=8, type=int)
    parser.add_argument("--batchsize_per_gpu_test", default=48, type=int)
    parser.add_argument("--train_range_min", default=0, type=int)
    parser.add_argument("--train_range_max", default=10, type=int)
    parser.add_argument("--test_range_min", default=0, type=int)
    parser.add_argument("--test_range_max", default=46, type=int)
    # raw ScanNet-200 class-id lists (scannet scripts; scannet50_image.py:38-62)
    parser.add_argument("--train_range_list", default=-1, nargs="+", type=int)
    parser.add_argument("--test_range_list", default=-1, nargs="+", type=int)
    parser.add_argument("--reset_scannet_num", default=50, type=int)
    parser.add_argument("--if_use_v1", default=False, action="store_true")
    parser.add_argument("--if_input_image", default=False, action="store_true")
    parser.add_argument("--if_image_augment", default=False, type=bool)
    parser.add_argument("--image_size_width", default=730, type=int)
    parser.add_argument("--image_size_height", default=531, type=int)
    parser.add_argument("--image_size", default=[730, 531], nargs=2, type=int)
    parser.add_argument("--num_points", default=20000, type=int)
    # ours: scene count for the data-free synthetic fallback dataset
    parser.add_argument("--synthetic_num_scenes", default=256, type=int)
    # fraction of synthetic scenes with zero GT boxes (exercises the
    # skip_none_gt loss normalizer; SUN RGB-D's real rate is ~0.4%)
    parser.add_argument("--synthetic_empty_scene_rate", default=0.0, type=float)

    ##### Training #####
    parser.add_argument("--start_epoch", default=-1, type=int)
    parser.add_argument("--set_epoch", default=-1, type=int)
    parser.add_argument("--max_epoch", default=1080, type=int)
    parser.add_argument("--eval_every_epoch", default=10, type=int)
    parser.add_argument("--real_eval_every_epoch", default=90, type=int)
    parser.add_argument("--real_cmp_eval_every_epoch", default=1000000000, type=int)
    parser.add_argument("--seed", default=0, type=int)

    ##### Testing #####
    parser.add_argument("--test_only", default=False, action="store_true")
    parser.add_argument("--test_no_nms", default=False, action="store_true")
    parser.add_argument("--use_old_type_nms", default=False, action="store_true")
    parser.add_argument("--test_ckpt", default=None, type=str)
    parser.add_argument("--show_only", default=False, action="store_true")
    parser.add_argument("--save_novel_only", default=False, action="store_true")
    parser.add_argument("--save_novel_with_class_only", default=False, action="store_true")
    parser.add_argument("--save_seen_feat_only", default=False, action="store_true")
    parser.add_argument("--cal_class_only", default=False, action="store_true")
    parser.add_argument("--crop_only", default=False, action="store_true")
    parser.add_argument("--if_after_nms", default=False, action="store_true",
                        help="crop/show modes use post-NMS parsed boxes (main.py:625-749)")
    parser.add_argument("--minitest_only", default=False, action="store_true")
    parser.add_argument("--show_box_points", default=False, action="store_true")
    parser.add_argument("--show_dir", default=None, type=str)
    parser.add_argument("--crop_dir", default=None, type=str)
    parser.add_argument("--save_novel_dir", default=None, type=str)
    parser.add_argument("--save_seen_dir", default=None, type=str)
    parser.add_argument("--on_cloud", default=True, action="store_false")

    ##### I/O #####
    parser.add_argument("--checkpoint_dir", default=None, type=str)
    parser.add_argument("--checkpoint_file", default=None, type=str)
    parser.add_argument("--log_every", default=10, type=int)
    parser.add_argument("--log_metrics_every", default=20, type=int)
    parser.add_argument("--save_separate_checkpoint_every_epoch", default=100, type=int)
    parser.add_argument("--log_file", default="log.lst", type=str)
    parser.add_argument("--profile_dir", default=None, type=str,
                        help="capture a jax.profiler trace of a few train iterations")

    ##### Distributed (compat; SPMD needs no rendezvous) #####
    parser.add_argument("--ngpus", default=1, type=int)
    parser.add_argument("--dist_url", default="tcp://localhost:12345", type=str)

    return parser


def build_everything(args):
    """dataset -> model -> criterion -> optimizer, like reference main():
    returns a dict of live objects."""
    import jax

    from coda_neurips2023_tpu.criterion import build_criterion
    from coda_neurips2023_tpu.datasets import build_dataset
    from coda_neurips2023_tpu.models import build_model
    from coda_neurips2023_tpu.optimizer import build_optimizer
    from coda_neurips2023_tpu.parallel.mesh import make_mesh

    datasets, dataset_config, real_test_config, real_cmp_config = build_dataset(args)
    if args.model_name == "3detrmulticlasshead" and not args.if_with_clip:
        # the baseline head emits (1 obj + 1 bg)-way sem probs; without the
        # CLIP zero-shot path the closed-vocab real_test eval (46/60-class
        # config) has no class scores to bucket.  Every reachable reference
        # config passes --if_with_clip here (reference
        # scripts/coda_baseline_sunrgbd.sh:35, test_release_models.sh) --
        # fail at startup instead of deep inside parse_predictions.
        raise SystemExit(
            "3detrmulticlasshead requires --if_with_clip (CLIP zero-shot "
            "classification) for the multi-class eval protocol; add "
            "--if_with_clip --if_input_image"
        )
    model, box_processor = build_model(args, dataset_config)
    mesh = make_mesh(min(args.ngpus, len(jax.devices())))
    criterion = build_criterion(args, dataset_config, num_replicas=mesh.devices.size)
    # iters/epoch from the ACTUAL mesh size (ngpus may exceed the available
    # chips), so the per-iteration LR schedule matches len(train_loader)
    n_train = max(len(datasets["train"]), 1)
    iters_per_epoch = max(n_train // (args.batchsize_per_gpu * mesh.devices.size), 1)
    tx, schedule = build_optimizer(args, None, iters_per_epoch)
    stage_ctx = None
    if args.model_name == "3detr_predictedbox_distillation" or args.if_with_clip:
        from coda_neurips2023_tpu.stages import StageContext

        stage_ctx = StageContext(args, real_test_config)
        n_test_classes = int(stage_ctx.text_banks["test"].shape[0])
        if (
            not getattr(args, "if_only_novel_prompt", False)
            and n_test_classes != real_test_config.num_semcls
        ):
            # fail HERE, not with an IndexError inside parse_predictions an
            # epoch later: the zero-shot class count (test text bank, driven
            # by --test_range_max / the vocab assets) must match the eval
            # protocol's --test_num_semcls (reference builds both from the
            # same vocab slice, model_3detr.py:339-389)
            raise ValueError(
                f"test text bank has {n_test_classes} classes but the eval "
                f"config expects {real_test_config.num_semcls} "
                f"(--test_num_semcls); check --test_range_max / "
                f"--test_range_list / --asset_dir vocabulary"
            )
    return {
        "stage_ctx": stage_ctx,
        "datasets": datasets,
        "dataset_config": dataset_config,
        "real_test_config": real_test_config,
        "real_cmp_config": real_cmp_config,
        "model": model,
        "criterion": criterion,
        "tx": tx,
        "schedule": schedule,
        "mesh": mesh,
        "iters_per_epoch": iters_per_epoch,
    }


def do_train(args, ctx):
    """Reference do_train (main.py:307-623): epoch loop, eval cadence,
    checkpoint cadence, periodic epoch reset for stage 2, final eval."""
    import jax

    from coda_neurips2023_tpu.datasets.loader import make_loader
    from coda_neurips2023_tpu.engine import (
        create_train_state,
        evaluate,
        make_eval_step,
        make_train_step,
        train_one_epoch,
    )
    from coda_neurips2023_tpu.utils.io import resume_if_possible, restore_params_only, save_checkpoint
    from coda_neurips2023_tpu.utils.logger import Logger

    model, criterion, tx, mesh = ctx["model"], ctx["criterion"], ctx["tx"], ctx["mesh"]
    datasets = ctx["datasets"]
    logger = Logger(args.checkpoint_dir)
    rng = jax.random.PRNGKey(args.seed)

    global_bs = args.batchsize_per_gpu * mesh.devices.size
    # process workers for real-data sample assembly (reference 4-worker
    # DataLoader, main.py:1027-1033); threads when workers <= 1
    train_loader = make_loader(
        datasets["train"], global_bs, shuffle=True, seed=args.seed, drop_last=True,
        num_workers=max(args.dataset_num_workers, 1),
        use_processes=args.dataset_num_workers > 1,
    )
    sample_batch = next(iter(train_loader))
    # string-valued fields (im_name, pseudo_box_path, ...) stay host-side
    sample_arrays = {k: v for k, v in sample_batch.items() if not isinstance(v, list)}
    state = create_train_state(model, tx, rng, sample_arrays)
    start_epoch = -1
    if args.checkpoint_dir:
        start_epoch, best_metrics, state = resume_if_possible(args.checkpoint_dir, state)
    if args.checkpoint_file:
        state = restore_params_only(args.checkpoint_file, state, model_args=args)
    if args.set_epoch >= 0:
        start_epoch = args.set_epoch - 1
    start_epoch += 1

    # CLIP / open-vocab stage wiring (stage 1: distillation targets inside the
    # train step; stage 2: + weak labels + discovery on save epochs)
    stage_ctx = ctx.get("stage_ctx")
    run_discovery = (
        stage_ctx is not None
        and args.online_nms_update_save_novel_label_clip_driven_with_cate_confidence
    )
    if stage_ctx is not None and stage_ctx.needs_distillation():
        if getattr(args, "if_two_phase_stage_step", False):
            # two jits: CLIP targets phase + train phase (see stages.py) --
            # fallback for compile services that reject the fused graph
            train_step = stage_ctx.make_two_phase_train_step(
                model, criterion, tx, return_last_outputs=run_discovery,
                lr_schedule=ctx["schedule"],
            )
        else:
            # ONE jit (like the reference forward): 444 vs 513 ms/step
            # measured on v5e (BASELINE.md round-2 table)
            train_step = stage_ctx.make_fused_train_step(
                model, criterion, tx, return_last_outputs=run_discovery,
                lr_schedule=ctx["schedule"],
            )
    else:
        train_step = make_train_step(
            model, criterion, tx, return_last_outputs=run_discovery,
            lr_schedule=ctx["schedule"],
        )
    discovery = stage_ctx.discovery_fn() if run_discovery else None
    eval_text = stage_ctx.text_banks["test"] if stage_ctx else None
    if stage_ctx and args.if_with_clip:
        eval_step = stage_ctx.make_clip_eval_step(model)
    else:
        eval_step = make_eval_step(
            model,
            eval_text_features=eval_text,
            eval_logit_scale=stage_ctx.logit_scale if stage_ctx else 100.0,
            eval_layer_id=args.eval_layer_id,
        )
    # cmp-vocab eval step (reference if_cmp_class=True path, main.py:530-566):
    # same model, classification against the OV-3DETR comparison vocabulary
    cmp_eval_step = None
    if stage_ctx and len(datasets.get("real_cmp_test", [])):
        if args.if_with_clip:
            cmp_eval_step = stage_ctx.make_clip_eval_step(model, bank="cmp")
        else:
            cmp_eval_step = make_eval_step(
                model,
                eval_text_features=stage_ctx.text_banks["cmp"],
                eval_logit_scale=stage_ctx.logit_scale,
                eval_layer_id=args.eval_layer_id,
            )
    best_ap25 = -1.0

    # per-iteration LR from the (possibly reset) epoch: reference
    # engine.py:33-55 + the stage-2 periodic epoch reset main.py:568-573 --
    # the warmup+cosine schedule REPLAYS every reset_epoch_periodically epochs
    # over the growing pseudo-label set
    from coda_neurips2023_tpu.optimizer import make_lr_schedule

    ipe = ctx["iters_per_epoch"]
    host_schedule = make_lr_schedule(args, ipe, host=True)

    for epoch in range(start_epoch, args.max_epoch):
        effective_epoch = epoch
        if args.if_reset_epoch_periodically and args.reset_epoch_periodically > 0:
            effective_epoch = epoch % args.reset_epoch_periodically

        state, metrics = train_one_epoch(
            train_step, state, train_loader, rng, mesh=mesh, logger=logger,
            curr_epoch=effective_epoch, log_every=args.log_every,
            all_epoch=epoch,
            lr_fn=lambda it, _e=effective_epoch: host_schedule(_e * ipe + it),
            profile_dir=args.profile_dir if epoch == start_epoch else None,
            discovery_fn=(
                (lambda last, batch: stage_ctx.run_discovery_and_write(discovery, last, batch))
                if run_discovery and stage_ctx.is_save_epoch(effective_epoch)
                else None
            ),
        )
        if logger is not None and metrics:
            logger.log_scalars(
                {k: float(v) for k, v in metrics.items()}, epoch, prefix="Train/"
            )

        if args.checkpoint_dir:
            save_checkpoint(args.checkpoint_dir, state, epoch)
            if (
                args.save_separate_checkpoint_every_epoch > 0
                and epoch % args.save_separate_checkpoint_every_epoch == 0
            ):
                save_checkpoint(
                    args.checkpoint_dir, state, epoch, filename=f"checkpoint_{epoch:04d}"
                )

        last_epoch = epoch == args.max_epoch - 1

        # OV test-split eval + best-checkpoint tracking
        # (reference main.py:463-501: cadence eval_every_epoch on the
        # anonymous/OV config; checkpoint_best follows THIS split's ap25)
        if (
            ((epoch % args.eval_every_epoch == 0 and epoch > 0) or last_epoch)
            and len(datasets["test"])
        ):
            test_loader = make_loader(
                datasets["test"],
                args.batchsize_per_gpu_test * ctx["mesh"].devices.size,
                shuffle=False,
                drop_last=False, pad_last=True,
                num_workers=max(args.dataset_num_workers_test, 1),
            )
            ap = evaluate(
                eval_step, state, test_loader, ctx["dataset_config"], mesh=mesh,
                dataset_name=args.dataset_name,
            )
            m = ap.compute_metrics()
            print("==" * 10)
            print(f"Evaluate Epoch [{epoch}/{args.max_epoch}]")
            print(ap.metrics_to_str(m, per_class=True))
            print("==" * 10)
            ap25 = m[0.25].get("mAP", 0.0)
            logger.log_scalars(ap.metrics_to_dict(m), epoch, prefix="Test/")
            if ap25 > best_ap25 and args.checkpoint_dir:
                best_ap25 = ap25
                save_checkpoint(
                    args.checkpoint_dir, state, epoch, {"ap25": ap25}, "checkpoint_best"
                )

        # closed-vocab real_test eval (reference main.py:504-528; if_real_test)
        if (
            ((epoch % args.real_eval_every_epoch == 0 and epoch > 0) or last_epoch)
            and len(datasets["real_test"])
        ):
            test_loader = make_loader(
                datasets["real_test"],
                args.batchsize_per_gpu_test * ctx["mesh"].devices.size,
                shuffle=False,
                drop_last=False, pad_last=True,
                num_workers=max(args.dataset_num_workers_test, 1),
            )
            ap = evaluate(
                eval_step, state, test_loader, ctx["real_test_config"], mesh=mesh,
                dataset_name=args.dataset_name,
            )
            msg = ap.metrics_to_str(ap.compute_metrics(), per_class=False)
            print(msg)
            if args.checkpoint_dir:
                with open(
                    os.path.join(args.checkpoint_dir, "eval_%04d.lst" % epoch), "w"
                ) as f:
                    f.write(msg)

        # comparison-vocab eval + excel export (reference main.py:530-566).
        # Deviation: the reference also fires this on the final epoch even at
        # the disabled default cadence (1e9); we require the cadence to be
        # explicitly enabled (<= max_epoch) so default runs don't pay a
        # surprise full cmp-vocab eval.
        if (
            cmp_eval_step is not None
            and ((epoch % args.real_cmp_eval_every_epoch == 0 and epoch > 0) or last_epoch)
            and args.real_cmp_eval_every_epoch <= args.max_epoch
        ):
            cmp_loader = make_loader(
                datasets["real_cmp_test"],
                args.batchsize_per_gpu_test * ctx["mesh"].devices.size,
                shuffle=False,
                drop_last=False, pad_last=True,
                num_workers=max(args.dataset_num_workers_test, 1),
            )
            ap = evaluate(
                cmp_eval_step, state, cmp_loader, ctx["real_cmp_config"], mesh=mesh,
                dataset_name=args.dataset_name,
            )
            m = ap.compute_metrics()
            msg = ap.metrics_to_str(m)
            print(msg)
            if args.checkpoint_dir:
                for thresh, suffix in ((0.25, "025"), (0.5, "05")):
                    _export_metrics_excel(
                        {thresh: m[thresh]},
                        os.path.join(
                            args.checkpoint_dir, f"cmp_eval_{epoch:04d}_{suffix}.xlsx"
                        ),
                    )
                with open(
                    os.path.join(args.checkpoint_dir, "cmp_eval_%04d.lst" % epoch), "w"
                ) as f:
                    f.write(msg)

    if args.checkpoint_dir:
        save_checkpoint(args.checkpoint_dir, state, args.max_epoch - 1, filename="last_checkpoint")

    # final eval artifacts (reference main.py:578-623: final_eval.txt / .pkl)
    if len(datasets["real_test"]):
        test_loader = make_loader(
            datasets["real_test"],
            args.batchsize_per_gpu_test * ctx["mesh"].devices.size,
            shuffle=False,
            drop_last=False, pad_last=True,
            num_workers=max(args.dataset_num_workers_test, 1),
        )
        ap = evaluate(
            eval_step, state, test_loader, ctx["real_test_config"], mesh=mesh,
            dataset_name=args.dataset_name,
        )
        metrics = ap.compute_metrics()
        msg = ap.metrics_to_str(metrics)
        print("==" * 10, f"Final Eval Numbers", "==" * 10)
        print(msg)
        if args.checkpoint_dir:
            with open(os.path.join(args.checkpoint_dir, "final_eval.txt"), "w") as f:
                f.write(msg + "\n")
            with open(os.path.join(args.checkpoint_dir, "final_eval.pkl"), "wb") as f:
                pickle.dump(metrics, f)
            _export_metrics_excel(metrics, os.path.join(args.checkpoint_dir, "final_eval.xlsx"))
    return state


def _export_metrics_excel(metrics: dict, path: str):
    """Per-class metric sheet (reference main.py:546-566 pandas export)."""
    try:
        import pandas as pd

        rows = []
        for thresh, ret in metrics.items():
            for k, v in ret.items():
                rows.append({"iou_thresh": thresh, "metric": k, "value": float(v)})
        pd.DataFrame(rows).to_excel(path, index=False)
    except Exception as e:  # openpyxl may be absent
        print(f"excel export skipped: {e}")


def test_model(args, ctx):
    """Reference test_model (main.py:903-961)."""
    import jax

    from coda_neurips2023_tpu.datasets.loader import make_loader
    from coda_neurips2023_tpu.engine import create_train_state, evaluate, make_eval_step
    from coda_neurips2023_tpu.utils.io import restore_params_only

    model, tx, mesh = ctx["model"], ctx["tx"], ctx["mesh"]
    datasets = ctx["datasets"]
    loader = make_loader(
        datasets["real_test"],
        args.batchsize_per_gpu_test * ctx["mesh"].devices.size,
        shuffle=False, drop_last=False, pad_last=True,
    )
    sample = next(iter(loader))
    # string-valued fields stay host-side (like do_train/run_mode)
    sample = {k: v for k, v in sample.items() if not isinstance(v, list)}
    state = create_train_state(model, tx, jax.random.PRNGKey(args.seed), sample)
    if args.test_ckpt:
        state = restore_params_only(args.test_ckpt, state, model_args=args)
    stage_ctx = ctx.get("stage_ctx")
    if stage_ctx and args.if_with_clip:
        eval_step = stage_ctx.make_clip_eval_step(model)
    else:
        eval_step = make_eval_step(
            model,
            eval_text_features=stage_ctx.text_banks["test"] if stage_ctx else None,
            eval_logit_scale=stage_ctx.logit_scale if stage_ctx else 100.0,
            eval_layer_id=args.eval_layer_id,
        )
    ap = evaluate(
        eval_step, state, loader, ctx["real_test_config"], mesh=mesh,
        dataset_name=args.dataset_name,
    )
    metrics = ap.compute_metrics()
    msg = ap.metrics_to_str(metrics)
    print(msg)
    if args.log_file:
        with open(args.log_file, "a") as f:
            f.write(msg + "\n")
    return metrics


def run_mode(args, ctx):
    """Secondary entry modes (reference main.py:625-961)."""
    import jax

    from coda_neurips2023_tpu import modes
    from coda_neurips2023_tpu.datasets.loader import make_loader
    from coda_neurips2023_tpu.engine import create_train_state, make_eval_step
    from coda_neurips2023_tpu.utils.io import restore_params_only

    model, tx = ctx["model"], ctx["tx"]
    loader = make_loader(
        ctx["datasets"]["test"],
        args.batchsize_per_gpu_test * ctx["mesh"].devices.size,
        shuffle=False,
    )
    sample = next(iter(loader))
    sample_arrays = {k: v for k, v in sample.items() if not isinstance(v, list)}
    state = create_train_state(model, tx, jax.random.PRNGKey(args.seed), sample_arrays)
    if args.test_ckpt:
        state = restore_params_only(args.test_ckpt, state, model_args=args)
    out_dir = args.checkpoint_dir or "outputs/modes"
    stage_ctx = ctx.get("stage_ctx")

    if args.show_only:
        return modes.show_boxes(
            model, state, loader, args.show_dir or os.path.join(out_dir, "show"),
            after_nms=args.if_after_nms,
        )
    if args.show_box_points:
        return modes.save_box_points(
            model, state, loader, args.show_dir or os.path.join(out_dir, "box_points")
        )
    if args.save_novel_only or args.save_novel_with_class_only:
        return modes.save_novel_boxes(
            model, state, loader, stage_ctx, with_class=args.save_novel_with_class_only
        )
    if args.save_seen_feat_only:
        return modes.save_seen_feats(
            model, state, loader, stage_ctx,
            args.save_seen_dir or os.path.join(out_dir, "seen_feats"),
        )
    if args.crop_only:
        return modes.crop_boxes(
            model, state, loader, stage_ctx,
            args.crop_dir or os.path.join(out_dir, "crops"),
        )
    if args.cal_class_only:
        eval_step = make_eval_step(
            model,
            eval_text_features=stage_ctx.text_banks["test"] if stage_ctx else None,
            eval_logit_scale=stage_ctx.logit_scale if stage_ctx else 100.0,
            eval_layer_id=args.eval_layer_id,
        )
        confusion = modes.calculate_class_confusion(
            eval_step, state, loader, args.test_num_semcls
        )
        print("class confusion (rows GT, cols pred):")
        print(confusion)
        return confusion
    raise ValueError("no mode selected")


# Flags accepted for reference surface parity whose behavior lives only in
# the reference's 35 UNWIRED model variants / alternative pseudo-label
# strategies (reference main.py:90-110, model_3detr.py variant zoo; none of
# the six shipped scripts set them).  Setting one to a non-default value is a
# request for behavior this framework does not implement -- error loudly
# instead of silently ignoring (round-1 verdict item 10).
_INERT_COMPAT_FLAGS = (
    "cross_enc_dim", "cross_num_layers", "cross_heads", "cross_enc_nlayers",
    "cross_enc_ffn_dim", "cross_enc_dropout", "cross_enc_nhead",
    "every_number", "pooling_methods", "cross_enc_activation",
    "enc_pos_embed", "trans_layer_numbers", "trans_head_numbers",
    "if_add_norm", "if_concat_transformer",
    "if_detach_the_guidence_attention", "if_with_larger_embedding",
    "if_adopt_region_embed", "if_adopt_2d_box_iou_supervision",
    "box2d_iou_thres", "box2d_gt_score_thres", "iou_match_thres",
    "if_distill_also_match", "conclusion_thres", "clip_with_objectness",
    "if_clip_trainable", "if_clip_text_only_seen",
    "if_with_clip_embed", "if_with_fake_classes",
    "online_nms_update_novel_label", "online_nms_update_accumulate_novel_label",
    "online_nms_update_novel_label_for_objectness",
    "online_nms_update_novel_label_for_objectness_with_max_number",
    "online_nms_update_novel_label_for_clip_driven_objectness",
    "online_nms_update_save_novel_label",
    "online_nms_update_save_novel_label_with_prob",
    "online_nms_update_save_novel_label_clip_driven",
    "online_nms_update_save_novel_label_clip_driven_with_cate_confidence_2d_box",
    "online_nms_update_save_novel_label_clip_driven_with_cate_confidence_iou_match_weakly",
    "online_nms_update_max_num_epoch", "if_online_keep_max_box_number",
    "repeat_time", "online_nms_update_accumulate_epoch",
    # declared but never read even by the reference (its learned-prompt text
    # path lives in CLIP/clip/model.py:1084 and is driven by unwired models;
    # ours: models/clip.py encode_text_with_prompt_embedding)
    "former_prompt_len", "later_prompt_len", "prompt_embedding_dir",
    # accepted by the reference parser but explicitly EXCLUDED from its
    # loss-weight application loop (reference criterion.py:1136,1152) --
    # setting them changes nothing there either
    "loss_3d_2d_region_embed_weight", "loss_contrast_3dto2d_text_weight",
)


def reject_inert_flags(parser, args):
    """Raise NotImplementedError for non-default values of compat-only flags."""
    changed = [
        name
        for name in _INERT_COMPAT_FLAGS
        if getattr(args, name) != parser.get_default(name)
    ]
    if changed:
        raise NotImplementedError(
            "flag(s) %s belong to unwired reference model variants / "
            "pseudo-label strategies (reference main.py:90-110); this "
            "framework implements the behavior of the six shipped configs. "
            "Remove the flag(s) or file the variant as a feature."
            % ", ".join("--" + c for c in changed)
        )


def main(args=None):
    parser = make_args_parser()
    args = parser.parse_args(args)
    reject_inert_flags(parser, args)
    if args.minitest_only:
        # the reference accepts this flag but its "minitest" split is
        # commented out of build_dataset (/root/reference/datasets/
        # __init__.py:85-93 + main.py:1003-1004 would KeyError); error loudly
        # instead of silently ignoring
        raise NotImplementedError(
            "--minitest_only: the reference's minitest split is not wired "
            "(its build_dataset never creates it); use --test_only"
        )
    if (
        args.model_name == "3detrmulticlasshead"
        and not args.if_with_clip
        and args.test_num_semcls > 2
    ):
        # the baseline head emits 1+1-way probs; real_test eval against a
        # multi-class config needs the CLIP zero-shot path (reference
        # clip_to_class_training, model_3detr.py:2810) or a 1-class config
        print(
            "WARNING: 3detrmulticlasshead without --if_with_clip cannot be "
            "evaluated against a %d-class real_test config (1-way sem probs); "
            "pass --if_with_clip or --test_num_semcls 1" % args.test_num_semcls
        )
    ctx = build_everything(args)
    try:
        if (
            args.show_only
            or args.show_box_points
            or args.save_novel_only
            or args.save_novel_with_class_only
            or args.save_seen_feat_only
            or args.crop_only
            or args.cal_class_only
        ):
            return run_mode(args, ctx)
        if args.test_only:
            return test_model(args, ctx)
        return do_train(args, ctx)
    finally:
        # drain async checkpoint commits HERE, not from the atexit hook:
        # during interpreter shutdown orbax's commit coroutine can no longer
        # schedule executor work ("cannot schedule new futures after
        # shutdown" observed at the end of an otherwise-green CLI run)
        from coda_neurips2023_tpu.utils.io import wait_for_pending_saves

        wait_for_pending_saves()


if __name__ == "__main__":
    main()
