"""Shared helpers for stage-related tests."""

import types

from coda_neurips2023_tpu.models.clip import CLIP


def stage_args(**over):
    base = dict(
        base_lr=5e-4, warm_lr=1e-6, warm_lr_epochs=2, final_lr=1e-6,
        lr_scheduler="cosine", weight_decay=0.1, filter_biases_wd=False,
        clip_gradient=0.1, max_epoch=4,
        matcher_cls_cost=1, matcher_giou_cost=3, matcher_center_cost=5,
        matcher_objectness_cost=5,
        loss_giou_weight=0.0,
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
        if_clip_weak_labels=False, distillation_box_num=4,
        clip_model_path=None, clip_bpe_path=None,
        online_nms_update_save_novel_label_clip_driven_with_cate_confidence=False,
        online_nms_update_save_epoch=50,
        save_objectness=0.3, clip_driven_keep_thres=0.3,
        if_accumulate_former_pseudo_labels=False,
        if_keep_box=False, keep_objectness=0.5, begin_keep_epoch=540,
    )
    base.update(over)
    return types.SimpleNamespace(**base)


def tiny_clip():
    return CLIP(
        embed_dim=512,
        image_resolution=16,
        vision_patch_size=8,
        vision_width=64,
        vision_layers=1,
        text_width=32,
        text_layers=1,
        text_heads=2,
        context_length=8,
        vocab_size=64,
    )
