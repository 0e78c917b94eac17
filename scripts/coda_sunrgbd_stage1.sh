#!/bin/bash
# Stage 1: class-agnostic detection + CLIP crop distillation on OV-SUN RGB-D.
# Flag surface identical to the reference scripts/coda_sunrgbd_stage1.sh;
# set DATA_ROOT/CALIB_DIR/IMAGE_DIR/CLIP_CKPT for your data drop.
DATA_ROOT=${DATA_ROOT:-Data/sunrgb_d/sunrgbd_pc_bbox_votes_50k_v1_OBB_aligned}
python -m coda_neurips2023_tpu.main --dataset_name sunrgbd_anonymous_aligned_image \
--model_name 3detr_predictedbox_distillation \
--dataset_root_dir "$DATA_ROOT" --calib_dir "${CALIB_DIR:-Data/sunrgb_d/calib}" \
--image_dir "${IMAGE_DIR:-Data/sunrgb_d/image}" \
--clip_model_path "${CLIP_CKPT:-./CLIP/pretrain_models/ViT-B-16.pt}" \
--if_input_image --if_image_augment True \
--enc_dim 256 --dec_dim 512 --num_semcls 2 \
--train_range_min 0 --train_range_max 10 --test_range_min 0 --test_range_max 46 \
--max_epoch 1080 --ngpus 8 --nqueries 128 \
--base_lr 1.97e-4 --warm_lr_epochs 18 \
--eval_every_epoch 10000000000 --batchsize_per_gpu 8 \
--matcher_giou_cost 3 --matcher_cls_cost 1 --matcher_center_cost 5 --matcher_objectness_cost 5 \
--loss_giou_weight 0 --loss_no_object_weight 0.05 --loss_sem_cls_weight 0 \
--loss_sem_cls_softmax_weight 0 --loss_no_object_contrast_weight 0.05 \
--loss_predicted_region_embed_l1_weight 1 \
--loss_sem_cls_softmax_skip_none_gt_sample_weight 1 \
--save_separate_checkpoint_every_epoch 90 \
--checkpoint_dir outputs/coda_sunrgbd_stage1 \
--if_clip_more_prompts --real_eval_every_epoch 90 --if_use_v1 --test_num_semcls 46
