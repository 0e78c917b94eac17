#!/bin/bash
DATA_ROOT=${DATA_ROOT:-Data/scannet/scannet_frames}
python -m coda_neurips2023_tpu.main --dataset_name scannet_anonymous_aligned_image \
--model_name 3detr_predictedbox_distillation \
--dataset_root_dir "$DATA_ROOT" \
--clip_model_path "${CLIP_CKPT:-./CLIP/pretrain_models/ViT-B-16.pt}" \
--if_input_image --if_image_augment True \
--enc_dim 256 --dec_dim 512 --num_semcls 2 \
--train_range_min 0 --train_range_max 10 --test_range_min 0 --test_range_max 60 \
--max_epoch 1080 --ngpus 8 --nqueries 128 \
--base_lr 1.4142e-4 --warm_lr_epochs 18 \
--eval_every_epoch 10000000000 --batchsize_per_gpu 8 \
--matcher_giou_cost 3 --matcher_cls_cost 1 --matcher_center_cost 5 --matcher_objectness_cost 5 \
--loss_giou_weight 0 --loss_no_object_weight 0.05 --loss_no_object_contrast_weight 0.05 \
--loss_predicted_region_embed_l1_weight 1 \
--loss_sem_cls_softmax_skip_none_gt_sample_weight 1 \
--save_separate_checkpoint_every_epoch 90 \
--checkpoint_dir outputs/coda_scannet_stage1 \
--if_clip_more_prompts --real_eval_every_epoch 90 --test_num_semcls 60
