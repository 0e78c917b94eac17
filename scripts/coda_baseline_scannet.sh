#!/bin/bash
DATA_ROOT=${DATA_ROOT:-Data/scannet/scannet_frames}
python -m coda_neurips2023_tpu.main --dataset_name scannet_anonymous_aligned_image \
--model_name 3detrmulticlasshead \
--dataset_root_dir "$DATA_ROOT" \
--if_input_image --enc_dim 256 --dec_dim 512 \
--train_range_min 0 --train_range_max 10 --test_range_min 0 --test_range_max 60 \
--max_epoch 1080 --ngpus 8 --nqueries 128 --base_lr 1.4142e-4 --warm_lr_epochs 18 \
--eval_every_epoch 100000000000000000 --batchsize_per_gpu 8 \
--matcher_giou_cost 3 --matcher_cls_cost 1 --matcher_center_cost 5 --matcher_objectness_cost 5 \
--loss_giou_weight 0 --loss_no_object_weight 0.05 --loss_sem_cls_weight 0 \
--loss_sem_cls_softmax_weight 0 --loss_sem_cls_softmax_skip_none_gt_sample_weight 1 \
--save_separate_checkpoint_every_epoch 90 \
--checkpoint_dir outputs/coda_baseline_scannet \
--if_with_clip --real_eval_every_epoch 90 --test_num_semcls 60
