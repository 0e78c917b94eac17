#!/bin/bash
# Evaluate released/trained checkpoints (reference test_release_models.sh:
# 5 eval runs writing .lst metric logs). Checkpoints are orbax dirs produced
# by this framework, OR reference .pth files passed directly: --test_ckpt
# auto-detects .pth and converts in-process (utils/io.py restore_params_only
# -> utils/torch_convert.py); `python -m coda_neurips2023_tpu.utils.
# torch_convert in.pth out_dir` converts ahead of time.
set -e
run () {  # name dataset ckpt ncls extra...
  local name=$1 dataset=$2 ckpt=$3 ncls=$4; shift 4
  python -m coda_neurips2023_tpu.main --test_only \
    --dataset_name "$dataset" --model_name 3detr_predictedbox_distillation \
    --dataset_root_dir "${DATA_ROOT:?set DATA_ROOT}" \
    --calib_dir "${CALIB_DIR:-}" --image_dir "${IMAGE_DIR:-}" \
    --test_ckpt "$ckpt" --test_num_semcls "$ncls" \
    --enc_dim 256 --dec_dim 512 --nqueries 128 --num_semcls 2 \
    --batchsize_per_gpu_test 32 --if_use_v1 \
    --log_file "outputs/${name}.lst" "$@"
}
run sunrgbd_stage1  sunrgbd_anonymous_aligned_image "${SUNRGBD_STAGE1_CKPT}" 46 --test_range_max 46
run sunrgbd_stage2  sunrgbd_anonymous_aligned_image_with_novel_cate_confi "${SUNRGBD_STAGE2_CKPT}" 46 --test_range_max 46
run sunrgbd_base    sunrgbd_anonymous_aligned_image "${SUNRGBD_BASE_CKPT}" 46 --test_range_max 46 --if_with_clip
run scannet_stage1  scannet_anonymous_aligned_image "${SCANNET_STAGE1_CKPT}" 60 --test_range_max 60
run scannet_stage2  scannet_anonymous_aligned_image_with_novel_cate_confi "${SCANNET_STAGE2_CKPT}" 60 --test_range_max 60
