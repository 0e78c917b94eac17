#!/bin/bash
# Visualize predictions on a few scans (reference run_samples.sh --show_only).
python -m coda_neurips2023_tpu.main --show_only \
  --dataset_name "${DATASET:-sunrgbd_anonymous_aligned_image}" \
  --model_name 3detr_predictedbox_distillation \
  --dataset_root_dir "${DATA_ROOT:?set DATA_ROOT}" \
  --calib_dir "${CALIB_DIR:-}" --image_dir "${IMAGE_DIR:-}" \
  --test_ckpt "${CKPT:?set CKPT}" \
  --enc_dim 256 --dec_dim 512 --nqueries 128 --num_semcls 2 \
  --batchsize_per_gpu_test 8 --checkpoint_dir outputs/samples
