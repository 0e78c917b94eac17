#!/bin/bash
# Data preparation: this framework consumes the SAME on-disk artifacts as the
# reference (sunrgbd_pc_bbox_votes_50k_v1_OBB_aligned_{train,val}/*_pc.npz +
# *_bbox.npy, calib/*.txt, image/*.jpg; scannet *_pc.npy + *_bbox.npy +
# pose/intrinsic dirs). Produce them with the reference's own pipeline
# (CoDA repo data_preparation.sh / their SUN RGB-D + ScanNet extraction
# MATLAB/python tools), then point --dataset_root_dir/--calib_dir/--image_dir
# here. Class-vocabulary .npy assets go in --asset_dir; the CLIP ViT-B/16
# checkpoint path goes in --clip_model_path; the BPE vocab in --clip_bpe_path.
echo "See comments: reuse the reference data-preparation outputs verbatim."
