"""MLP-head outputs -> 3D boxes.

Re-implementation of BoxProcessor (/root/reference/models/model_3detr.py:56-127):
  * center: query_xyz + offset, then normalized into the scene extent;
  * size: sigmoid-normalized sizes scaled by the scene extent (clamped 1e-1);
  * angle: bin argmax (stop-gradient) + that bin's residual, wrapped > pi;
  * objectness: 1 - softmax(bg); class probs: softmax over foreground bins.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from coda_neurips2023_tpu.ops.box_ops import scale_points, shift_scale_points


class BoxProcessor:
    def __init__(self, dataset_config):
        self.dataset_config = dataset_config

    def compute_predicted_center(self, center_offset, query_xyz, point_cloud_dims):
        center_unnormalized = query_xyz + center_offset
        center_normalized = shift_scale_points(center_unnormalized, point_cloud_dims)
        return center_normalized, center_unnormalized

    def compute_predicted_size(self, size_normalized, point_cloud_dims):
        scene_scale = point_cloud_dims[1] - point_cloud_dims[0]
        scene_scale = jnp.clip(scene_scale, min=1e-1)
        return scale_points(size_normalized, scene_scale)

    def compute_predicted_angle(self, angle_logits, angle_residual):
        if angle_logits.shape[-1] == 1:
            # datasets with no heading angle (ScanNet): zero but keep gradients
            return jnp.clip((angle_logits * 0 + angle_residual * 0)[..., 0], min=0.0)
        num_bin = self.dataset_config.num_angle_bin
        angle_per_cls = 2 * np.pi / num_bin
        pred_cls = jax.lax.stop_gradient(jnp.argmax(angle_logits, axis=-1))
        angle_center = angle_per_cls * pred_cls.astype(angle_residual.dtype)
        residual = jnp.take_along_axis(angle_residual, pred_cls[..., None], axis=-1)[..., 0]
        angle = angle_center + residual
        return jnp.where(angle > np.pi, angle - 2 * np.pi, angle)

    def compute_objectness_and_cls_prob(self, cls_logits):
        cls_prob = jax.nn.softmax(cls_logits, axis=-1)
        return cls_prob[..., :-1], 1.0 - cls_prob[..., -1]

    def box_parametrization_to_corners(self, center_unnorm, size_unnorm, angle):
        return self.dataset_config.box_parametrization_to_corners(
            center_unnorm, size_unnorm, angle
        )

    def box_parametrization_to_corners_xyz(self, center_unnorm, size_unnorm, angle):
        return self.dataset_config.box_parametrization_to_corners_xyz(
            center_unnorm, size_unnorm, angle
        )
