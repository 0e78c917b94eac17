"""3D box parametrizations, angle binning, and point normalization.

JAX re-implementations of the reference geometry helpers:
  * corner parametrizations: /root/reference/utils/box_util.py:279-523
    (get_3d_box_batch_tensor / _xyz variants, roty/rotz batches,
    flip_axis_to_camera);
  * angle binning: dataset-config angle2class/class2angle
    (/root/reference/datasets/sunrgbd_anonymous_aligned_image_with_novel_cate_confi.py:226-266);
  * shift_scale_points / scale_points: /root/reference/utils/pc_util.py:38-75.

All functions are pure, static-shape, and jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def roty_batch(angle: jnp.ndarray) -> jnp.ndarray:
    """(..., ) -> (..., 3, 3) rotation about +Y (box_util.py roty_batch)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    rows = jnp.stack(
        [
            jnp.stack([c, zeros, s], axis=-1),
            jnp.stack([zeros, ones, zeros], axis=-1),
            jnp.stack([-s, zeros, c], axis=-1),
        ],
        axis=-2,
    )
    return rows


def rotz_batch(angle: jnp.ndarray) -> jnp.ndarray:
    """(..., ) -> (..., 3, 3) rotation about +Z (box_util.py rotz_tensor_batch)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    rows = jnp.stack(
        [
            jnp.stack([c, -s, zeros], axis=-1),
            jnp.stack([s, c, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return rows


def flip_axis_to_camera(pc: jnp.ndarray) -> jnp.ndarray:
    """Depth (X right, Y forward, Z up) -> camera (X right, Y down, Z forward).
    cam X,Y,Z = depth X, -Z, Y  (box_util.py flip_axis_to_camera_np)."""
    return jnp.stack([pc[..., 0], -pc[..., 2], pc[..., 1]], axis=-1)


def flip_axis_to_depth(pc: jnp.ndarray) -> jnp.ndarray:
    """Inverse of flip_axis_to_camera: depth X,Y,Z = cam X, Z, -Y."""
    return jnp.stack([pc[..., 0], pc[..., 2], -pc[..., 1]], axis=-1)


def get_3d_box_batch(box_size: jnp.ndarray, angle: jnp.ndarray, center: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame corners (box_util.py get_3d_box_batch_tensor).

    box_size (..., 3) = (l, w, h); angle (...,); center (..., 3) camera frame.
    Returns (..., 8, 3).  Corner order: indices 0-3 top face (+h/2),
    4-7 bottom face, with x = +-l/2, z = +-w/2 in the pattern
    [(+,+),(+,-),(-,-),(-,+)] per face, rotated by roty(angle).
    """
    l = box_size[..., 0:1] / 2
    w = box_size[..., 1:2] / 2
    h = box_size[..., 2:3] / 2
    x = jnp.concatenate([l, l, -l, -l, l, l, -l, -l], axis=-1)
    y = jnp.concatenate([h, h, h, h, -h, -h, -h, -h], axis=-1)
    z = jnp.concatenate([w, -w, -w, w, w, -w, -w, w], axis=-1)
    corners = jnp.stack([x, y, z], axis=-1)  # (..., 8, 3)
    r = roty_batch(angle)  # (..., 3, 3)
    corners = jnp.einsum("...ij,...kj->...ik", corners, r)
    return corners + center[..., None, :]


def get_3d_box_batch_xyz(box_size: jnp.ndarray, angle: jnp.ndarray, center: jnp.ndarray) -> jnp.ndarray:
    """Upright/depth-frame corners (box_util.py get_3d_box_batch_tensor_xyz):
    rotz(-angle), size halved, same 8-corner ordering in (x=l, y=w, z=h)."""
    l = box_size[..., 0:1] / 2
    w = box_size[..., 1:2] / 2
    h = box_size[..., 2:3] / 2
    x = jnp.concatenate([-l, l, l, -l, -l, l, l, -l], axis=-1)
    y = jnp.concatenate([w, w, -w, -w, w, w, -w, -w], axis=-1)
    z = jnp.concatenate([h, h, h, h, -h, -h, -h, -h], axis=-1)
    corners = jnp.stack([x, y, z], axis=-1)
    r = rotz_batch(-angle)
    corners = jnp.einsum("...ij,...kj->...ik", corners, r)
    return corners + center[..., None, :]


def my_compute_box_3d(center: jnp.ndarray, size: jnp.ndarray, heading_angle: jnp.ndarray) -> jnp.ndarray:
    """Dataset-config my_compute_box_3d (corners with FULL size as half-extent;
    the reference passes size/2 has already been applied by callers).  Batched."""
    l = size[..., 0:1]
    w = size[..., 1:2]
    h = size[..., 2:3]
    x = jnp.concatenate([-l, l, l, -l, -l, l, l, -l], axis=-1)
    y = jnp.concatenate([w, w, -w, -w, w, w, -w, -w], axis=-1)
    z = jnp.concatenate([h, h, h, h, -h, -h, -h, -h], axis=-1)
    corners = jnp.stack([x, y, z], axis=-1)
    r = rotz_batch(-heading_angle)
    corners = jnp.einsum("...ij,...kj->...ik", corners, r)
    return corners + center[..., None, :]


def angle2class(angle: jnp.ndarray, num_angle_bin: int):
    """Continuous angle -> (bin class, residual). Vectorized version of the
    dataset-config angle2class."""
    two_pi = 2 * np.pi
    angle = angle % two_pi
    angle_per_class = two_pi / float(num_angle_bin)
    shifted = (angle + angle_per_class / 2) % two_pi
    class_id = jnp.floor(shifted / angle_per_class).astype(jnp.int32)
    residual = shifted - (class_id.astype(angle.dtype) * angle_per_class + angle_per_class / 2)
    return class_id, residual


def class2angle(pred_cls: jnp.ndarray, residual: jnp.ndarray, num_angle_bin: int) -> jnp.ndarray:
    """Inverse of angle2class; wraps to (-pi, pi] (class2angle_batch)."""
    angle_per_class = 2 * np.pi / float(num_angle_bin)
    angle = pred_cls.astype(residual.dtype) * angle_per_class + residual
    return jnp.where(angle > np.pi, angle - 2 * np.pi, angle)


def shift_scale_points(pred_xyz: jnp.ndarray, src_range, dst_range=None) -> jnp.ndarray:
    """Map points from src [min,max] box to dst (default unit cube).
    pred_xyz: (B, N, 3); src_range/dst_range: pair of (B, 3) arrays.
    (pc_util.py:38-67)."""
    if dst_range is None:
        dst_range = (jnp.zeros_like(src_range[0]), jnp.ones_like(src_range[0]))
    src_min, src_max = src_range
    dst_min, dst_max = dst_range
    src_diff = (src_max - src_min)[:, None, :]
    dst_diff = (dst_max - dst_min)[:, None, :]
    return (pred_xyz - src_min[:, None, :]) * dst_diff / src_diff + dst_min[:, None, :]


def scale_points(pred_xyz: jnp.ndarray, mult_factor: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 3) * (B, 3) broadcast scale (pc_util.py:69-73)."""
    return pred_xyz * mult_factor[:, None, :]


# ---------------------------------------------------------------- numpy twins
# Host-side (input pipeline / AP path) versions of the corner math.  The
# dataset __getitem__ MUST NOT touch jax: under the axon TPU tunnel every jnp
# op is a device roundtrip, and process-fork data workers would re-initialize
# a jax backend in the child (deadlock).  Parity with the jnp versions is
# asserted in tests/test_ops.py::test_numpy_twins_match_jnp.

def _roty_batch_np(t):
    c, s = np.cos(t), np.sin(t)
    out = np.zeros(t.shape + (3, 3), np.float32)
    out[..., 0, 0] = c
    out[..., 0, 2] = s
    out[..., 1, 1] = 1
    out[..., 2, 0] = -s
    out[..., 2, 2] = c
    return out


def _rotz_batch_np(t):
    c, s = np.cos(t), np.sin(t)
    out = np.zeros(t.shape + (3, 3), np.float32)
    out[..., 0, 0] = c
    out[..., 0, 1] = -s
    out[..., 1, 0] = s
    out[..., 1, 1] = c
    out[..., 2, 2] = 1
    return out


def flip_axis_to_camera_np(pc: np.ndarray) -> np.ndarray:
    return np.stack([pc[..., 0], -pc[..., 2], pc[..., 1]], axis=-1)


def flip_axis_to_depth_np(pc: np.ndarray) -> np.ndarray:
    return np.stack([pc[..., 0], pc[..., 2], -pc[..., 1]], axis=-1)


def get_3d_box_batch_np(box_size, angle, center) -> np.ndarray:
    box_size = np.asarray(box_size, np.float32)
    angle = np.asarray(angle, np.float32)
    center = np.asarray(center, np.float32)
    l = box_size[..., 0:1] / 2
    w = box_size[..., 1:2] / 2
    h = box_size[..., 2:3] / 2
    x = np.concatenate([l, l, -l, -l, l, l, -l, -l], axis=-1)
    y = np.concatenate([h, h, h, h, -h, -h, -h, -h], axis=-1)
    z = np.concatenate([w, -w, -w, w, w, -w, -w, w], axis=-1)
    corners = np.stack([x, y, z], axis=-1)
    r = _roty_batch_np(angle)
    corners = np.einsum("...ij,...kj->...ik", corners, r)
    return corners + center[..., None, :]


def get_3d_box_batch_xyz_np(box_size, angle, center) -> np.ndarray:
    box_size = np.asarray(box_size, np.float32)
    angle = np.asarray(angle, np.float32)
    center = np.asarray(center, np.float32)
    l = box_size[..., 0:1] / 2
    w = box_size[..., 1:2] / 2
    h = box_size[..., 2:3] / 2
    x = np.concatenate([-l, l, l, -l, -l, l, l, -l], axis=-1)
    y = np.concatenate([w, w, -w, -w, w, w, -w, -w], axis=-1)
    z = np.concatenate([h, h, h, h, -h, -h, -h, -h], axis=-1)
    corners = np.stack([x, y, z], axis=-1)
    r = _rotz_batch_np(-angle)
    corners = np.einsum("...ij,...kj->...ik", corners, r)
    return corners + center[..., None, :]


def my_compute_box_3d_np(center, size, heading_angle) -> np.ndarray:
    center = np.asarray(center, np.float32)
    size = np.asarray(size, np.float32)
    heading_angle = np.asarray(heading_angle, np.float32)
    l = size[..., 0:1]
    w = size[..., 1:2]
    h = size[..., 2:3]
    x = np.concatenate([-l, l, l, -l, -l, l, l, -l], axis=-1)
    y = np.concatenate([w, w, -w, -w, w, w, -w, -w], axis=-1)
    z = np.concatenate([h, h, h, h, -h, -h, -h, -h], axis=-1)
    corners = np.stack([x, y, z], axis=-1)
    r = _rotz_batch_np(-heading_angle)
    corners = np.einsum("...ij,...kj->...ik", corners, r)
    return corners + center[..., None, :]


def angle2class_np(angle, num_angle_bin: int):
    angle = np.asarray(angle, np.float32)
    two_pi = 2 * np.pi
    angle = angle % two_pi
    angle_per_class = two_pi / float(num_angle_bin)
    shifted = (angle + angle_per_class / 2) % two_pi
    class_id = np.floor(shifted / angle_per_class).astype(np.int32)
    residual = shifted - (class_id.astype(angle.dtype) * angle_per_class + angle_per_class / 2)
    return class_id, residual
