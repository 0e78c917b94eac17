"""Camera calibration + 3D->2D projection (device-side).

Re-implementation of the SUN RGB-D / ScanNet calibration math
(/root/reference/datasets/sunrgbd_utils.py:69-204, 611-636;
/root/reference/datasets/scannet_utils.py:81, 650):

  upright-depth -> camera:  flip_axis_to_camera(Rtilt^T @ pc)
  camera -> image:          uv_h = pc_cam @ K^T;  u,v = uv_h[:2] / depth

plus the crop-rect construction + un-augmentation used by the CLIP
distillation path (model_3detr.py:902-1210): predicted corners are mapped
back through the inverse of the point-cloud augmentation (scale, rotation,
YZ-plane flip), projected with the ORIGINAL calibration, clipped to the
original image size, shifted by the white-padding offsets, and mirrored when
the image was flipped.
"""

from __future__ import annotations

import jax.numpy as jnp

from coda_neurips2023_tpu.ops.box_ops import flip_axis_to_camera


def project_upright_depth_to_image(pc, k_mat, rtilt):
    """pc: (..., N, 3) upright-depth points; k_mat/rtilt: (..., 3, 3).

    Returns (uv (..., N, 2), depth (..., N)).  Matches
    project_3dpoint_to_2dpoint_corners_tensor (sunrgbd_utils.py:611-636).
    """
    pc_cam = jnp.einsum("...ij,...nj->...ni", jnp.swapaxes(rtilt, -1, -2), pc)
    pc_cam = flip_axis_to_camera(pc_cam)
    uvh = jnp.einsum("...ni,...ji->...nj", pc_cam, k_mat)
    depth = uvh[..., 2]
    uv = uvh[..., :2] / (depth[..., None] + 1e-32)
    return uv, depth


def project_world_to_image_scannet(pc, k_mat, pose):
    """ScanNet projection (scannet_utils.py:649-689): world -> camera via the
    inverse of the 4x4 camera-to-world pose, then the 3x3 block of the 4x4
    color intrinsics. pc: (..., N, 3); k_mat/pose: (..., 4, 4)."""
    inv_pose = jnp.linalg.inv(pose)
    ones = jnp.ones(pc.shape[:-1] + (1,), pc.dtype)
    pc_h = jnp.concatenate([pc, ones], axis=-1)
    pc_cam = jnp.einsum("...ij,...nj->...ni", inv_pose, pc_h)[..., :3]
    uvh = jnp.einsum("...ij,...nj->...ni", k_mat[..., :3, :3], pc_cam)
    depth = uvh[..., 2]
    uv = uvh[..., :2] / (depth[..., None] + 1e-32)
    return uv, depth


def unaugment_corners(corners_xyz, scale_array, rot_array, flip_array, zx_flip_array=None):
    """Invert the point-cloud augmentation on predicted corners
    (model_3detr.py:919-927).

    corners_xyz: (B, Q, 8, 3); scale_array (B, 3); rot_array (B, 3, 3);
    flip_array (B,); zx_flip_array (B,) or None.
    """
    out = corners_xyz * scale_array[:, None, None, :]
    out = jnp.einsum("bqki,bij->bqkj", out, rot_array)
    if zx_flip_array is not None:
        out = out.at[..., 1].multiply(zx_flip_array[:, None, None])
    out = out.at[..., 0].multiply(flip_array[:, None, None])
    return out


def corners_to_image_rects(
    corners_xyz,
    k_mat,
    rtilt,
    ori_width,
    ori_height,
    x_offset,
    y_offset,
    image_flip_array,
    flip_length,
):
    """Predicted (un-augmented) corners -> integer 2D crop rects in padded
    image coordinates (model_3detr.py:929-1035).

    Dispatches on the calibration shape: (B, 3, 3) = SUN RGB-D Rtilt/K;
    (B, 4, 4) = ScanNet pose/intrinsics (the datasets return them that way).

    Returns (rects (B, Q, 4) int32 [xmin, ymin, xmax, ymax], min_depth (B, Q)).
    """
    b, q = corners_xyz.shape[:2]
    if k_mat.shape[-1] == 4:
        uv, depth = project_world_to_image_scannet(
            corners_xyz.reshape(b, q * 8, 3), k_mat, rtilt
        )
    else:
        uv, depth = project_upright_depth_to_image(
            corners_xyz.reshape(b, q * 8, 3), k_mat, rtilt
        )
    uv = uv.reshape(b, q, 8, 2)
    depth = depth.reshape(b, q, 8)

    u = jnp.clip(uv[..., 0], 0, ori_width[:, None, None] - 1) + y_offset[:, None, None]
    v = jnp.clip(uv[..., 1], 0, ori_height[:, None, None] - 1) + x_offset[:, None, None]
    # horizontal mirror for flipped images (model_3detr.py:970-974)
    flip = image_flip_array[:, None, None]
    u = u * flip + (1 - flip) * (flip_length[:, None, None] - 1 - u)

    xmin = jnp.min(u, axis=-1).astype(jnp.int32)
    xmax = jnp.max(u, axis=-1).astype(jnp.int32)
    ymin = jnp.min(v, axis=-1).astype(jnp.int32)
    ymax = jnp.max(v, axis=-1).astype(jnp.int32)
    rects = jnp.stack([xmin, ymin, xmax, ymax], axis=-1)
    return rects, jnp.min(depth, axis=-1)
