"""Rotated generalized 3D IoU, fully on device and differentiable.

Replaces BOTH reference implementations with one vectorized kernel:
  * the Cython Sutherland-Hodgman path used by the matcher
    (/root/reference/utils/box_intersection.pyx:27-116 `polygon_clip_unnest`,
    /root/reference/utils/box_util.py:762-853 `generalized_box3d_iou_cython`)
  * the torch.jit tensor path used when gradients are needed
    (/root/reference/utils/box_util.py:678-759).

Math reproduced exactly:
  * boxes are (.., 8, 3) camera-frame corners (up = -Y); only Z(-axis yaw)
    rotation; height overlap from corners 0 (top) and 4 (bottom);
  * the footprint polygon is corners [3,2,1,0] projected to (x, z), which is
    counter-clockwise; intersection area by clipping one quad against the
    other (Sutherland-Hodgman, strict-inequality `inside`, 1e-32-regularized
    intersection like box_intersection.pyx:18);
  * the "approximate" gate of the Cython path (box_intersection.pyx:187-189):
    pairs whose corner-1/corner-3 axis-aligned overlap is zero keep
    intersection area 0;
  * gIoU = IoU - (1 - union/enclosing_axis_aligned_volume), zeroed for
    malformed boxes and for padded GT columns (k2 >= nums_k2).

Instead of the reference's per-pair Python/Cython loop on the host (a
device->host sync in the middle of the train step), every (proposal, gt) pair
is clipped in parallel with fixed-size (10, 2) vertex buffers and mask
arithmetic -- pure VPU work under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MAX_VERTS = 10  # matches MAX_INTERSECT_POINTS, box_intersection.pyx:125
_EPS = 1e-8
_VOL_EPS = 1e-6


def _prev_ring_pl(verts: jnp.ndarray, count: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """prev_pts[i] = verts[i-1] for i>0, verts[count-1] for i==0 (circular over
    the live prefix).  verts: (V, 2, *B); count: (*B); idx: (V, 1...).
    Roll + one-hot select -- no gathers (TPU scatters/row-gathers serialize)."""
    rolled = jnp.roll(verts, 1, axis=0)
    last_sel = (idx == count[None] - 1).astype(verts.dtype)  # (V, *B)
    last = jnp.sum(verts * last_sel[:, None], axis=0)  # (2, *B)
    return jnp.where((idx == 0)[:, None], last[None], rolled)


def _clip_area_pairs_last(subject: jnp.ndarray, clip: jnp.ndarray) -> jnp.ndarray:
    """Area of intersection of two convex CCW quads, batch-minor layout.

    subject, clip: (4, 2, *B) -- the VERTEX and COORDINATE axes lead and the
    (large) batch axes are minor, so every (V, *B) intermediate packs the TPU
    vector lanes densely.  The natural (..., 10, 2) layout wastes 128/2 resp.
    128/10 of every vreg on lane padding and measured ~5x slower for the
    matcher's 524k-pair batches.  Returns (*B,) areas.

    Vectorized Sutherland-Hodgman with fixed 10-vertex buffers + count masks
    (MAX_INTERSECT_POINTS, box_intersection.pyx:125); emission compaction is
    a one-hot contraction over the (out-slot, in-vertex) matrix -- no scatter.
    """
    bshape = subject.shape[2:]
    v = _MAX_VERTS
    dtype = subject.dtype
    verts = jnp.concatenate(
        [subject, jnp.zeros((v - 4, 2) + bshape, dtype)], axis=0
    )  # (V, 2, *B)
    count = jnp.full(bshape, 4, dtype=jnp.int32)
    idx = jnp.arange(v, dtype=jnp.int32).reshape((v,) + (1,) * len(bshape))

    def inside(cp1, cp2, px, py):
        """Strictly-inside test for edge cp1->cp2 of a CCW polygon
        (box_intersection.pyx:23-25).  cp*: (2, *B); px, py: (V, *B)."""
        return (cp2[0] - cp1[0])[None] * (py - cp1[1][None]) > (
            cp2[1] - cp1[1]
        )[None] * (px - cp1[0][None])

    for edge in range(4):
        cp1 = clip[(edge - 1) % 4]  # (2, *B)
        cp2 = clip[edge]
        ex, ey = verts[:, 0], verts[:, 1]  # (V, *B)
        s_pts = _prev_ring_pl(verts, count, idx)
        sx, sy = s_pts[:, 0], s_pts[:, 1]

        ins_e = inside(cp1, cp2, ex, ey)
        ins_s = inside(cp1, cp2, sx, sy)
        active = idx < count[None]
        has_inter = jnp.logical_and(active, ins_e != ins_s)
        keep_e = jnp.logical_and(active, ins_e)

        # line-line intersection (box_intersection.pyx:13-19, incl. the
        # +1e-32 regularizer).  Exactly-parallel pairs are never selected by
        # has_inter, but 1/0 would poison gradients through the masking
        # `where` (0 * inf): keep the real path bit-identical and give the
        # degenerate path finite values and partials.
        dcx, dcy = cp1[0] - cp2[0], cp1[1] - cp2[1]  # (*B)
        dpx, dpy = sx - ex, sy - ey  # (V, *B)
        n1 = cp1[0] * cp2[1] - cp1[1] * cp2[0]  # (*B)
        n2 = sx * ey - sy * ex  # (V, *B)
        denom = dcx[None] * dpy - dcy[None] * dpx
        safe_denom = jnp.where(denom == 0.0, 1.0, denom)
        n3 = 1.0 / (safe_denom + 1e-32)
        ix = jnp.nan_to_num(
            (n1[None] * dpx - n2 * dcx[None]) * n3, nan=0.0, posinf=1e6, neginf=-1e6
        )
        iy = jnp.nan_to_num(
            (n1[None] * dpy - n2 * dcy[None]) * n3, nan=0.0, posinf=1e6, neginf=-1e6
        )

        # per-vertex emissions: [intersection?][e?] in that order
        firstx = jnp.where(has_inter, ix, ex)
        firsty = jnp.where(has_inter, iy, ey)
        n_emit = has_inter.astype(jnp.int32) + keep_e.astype(jnp.int32)  # (V, *B)
        offset = jnp.cumsum(n_emit, axis=0) - n_emit  # exclusive prefix sum
        pos1 = jnp.where(n_emit >= 1, offset, v)  # v == dropped
        pos2 = jnp.where(n_emit == 2, offset + 1, v)

        # compaction as one-hot contraction: out[s] = sum_i [pos(i)==s]*val_i
        eq1 = (pos1[None] == idx[:, None]).astype(dtype)  # (S, I, *B)
        eq2 = (pos2[None] == idx[:, None]).astype(dtype)
        outx = jnp.sum(eq1 * firstx[None], axis=1) + jnp.sum(eq2 * ex[None], axis=1)
        outy = jnp.sum(eq1 * firsty[None], axis=1) + jnp.sum(eq2 * ey[None], axis=1)
        verts = jnp.stack([outx, outy], axis=1)  # (V, 2, *B)
        count = jnp.sum(n_emit, axis=0)

    # shoelace with circular previous vertex over the live count
    prev_pts = _prev_ring_pl(verts, count, idx)
    live = (idx < count[None]).astype(dtype)
    contrib = (
        verts[:, 0] * prev_pts[:, 1] - verts[:, 1] * prev_pts[:, 0]
    ) * live
    return 0.5 * jnp.abs(jnp.sum(contrib, axis=0))


def clip_polygon_area(subject: jnp.ndarray, clip: jnp.ndarray) -> jnp.ndarray:
    """Area of intersection of two convex CCW quads.

    subject, clip: (..., 4, 2). Returns (...,) areas.  Thin wrapper moving the
    vertex/coordinate axes to the front for the lane-dense kernel.
    """
    return _clip_area_pairs_last(
        jnp.moveaxis(subject, (-2, -1), (0, 1)), jnp.moveaxis(clip, (-2, -1), (0, 1))
    )


def box3d_vol(corners: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, 3) -> (...,) volume from edge lengths (box_util.py:652-672)."""
    a = jnp.sqrt(
        jnp.clip(jnp.sum((corners[..., 0, :] - corners[..., 1, :]) ** 2, -1), min=_VOL_EPS)
    )
    b = jnp.sqrt(
        jnp.clip(jnp.sum((corners[..., 1, :] - corners[..., 2, :]) ** 2, -1), min=_VOL_EPS)
    )
    c = jnp.sqrt(
        jnp.clip(jnp.sum((corners[..., 0, :] - corners[..., 4, :]) ** 2, -1), min=_VOL_EPS)
    )
    return a * b * c


def enclosing_box3d_vol(corners1: jnp.ndarray, corners2: jnp.ndarray) -> jnp.ndarray:
    """(B,K1,8,3),(B,K2,8,3) -> (B,K1,K2) axis-aligned enclosing volume
    (box_util.py:675-723, including its Y-flip and min/max quirks)."""
    c1 = corners1.at[..., 1].multiply(-1.0)
    c2 = corners2.at[..., 1].multiply(-1.0)

    def pairwise(f1, f2, op):
        return op(f1[:, :, None], f2[:, None, :])

    x1min = jnp.min(c1[..., 0], -1); x2min = jnp.min(c2[..., 0], -1)
    x1max = jnp.max(c1[..., 0], -1); x2max = jnp.max(c2[..., 0], -1)
    y1min = jnp.min(c1[..., 1], -1); y2min = jnp.min(c2[..., 1], -1)
    y1max = jnp.max(c1[..., 1], -1); y2max = jnp.max(c2[..., 1], -1)
    z1min = jnp.min(c1[..., 2], -1); z2min = jnp.min(c2[..., 2], -1)
    z1max = jnp.max(c1[..., 2], -1); z2max = jnp.max(c2[..., 2], -1)

    al_xmin = pairwise(x1min, x2min, jnp.minimum)
    al_ymin = pairwise(y1max, y2max, jnp.maximum)
    al_zmin = pairwise(z1min, z2min, jnp.minimum)
    al_xmax = pairwise(x1max, x2max, jnp.maximum)
    al_ymax = pairwise(y1min, y2min, jnp.minimum)
    al_zmax = pairwise(z1max, z2max, jnp.maximum)
    return (
        jnp.abs(al_xmax - al_xmin)
        * jnp.abs(al_ymax - al_ymin)
        * jnp.abs(al_zmax - al_zmin)
    )


def generalized_box3d_iou(
    corners1: jnp.ndarray,
    corners2: jnp.ndarray,
    nums_k2: jnp.ndarray | None = None,
    rotated_boxes: bool = True,
    return_inter_vols_only: bool = False,
) -> jnp.ndarray:
    """corners1 (B,K1,8,3) x corners2 (B,K2,8,3) -> gIoU (B,K1,K2).

    One implementation serving both the matcher (no-grad) and the gIoU loss
    (differentiable), unlike the reference's Cython/torch.jit split.
    """
    corners1 = corners1.astype(jnp.float32)
    corners2 = corners2.astype(jnp.float32)
    b, k1 = corners1.shape[:2]
    k2 = corners2.shape[1]

    # height overlap: up is -Y; corner 0 = top, corner 4 = bottom
    ymax = jnp.minimum(corners1[:, :, 0, 1][:, :, None], corners2[:, :, 0, 1][:, None, :])
    ymin = jnp.maximum(corners1[:, :, 4, 1][:, :, None], corners2[:, :, 4, 1][:, None, :])
    height = jnp.clip(ymax - ymin, min=0.0)

    # CCW footprint: corners [3,2,1,0] projected onto (x, z)
    rect1 = corners1[:, :, (3, 2, 1, 0), :][..., (0, 2)]
    rect2 = corners2[:, :, (3, 2, 1, 0), :][..., (0, 2)]

    lt = jnp.maximum(rect1[:, :, 1][:, :, None, :], rect2[:, :, 1][:, None, :, :])
    rb = jnp.minimum(rect1[:, :, 3][:, :, None, :], rect2[:, :, 3][:, None, :, :])
    wh = jnp.clip(rb - lt, min=0.0)
    non_rot_inter = wh[..., 0] * wh[..., 1]  # (B, K1, K2)

    if nums_k2 is not None:
        col_live = jnp.arange(k2)[None, :] < nums_k2[:, None]  # (B, K2)
        non_rot_inter = non_rot_inter * col_live[:, None, :]

    enclosing_vols = enclosing_box3d_vol(corners1, corners2)
    vols1 = jnp.clip(box3d_vol(corners1), min=_EPS)
    vols2 = jnp.clip(box3d_vol(corners2), min=_EPS)
    sum_vols = vols1[:, :, None] + vols2[:, None, :]
    good_boxes = jnp.logical_and(enclosing_vols > 2 * _EPS, sum_vols > 4 * _EPS)

    if rotated_boxes:
        # pairs-last layout: (4, 2, B, K1, K2) so the 524k-pair batch packs
        # the vector lanes (see _clip_area_pairs_last)
        r1 = jnp.transpose(rect1, (2, 3, 0, 1))  # (4, 2, B, K1)
        r2 = jnp.transpose(rect2, (2, 3, 0, 1))  # (4, 2, B, K2)
        sub = jnp.broadcast_to(r1[..., None], (4, 2, b, k1, k2))
        clp = jnp.broadcast_to(r2[..., None, :], (4, 2, b, k1, k2))
        areas = _clip_area_pairs_last(sub, clp)  # (B, K1, K2)
        # approximate gate of the Cython path: zero where the AA overlap is zero
        inter_areas = jnp.where(non_rot_inter > 0, areas, 0.0)
    else:
        inter_areas = non_rot_inter

    inter_vols = inter_areas * height
    if return_inter_vols_only:
        return inter_vols

    union_vols = jnp.clip(sum_vols - inter_vols, min=_EPS)
    ious = inter_vols / union_vols
    gious = ious - (1.0 - union_vols / enclosing_vols)
    gious = gious * good_boxes
    if nums_k2 is not None:
        gious = gious * col_live[:, None, :]
    return gious
