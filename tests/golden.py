"""Numpy golden models encoding the reference kernels' exact semantics.

Each function is a direct statement of the behavior documented from the
reference CUDA/Cython sources (file:line cited per function); tests compare
the JAX/Pallas ops against these.
"""

import numpy as np


def fps_golden(xyz: np.ndarray, npoint: int) -> np.ndarray:
    """sampling_gpu.cu:71-168: seed index 0; skip |p|^2 <= 1e-3; running
    min-distance; strict-> argmax (first index wins ties)."""
    b, n, _ = xyz.shape
    out = np.zeros((b, npoint), dtype=np.int32)
    for bi in range(b):
        pts = xyz[bi].astype(np.float64)
        mag = np.sum(pts * pts, axis=1)
        valid = mag > 1e-3
        temp = np.full(n, 1e10)
        old = 0
        for j in range(1, npoint):
            d = np.sum((pts - pts[old]) ** 2, axis=1)
            temp = np.minimum(temp, d)
            cand = np.where(valid, temp, -1.0)
            old = int(np.argmax(cand))
            out[bi, j] = old
    return out


def ball_query_golden(radius: float, nsample: int, xyz: np.ndarray, new_xyz: np.ndarray) -> np.ndarray:
    """ball_query_gpu.cu:12-48: first nsample hits in index order, trailing
    slots filled with the first hit; all-zero rows when no hits."""
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    idx = np.zeros((b, m, nsample), dtype=np.int32)
    r2 = radius * radius
    for bi in range(b):
        for j in range(m):
            cnt = 0
            for k in range(n):
                d2 = np.sum((new_xyz[bi, j] - xyz[bi, k]) ** 2)
                if d2 < r2:
                    if cnt == 0:
                        idx[bi, j, :] = k
                    idx[bi, j, cnt] = k
                    cnt += 1
                    if cnt == nsample:
                        break
    return idx


def three_nn_golden(unknown: np.ndarray, known: np.ndarray):
    """interpolate_gpu.cu:12-62."""
    b, n, _ = unknown.shape
    dist2 = np.zeros((b, n, 3), dtype=np.float32)
    idx = np.zeros((b, n, 3), dtype=np.int32)
    for bi in range(b):
        d = np.sum((unknown[bi][:, None, :] - known[bi][None, :, :]) ** 2, axis=-1)
        order = np.argsort(d, axis=1, kind="stable")[:, :3]
        idx[bi] = order
        dist2[bi] = np.take_along_axis(d, order, axis=1)
    return dist2, idx


def polygon_clip_golden(subject: np.ndarray, clip: np.ndarray):
    """box_intersection.pyx:27-71 polygon_clip_unnest (Sutherland-Hodgman,
    strict inside, 1e-32 regularized intersection)."""

    def inside(cp1, cp2, p):
        return (cp2[0] - cp1[0]) * (p[1] - cp1[1]) > (cp2[1] - cp1[1]) * (p[0] - cp1[0])

    def intersection(cp1, cp2, s, e):
        dc = [cp1[0] - cp2[0], cp1[1] - cp2[1]]
        dp = [s[0] - e[0], s[1] - e[1]]
        n1 = cp1[0] * cp2[1] - cp1[1] * cp2[0]
        n2 = s[0] * e[1] - s[1] * e[0]
        n3 = 1.0 / (dc[0] * dp[1] - dc[1] * dp[0] + 1e-32)
        return [(n1 * dp[0] - n2 * dc[0]) * n3, (n1 * dp[1] - n2 * dc[1]) * n3]

    output = [list(subject[i]) for i in range(subject.shape[0])]
    cp1 = clip[-1]
    for cidx in range(len(clip)):
        cp2 = clip[cidx]
        inp = output.copy()
        output = []
        s = inp[-1]
        for e in inp:
            if inside(cp1, cp2, e):
                if not inside(cp1, cp2, s):
                    output.append(intersection(cp1, cp2, s, e))
                output.append(e)
            elif inside(cp1, cp2, s):
                output.append(intersection(cp1, cp2, s, e))
            s = e
        cp1 = cp2
        if len(output) == 0:
            break
    return output


def polygon_area_golden(verts) -> float:
    """box_intersection.pyx:196-199 shoelace."""
    if len(verts) == 0:
        return 0.0
    xs = np.array([v[0] for v in verts], dtype=np.float64)
    ys = np.array([v[1] for v in verts], dtype=np.float64)
    return 0.5 * abs(np.dot(xs, np.roll(ys, 1)) - np.dot(ys, np.roll(xs, 1)))


def giou_golden(corners1: np.ndarray, corners2: np.ndarray, nums_k2: np.ndarray, rotated=True):
    """box_util.py:762-853 generalized_box3d_iou_cython, numpy."""
    eps = 1e-8
    b, k1 = corners1.shape[:2]
    k2 = corners2.shape[1]

    ymax = np.minimum(corners1[:, :, 0, 1][:, :, None], corners2[:, :, 0, 1][:, None, :])
    ymin = np.maximum(corners1[:, :, 4, 1][:, :, None], corners2[:, :, 4, 1][:, None, :])
    height = np.clip(ymax - ymin, 0, None)

    rect1 = corners1[:, :, [3, 2, 1, 0], :][..., [0, 2]]
    rect2 = corners2[:, :, [3, 2, 1, 0], :][..., [0, 2]]
    lt = np.maximum(rect1[:, :, 1][:, :, None, :], rect2[:, :, 1][:, None, :, :])
    rb = np.minimum(rect1[:, :, 3][:, :, None, :], rect2[:, :, 3][:, None, :, :])
    wh = np.clip(rb - lt, 0, None)
    non_rot = wh[..., 0] * wh[..., 1]
    for bi in range(b):
        non_rot[bi, :, nums_k2[bi]:] = 0

    # enclosing volume with the reference's Y-flip
    c1 = corners1.copy(); c1[..., 1] *= -1
    c2 = corners2.copy(); c2[..., 1] *= -1
    al_xmin = np.minimum(c1[..., 0].min(-1)[:, :, None], c2[..., 0].min(-1)[:, None, :])
    al_ymin = np.maximum(c1[..., 1].max(-1)[:, :, None], c2[..., 1].max(-1)[:, None, :])
    al_zmin = np.minimum(c1[..., 2].min(-1)[:, :, None], c2[..., 2].min(-1)[:, None, :])
    al_xmax = np.maximum(c1[..., 0].max(-1)[:, :, None], c2[..., 0].max(-1)[:, None, :])
    al_ymax = np.minimum(c1[..., 1].min(-1)[:, :, None], c2[..., 1].min(-1)[:, None, :])
    al_zmax = np.maximum(c1[..., 2].max(-1)[:, :, None], c2[..., 2].max(-1)[:, None, :])
    enclosing = np.abs(al_xmax - al_xmin) * np.abs(al_ymax - al_ymin) * np.abs(al_zmax - al_zmin)

    def vol(c):
        a = np.sqrt(np.clip(np.sum((c[..., 0, :] - c[..., 1, :]) ** 2, -1), 1e-6, None))
        bb = np.sqrt(np.clip(np.sum((c[..., 1, :] - c[..., 2, :]) ** 2, -1), 1e-6, None))
        cc = np.sqrt(np.clip(np.sum((c[..., 0, :] - c[..., 4, :]) ** 2, -1), 1e-6, None))
        return a * bb * cc

    vols1 = np.clip(vol(corners1), eps, None)
    vols2 = np.clip(vol(corners2), eps, None)
    sum_vols = vols1[:, :, None] + vols2[:, None, :]
    good = (enclosing > 2 * eps) * (sum_vols > 4 * eps)

    inter_areas = np.zeros((b, k1, k2), dtype=np.float64)
    if rotated:
        for bi in range(b):
            for i in range(k1):
                for j in range(min(k2, nums_k2[bi])):
                    if non_rot[bi, i, j] == 0:
                        continue
                    inter = polygon_clip_golden(
                        rect1[bi, i].astype(np.float32), rect2[bi, j].astype(np.float32)
                    )
                    inter_areas[bi, i, j] = polygon_area_golden(inter)
    else:
        inter_areas = non_rot

    inter_vols = inter_areas * height
    union = np.clip(sum_vols - inter_vols, eps, None)
    ious = inter_vols / union
    gious = ious - (1 - union / enclosing)
    gious = gious * good
    for bi in range(b):
        gious[bi, :, nums_k2[bi]:] = 0
    return gious
