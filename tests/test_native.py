"""Native C++ library vs python goldens (independent oracle cross-check)."""

import numpy as np
import pytest

from golden import ball_query_golden, fps_golden, polygon_area_golden, polygon_clip_golden

from coda_neurips2023_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def test_fps_matches_golden():
    rng = np.random.default_rng(0)
    xyz = (rng.standard_normal((3, 257, 3)) * 3).astype(np.float32)
    np.testing.assert_array_equal(native.fps(xyz, 33), fps_golden(xyz, 33))


def test_ball_query_matches_golden():
    rng = np.random.default_rng(1)
    xyz = rng.standard_normal((2, 128, 3)).astype(np.float32)
    new_xyz = xyz[:, :32].copy()
    np.testing.assert_array_equal(
        native.ball_query(0.8, 8, xyz, new_xyz), ball_query_golden(0.8, 8, xyz, new_xyz)
    )


def test_clip_area_matches_golden():
    rng = np.random.default_rng(2)
    for _ in range(30):
        def quad(c, s, a):
            base = np.array([[1, 1], [-1, 1], [-1, -1], [1, -1]], np.float32) * s / 2
            rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]], np.float32)
            return base @ rot.T + c

        q1 = quad(rng.uniform(-1, 1, 2).astype(np.float32), rng.uniform(0.3, 1.5), rng.uniform(-3, 3))
        q2 = quad(rng.uniform(-1, 1, 2).astype(np.float32), rng.uniform(0.3, 1.5), rng.uniform(-3, 3))
        got = native.clip_area(q1, q2)
        want = polygon_area_golden(polygon_clip_golden(q1, q2))
        assert got == pytest.approx(want, rel=1e-4, abs=1e-6)


def test_box3d_iou_eval_matches_python():
    import jax.numpy as jnp

    from coda_neurips2023_tpu.ops import box_ops
    from coda_neurips2023_tpu.utils.eval_det import box3d_iou

    rng = np.random.default_rng(4)
    centers = rng.uniform(-2, 2, (6, 3)).astype(np.float32)
    sizes = rng.uniform(0.3, 1.5, (6, 3)).astype(np.float32)
    angles = rng.uniform(-np.pi, np.pi, 6).astype(np.float32)
    corners = np.asarray(
        box_ops.get_3d_box_batch(jnp.asarray(sizes), jnp.asarray(angles), jnp.asarray(centers))
    )
    bb = corners[0]
    ious = native.box3d_iou_eval_batch(bb, corners)
    for j in range(6):
        want = box3d_iou(bb.astype(float), corners[j].astype(float))[0]
        assert ious[j] == pytest.approx(want, rel=1e-5, abs=1e-7)
    # identical boxes -> IoU 1 (the keep-collinear branch)
    assert ious[0] == pytest.approx(1.0, abs=1e-6)


def test_nms_matches_numpy():
    from coda_neurips2023_tpu.utils.nms import nms_3d_faster_samecls

    rng = np.random.default_rng(3)
    k = 40
    lo = rng.uniform(0, 5, (k, 3))
    hi = lo + rng.uniform(0.5, 2, (k, 3))
    boxes = np.concatenate(
        [lo, hi, rng.uniform(0, 1, (k, 1)), rng.integers(0, 3, (k, 1))], axis=1
    ).astype(np.float32)
    got = sorted(native.nms_3d_samecls(boxes, 0.25))
    want = sorted(nms_3d_faster_samecls(boxes, 0.25))
    assert got == want
