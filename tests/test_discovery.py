"""Stage-2 discovery: device NMS parity, GT-overlap exclusion, writer."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coda_neurips2023_tpu.models.discovery import (
    aabb_iou_3d,
    discover_novel_boxes,
    nms_2d_greedy_mask,
    write_pseudo_labels,
)


class TestDeviceNMS:
    def test_matches_torchvision_semantics(self):
        # greedy NMS by descending score; suppress IoU > threshold
        rng = np.random.default_rng(0)
        for _ in range(10):
            n = 24
            xy = rng.uniform(0, 50, (n, 2))
            wh = rng.uniform(5, 25, (n, 2))
            boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
            scores = rng.uniform(0, 1, n).astype(np.float32)
            keep = np.asarray(
                nms_2d_greedy_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.25)
            )
            # reference python greedy (float32 math to match the device kernel)
            order = np.argsort(-scores)
            alive = np.ones(n, bool)
            want = np.zeros(n, bool)
            f32 = np.float32
            area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            for i in order:
                if not alive[i]:
                    continue
                want[i] = True
                xx1 = np.maximum(boxes[i, 0], boxes[:, 0]).astype(f32)
                yy1 = np.maximum(boxes[i, 1], boxes[:, 1]).astype(f32)
                xx2 = np.minimum(boxes[i, 2], boxes[:, 2]).astype(f32)
                yy2 = np.minimum(boxes[i, 3], boxes[:, 3]).astype(f32)
                inter = (np.maximum(xx2 - xx1, f32(0)) * np.maximum(yy2 - yy1, f32(0))).astype(f32)
                iou = (inter / np.maximum(area[i] + area - inter, f32(1e-12))).astype(f32)
                alive &= ~(iou > f32(0.25))
                alive[i] = False
            np.testing.assert_array_equal(keep, want)


class TestAabbIoU:
    def test_simple(self):
        a = jnp.asarray([[0.0, 0, 0, 2, 2, 2]])
        b = jnp.asarray([[1.0, 1, 1, 3, 3, 3], [10.0, 10, 10, 11, 11, 11]])
        iou = np.asarray(aabb_iou_3d(a, b))
        assert iou[0, 0] == pytest.approx(1 / 15)
        assert iou[0, 1] == 0


class TestWriter:
    def test_write_accumulate_and_cap(self, tmp_path):
        path = str(tmp_path / "000001_novel_bbox.npy")
        np.save(path, np.zeros((0, 8)))
        info = np.arange(2 * 4 * 10, dtype=np.float64).reshape(2, 4, 10)
        mask = np.zeros((2, 4), bool)
        mask[0, 1] = mask[0, 3] = True
        write_pseudo_labels(
            info, mask, [path, "_"], np.array([62, 0]), accumulate=True, max_num_obj=64
        )
        out = np.load(path)
        assert out.shape == (2, 10)
        # second round accumulates
        write_pseudo_labels(
            info, mask, [path, "_"], np.array([62, 0]), accumulate=True, max_num_obj=64
        )
        assert np.load(path).shape == (4, 10)
        # cap: only 1 slot left
        write_pseudo_labels(
            info, mask, [path, "_"], np.array([63, 0]), accumulate=False, max_num_obj=64
        )
        assert np.load(path).shape == (1, 10)


class TestDiscoveryEndToEnd:
    def test_tiny(self):
        b, nq = 2, 8
        rng = np.random.default_rng(0)
        outputs = {
            "box_corners_xyz": jnp.asarray(rng.uniform(-1, 1, (b, nq, 8, 3)).astype(np.float32)),
            "box_corners": jnp.asarray(rng.uniform(-1, 1, (b, nq, 8, 3)).astype(np.float32)),
            "center_unnormalized": jnp.asarray(rng.uniform(-1, 1, (b, nq, 3)).astype(np.float32)),
            "size_unnormalized": jnp.asarray(rng.uniform(0.2, 1.0, (b, nq, 3)).astype(np.float32)),
            "angle_continuous": jnp.asarray(rng.uniform(-1, 1, (b, nq)).astype(np.float32)),
            "objectness_prob": jnp.asarray(rng.uniform(0, 1, (b, nq)).astype(np.float32)),
        }
        batch = {
            "scale_array": jnp.ones((b, 3)),
            "rot_array": jnp.tile(jnp.eye(3)[None], (b, 1, 1)),
            "flip_array": jnp.ones((b,)),
            "rot_angle": jnp.zeros((b,)),
            "K": jnp.tile(jnp.asarray([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]])[None], (b, 1, 1)),
            "Rtilt": jnp.tile(jnp.eye(3)[None], (b, 1, 1)),
            "ori_width": jnp.full((b,), 64.0),
            "ori_height": jnp.full((b,), 64.0),
            "x_offset": jnp.zeros((b,)),
            "y_offset": jnp.zeros((b,)),
            "image_flip_array": jnp.ones((b,)),
            "flip_length": jnp.full((b,), 64.0),
            "input_image": jnp.asarray(rng.uniform(0, 255, (b, 64, 64, 3)).astype(np.float32)),
            "gt_box_corners": jnp.asarray(rng.uniform(-1, 1, (b, 4, 8, 3)).astype(np.float32)),
            "gt_box_present": jnp.asarray(np.array([[1, 1, 0, 0], [0, 0, 0, 0]], np.float32)),
        }
        text = rng.standard_normal((20, 16)).astype(np.float32)
        text = jnp.asarray(text / np.linalg.norm(text, axis=1, keepdims=True))

        def fake_clip(images):
            return jnp.mean(images, axis=(1, 2)).repeat(6, axis=-1)[:, :16]

        out = discover_novel_boxes(
            outputs,
            batch,
            fake_clip,
            text,
            jnp.float32(100.0),
            train_range_max=10,
            max_discovery_crops=4,
            crop_size=16,
        )
        info = np.asarray(out["save_box_info"])
        mask = np.asarray(out["novel_mask"])
        assert info.shape == (b, nq, 10)
        assert mask.shape == (b, nq)
        # novel rows have class >= train_range_max and prob > threshold
        if mask.any():
            rows = info[mask]
            assert np.all(rows[:, 7] >= 10)
            assert np.all(rows[:, 8] > 0.3)
            assert np.all(rows[:, 9] >= 0.3)  # objectness gate
        assert np.all(np.isfinite(info))
