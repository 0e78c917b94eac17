"""CLIP towers, preprocessing, projection, and the distillation target path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coda_neurips2023_tpu.models.clip import (
    CLIP,
    TextTransformer,
    VisionTransformer,
    preprocess_images,
)
from coda_neurips2023_tpu.models.distillation import (
    build_clip_distillation_targets,
    crop_square_resize_white,
)
from coda_neurips2023_tpu.ops.projection import (
    project_upright_depth_to_image,
    unaugment_corners,
)


class TestCLIPTowers:
    def test_vision_tower_shapes(self):
        model = VisionTransformer(
            input_resolution=32, patch_size=16, width=64, layers=2, heads=2, output_dim=16
        )
        x = jnp.zeros((2, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (2, 16)

    def test_text_tower_pools_at_eot(self):
        model = TextTransformer(
            context_length=8, vocab_size=100, width=32, layers=2, heads=2, output_dim=16
        )
        toks = jnp.asarray([[1, 5, 99, 0, 0, 0, 0, 0]], jnp.int32)  # EOT=99 at pos 2
        params = model.init(jax.random.PRNGKey(0), toks)
        out = model.apply(params, toks)
        assert out.shape == (1, 16)
        # shifting tokens after the EOT position must not change the output
        toks2 = toks.at[0, 5].set(7)
        out2 = model.apply(params, toks2)
        # causal mask: position 2 (EOT pool) can't see position 5
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)

    def test_preprocess_range(self):
        img = jnp.full((1, 100, 160, 3), 255.0)
        out = preprocess_images(img, 32)
        assert out.shape == (1, 32, 32, 3)
        want = (1.0 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
            [0.26862954, 0.26130258, 0.27577711]
        )
        np.testing.assert_allclose(np.asarray(out[0, 16, 16]), want, rtol=1e-4)


class TestProjection:
    def test_identity_calibration(self):
        # Rtilt = I, K = diag(f, f, 1) with principal point
        k = jnp.asarray([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]])[None]
        rtilt = jnp.eye(3)[None]
        # upright-depth point: x right, y forward, z up
        pc = jnp.asarray([[[1.0, 2.0, 0.5]]])  # (1, 1, 3)
        uv, depth = project_upright_depth_to_image(pc, k, rtilt)
        # camera coords: (x, -z, y) = (1, -0.5, 2); u = 100*1/2+50, v = 100*-0.5/2+40
        np.testing.assert_allclose(np.asarray(depth), [[2.0]], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(uv), [[[100.0, 15.0]]], rtol=1e-5)

    def test_unaugment_inverts_augmentation(self):
        rng = np.random.default_rng(0)
        corners = jnp.asarray(rng.standard_normal((2, 3, 8, 3)).astype(np.float32))
        theta = 0.3
        c, s = np.cos(theta), np.sin(theta)
        rot = jnp.asarray(np.tile(np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], np.float32), (2, 1, 1)))
        scale = jnp.full((2, 3), 1.1, jnp.float32)
        flip = jnp.asarray([1.0, -1.0])
        # forward augmentation used by the data layer: flip x, rotate, scale
        aug = corners.at[..., 0].multiply(flip[:, None, None])
        aug = jnp.einsum("bqki,bij->bqkj", aug, jnp.linalg.inv(rot))
        aug = aug / scale[:, None, None, :]
        back = unaugment_corners(aug, scale, rot, flip)
        np.testing.assert_allclose(np.asarray(back), np.asarray(corners), rtol=1e-4, atol=1e-5)


class TestCropResize:
    def test_full_image_crop_identity_scale(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 255, (64, 64, 3)).astype(np.float32))
        rect = jnp.asarray([0, 0, 64, 64], jnp.int32)
        out = crop_square_resize_white(img, rect, 64)
        # same-size square crop: bicubic taps collapse to the identity; only
        # the reference-faithful uint8 rounding remains
        np.testing.assert_allclose(np.asarray(out), np.round(np.asarray(img)), atol=0.51)

    def test_nonsquare_crop_pads_white(self):
        img = jnp.zeros((64, 64, 3), jnp.float32)
        rect = jnp.asarray([0, 0, 64, 16], jnp.int32)  # wide crop (h=64 horiz, w=16 vert)
        out = np.asarray(crop_square_resize_white(img, rect, 32))
        assert out[0, 16, 0] == 255.0  # top padding is white
        assert out[16, 16, 0] == 0.0  # center is image content

    def test_degenerate_rect_all_white_or_finite(self):
        img = jnp.zeros((32, 32, 3), jnp.float32)
        rect = jnp.asarray([5, 5, 5, 5], jnp.int32)
        out = np.asarray(crop_square_resize_white(img, rect, 16))
        assert np.all(np.isfinite(out))

    def test_matches_torch_bicubic_antialias_oracle(self):
        """The shipped crop == the reference chain (model_3detr.py:1040-1067):
        white uint8 square -> torchvision Resize(S, BICUBIC) -> uint8, whose
        tensor backend is torch F.interpolate(bicubic, antialias=True) with a
        round+clamp.  Continuous values agree to f32 accumulation noise, so
        after both sides round, any residual is a +-1 quantization flip at an
        exact .5 boundary; require <0.1% of pixels differ and never by >1."""
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(7)
        diffs, total = 0, 0
        for (h_img, w_img), rect, out_size in [
            ((73, 53), (4, 9, 51, 60), 32),   # downscale, tall crop
            ((73, 53), (10, 20, 14, 23), 32),  # upscale, tiny crop
            ((96, 128), (0, 0, 128, 96), 48),  # full image, wide
            ((60, 60), (7, 7, 8, 59), 24),     # 1-px-wide column
        ]:
            img = rng.integers(0, 256, (h_img, w_img, 3)).astype(np.float32)
            ours = np.asarray(
                crop_square_resize_white(
                    jnp.asarray(img), jnp.asarray(rect, jnp.int32), out_size
                )
            )
            x0, y0, x1, y1 = rect
            crop = img[y0:y1, x0:x1]
            ch, cw = crop.shape[:2]
            edge = max(ch, cw)
            sq = np.full((edge, edge, 3), 255.0, np.float32)
            oy, ox = (edge - ch) // 2, (edge - cw) // 2
            sq[oy : oy + ch, ox : ox + cw] = crop
            t = torch.from_numpy(sq).permute(2, 0, 1)[None]
            t = F.interpolate(t, (out_size, out_size), mode="bicubic", antialias=True)
            want = np.round(np.clip(t[0].permute(1, 2, 0).numpy(), 0, 255))
            d = np.abs(ours - want)
            assert d.max() <= 1.0, d.max()
            diffs += int((d > 0).sum())
            total += d.size
        assert diffs / total < 1e-3, (diffs, total)


class TestDistillationTargets:
    def test_end_to_end_tiny(self):
        b, nq, n_sel = 2, 8, 4
        rng = np.random.default_rng(0)
        outputs = {
            "box_corners_xyz": jnp.asarray(
                rng.uniform(-1, 1, (b, nq, 8, 3)).astype(np.float32)
            ),
            "size_unnormalized": jnp.asarray(
                rng.uniform(0.2, 1.0, (b, nq, 3)).astype(np.float32)
            ),
        }
        batch = {
            "scale_array": jnp.ones((b, 3)),
            "rot_array": jnp.tile(jnp.eye(3)[None], (b, 1, 1)),
            "flip_array": jnp.ones((b,)),
            "K": jnp.tile(
                jnp.asarray([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]])[None], (b, 1, 1)
            ),
            "Rtilt": jnp.tile(jnp.eye(3)[None], (b, 1, 1)),
            "ori_width": jnp.full((b,), 64.0),
            "ori_height": jnp.full((b,), 64.0),
            "x_offset": jnp.zeros((b,)),
            "y_offset": jnp.zeros((b,)),
            "image_flip_array": jnp.ones((b,)),
            "flip_length": jnp.full((b,), 64.0),
            "input_image": jnp.asarray(
                rng.uniform(0, 255, (b, 64, 64, 3)).astype(np.float32)
            ),
        }
        text = rng.standard_normal((6, 32)).astype(np.float32)
        text = jnp.asarray(text / np.linalg.norm(text, axis=1, keepdims=True))

        def fake_clip(images):  # (N, 16, 16, 3) -> (N, 32)
            return jnp.mean(images, axis=(1, 2)).repeat(11, axis=-1)[:, :32]

        targets = build_clip_distillation_targets(
            jax.random.PRNGKey(0),
            outputs,
            batch,
            fake_clip,
            text_features=text,
            logit_scale=jnp.float32(100.0),
            distillation_box_num=n_sel,
            if_clip_weak_labels=True,
            crop_size=16,
        )
        emb = np.asarray(targets["gt_text_correlation_embedding"])
        mask = np.asarray(targets["gt_text_correlation_embedding_mask"])
        assert emb.shape == (b, nq, 32)
        assert mask.shape == (b, nq, 1)
        assert mask.sum() <= b * n_sel
        # embeddings are zero exactly where mask is zero
        assert np.all((np.abs(emb).sum(-1) > 0) <= (mask[..., 0] > 0))
        conf = np.asarray(targets["weak_confidence_weight"])
        assert np.all(conf[mask[..., 0] == 0] == 0)
        assert np.all(np.isfinite(conf))


class TestObjectnessSelection:
    def test_select_by_objectness_prefers_fg(self):
        """--if_select_box_by_objectness (model_3detr.py:990-1005): once
        enabled, boxes with objectness > 0.05 are selected first; disabled or
        pre-epoch-540 keeps the random permutation."""
        b, nq, n_sel = 1, 8, 3
        rng = np.random.default_rng(1)
        corners = rng.uniform(-1, 1, (b, nq, 8, 3)).astype(np.float32)
        corners[..., 1] += 4.0  # well in front of the camera (positive depth)
        outputs = {
            "box_corners_xyz": jnp.asarray(corners),
            "size_unnormalized": jnp.asarray(
                rng.uniform(0.2, 1.0, (b, nq, 3)).astype(np.float32)
            ),
            # only queries 2, 5, 7 are foreground
            "objectness_prob": jnp.asarray([[0.0, 0.0, 0.9, 0.0, 0.01, 0.8, 0.0, 0.6]]),
        }
        batch = {
            "scale_array": jnp.ones((b, 3)),
            "rot_array": jnp.tile(jnp.eye(3)[None], (b, 1, 1)),
            "flip_array": jnp.ones((b,)),
            "K": jnp.tile(
                jnp.asarray([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]])[None], (b, 1, 1)
            ),
            "Rtilt": jnp.tile(jnp.eye(3)[None], (b, 1, 1)),
            "ori_width": jnp.full((b,), 64.0),
            "ori_height": jnp.full((b,), 64.0),
            "x_offset": jnp.zeros((b,)),
            "y_offset": jnp.zeros((b,)),
            "image_flip_array": jnp.ones((b,)),
            "flip_length": jnp.full((b,), 64.0),
            "input_image": jnp.full((b, 64, 64, 3), 128.0),
        }

        def fake_clip(images):
            return jnp.mean(images, axis=(1, 2)).repeat(11, axis=-1)[:, :32]

        kw = dict(
            outputs=outputs, batch=batch, clip_apply_fn=fake_clip,
            distillation_box_num=n_sel, crop_size=16,
            if_select_box_by_objectness=True,
        )
        on = build_clip_distillation_targets(
            jax.random.PRNGKey(0), objectness_select_enabled=True, **kw
        )
        mask_on = np.asarray(on["gt_text_correlation_embedding_mask"])[0, :, 0]
        # the supervised slots are exactly the 3 foreground queries
        assert set(np.flatnonzero(mask_on)) == {2, 5, 7}

        off = build_clip_distillation_targets(
            jax.random.PRNGKey(0), objectness_select_enabled=False, **kw
        )
        mask_off = np.asarray(off["gt_text_correlation_embedding_mask"])[0, :, 0]
        assert mask_off.sum() == n_sel  # random permutation path still works
