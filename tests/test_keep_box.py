"""--if_keep_box path: novel predictions appended to GT."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from coda_neurips2023_tpu.models.distillation import keep_novel_boxes_as_gt


def test_keep_appends_novel_boxes():
    b, nq, n_sel, max_obj = 2, 8, 4, 6
    rng = np.random.default_rng(0)
    outputs = {
        "objectness_prob": jnp.asarray(np.full((b, nq), 0.9, np.float32)),
        "angle_logits": jnp.asarray(rng.standard_normal((b, nq, 12)).astype(np.float32)),
        "angle_residual": jnp.asarray(rng.standard_normal((b, nq, 12)).astype(np.float32)),
        "size_normalized": jnp.asarray(rng.uniform(0.1, 0.5, (b, nq, 3)).astype(np.float32)),
        "size_unnormalized": jnp.asarray(rng.uniform(0.5, 2.0, (b, nq, 3)).astype(np.float32)),
        "box_corners": jnp.asarray(rng.standard_normal((b, nq, 8, 3)).astype(np.float32)),
        "box_corners_xyz": jnp.asarray(rng.standard_normal((b, nq, 8, 3)).astype(np.float32)),
        "angle_continuous": jnp.asarray(rng.standard_normal((b, nq)).astype(np.float32)),
        "center_normalized": jnp.asarray(rng.uniform(0, 1, (b, nq, 3)).astype(np.float32)),
    }
    batch = {
        "gt_box_present": jnp.asarray(
            np.array([[1, 1, 0, 0, 0, 0], [1, 0, 0, 0, 0, 0]], np.float32)
        ),
        "gt_angle_class_label": jnp.zeros((b, max_obj), jnp.int32),
        "gt_angle_residual_label": jnp.zeros((b, max_obj), jnp.float32),
        "gt_box_sizes_normalized": jnp.zeros((b, max_obj, 3), jnp.float32),
        "gt_box_sizes": jnp.zeros((b, max_obj, 3), jnp.float32),
        "gt_box_corners": jnp.zeros((b, max_obj, 8, 3), jnp.float32),
        "gt_box_corners_xyz": jnp.zeros((b, max_obj, 8, 3), jnp.float32),
        "gt_box_angles": jnp.zeros((b, max_obj), jnp.float32),
        "gt_box_centers_normalized": jnp.zeros((b, max_obj, 3), jnp.float32),
    }
    sel = jnp.asarray(np.tile(np.arange(n_sel), (b, 1)))
    # text bank with 20 classes; craft embeddings hitting class 15 (novel)
    text = np.zeros((20, 16), np.float32)
    for i in range(20):
        text[i, i % 16] = 1.0
    emb = np.zeros((b, n_sel, 16), np.float32)
    emb[:, :, 15] = 5.0  # -> argmax class 15 >= train_range_max=10
    valid = jnp.asarray(np.ones((b, n_sel), bool))

    updates = keep_novel_boxes_as_gt(
        outputs, batch, sel, jnp.asarray(emb), valid, jnp.asarray(text),
        jnp.float32(100.0), keep_objectness=0.5, train_range_max=10,
        enabled=jnp.bool_(True),
    )
    present = np.asarray(updates["gt_box_present"])
    # sample 0 had 2 GT; 4 keeps fit exactly in the 6 slots
    assert present[0].sum() == 6
    # sample 1 had 1 GT; 4 keeps -> 5
    assert present[1].sum() == 5
    # appended geometry comes from the predictions
    corners = np.asarray(updates["gt_box_corners"])
    np.testing.assert_allclose(
        corners[1, 1], np.asarray(outputs["box_corners"])[1, 0], rtol=1e-6
    )

    # disabled -> unchanged
    updates_off = keep_novel_boxes_as_gt(
        outputs, batch, sel, jnp.asarray(emb), valid, jnp.asarray(text),
        jnp.float32(100.0), keep_objectness=0.5, train_range_max=10,
        enabled=jnp.bool_(False),
    )
    np.testing.assert_array_equal(
        np.asarray(updates_off["gt_box_present"]), np.asarray(batch["gt_box_present"])
    )

    # objectness gate
    outputs2 = dict(outputs)
    outputs2["objectness_prob"] = jnp.zeros((b, nq), jnp.float32)
    updates2 = keep_novel_boxes_as_gt(
        outputs2, batch, sel, jnp.asarray(emb), valid, jnp.asarray(text),
        jnp.float32(100.0), keep_objectness=0.5, train_range_max=10,
        enabled=jnp.bool_(True),
    )
    np.testing.assert_array_equal(
        np.asarray(updates2["gt_box_present"]), np.asarray(batch["gt_box_present"])
    )
