"""Model forward shape tests (tiny shapes, CPU)."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coda_neurips2023_tpu.datasets.config import SunrgbdAnonymousConfig
from coda_neurips2023_tpu.models.model_3detr import CoDA3DETR, get_class_scores


@pytest.fixture(scope="module")
def tiny_model_and_vars():
    cfg = SunrgbdAnonymousConfig()
    model = CoDA3DETR(
        dataset_config=cfg,
        enc_dim=32,
        dec_dim=64,
        enc_nlayers=2,
        dec_nlayers=3,
        enc_ffn_dim=32,
        dec_ffn_dim=32,
        preenc_npoints=64,
        nqueries=16,
    )
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.uniform(-3, 3, (2, 256, 3)).astype(np.float32))
    inputs = {
        "point_clouds": pc,
        "point_cloud_dims_min": jnp.min(pc, axis=1),
        "point_cloud_dims_max": jnp.max(pc, axis=1),
    }
    variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
    return model, variables, inputs, cfg


def test_forward_shapes(tiny_model_and_vars):
    model, variables, inputs, cfg = tiny_model_and_vars
    out = model.apply(variables, inputs, train=False)
    L, B, nq = 3, 2, 16
    assert out["sem_cls_logits"].shape == (L, B, nq, 2)
    assert out["center_unnormalized"].shape == (L, B, nq, 3)
    assert out["size_unnormalized"].shape == (L, B, nq, 3)
    assert out["angle_logits"].shape == (L, B, nq, cfg.num_angle_bin)
    assert out["box_corners"].shape == (L, B, nq, 8, 3)
    assert out["box_corners_xyz"].shape == (L, B, nq, 8, 3)
    assert out["objectness_prob"].shape == (L, B, nq)
    assert out["sem_cls_prob"].shape == (L, B, nq, 1)
    assert out["text_correlation_embedding"].shape == (L, B, nq, 512)
    assert np.all(np.isfinite(np.asarray(out["box_corners"])))
    # objectness in [0, 1]
    obj = np.asarray(out["objectness_prob"])
    assert obj.min() >= 0 and obj.max() <= 1


def test_forward_train_mode_with_batchnorm(tiny_model_and_vars):
    model, variables, inputs, _ = tiny_model_and_vars
    out, updates = model.apply(
        variables,
        inputs,
        train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in updates
    assert np.all(np.isfinite(np.asarray(out["center_unnormalized"])))


def test_get_class_scores():
    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.standard_normal((2, 8, 512)).astype(np.float32))
    text = rng.standard_normal((5, 512)).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=1, keepdims=True))
    scores = get_class_scores(emb, text, jnp.float32(100.0))
    assert scores.shape == (2, 8, 5)
    np.testing.assert_allclose(np.asarray(scores.sum(-1)), 1.0, rtol=1e-5)
