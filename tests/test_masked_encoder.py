"""Masked encoder variant (--enc_type masked): shapes + mask semantics."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from coda_neurips2023_tpu.datasets.config import SunrgbdAnonymousConfig
from coda_neurips2023_tpu.models.model_3detr import CoDA3DETR


def test_masked_encoder_forward():
    cfg = SunrgbdAnonymousConfig()
    model = CoDA3DETR(
        dataset_config=cfg, enc_dim=32, dec_dim=64, enc_type="masked",
        enc_ffn_dim=32, dec_nlayers=2, dec_ffn_dim=32,
        preenc_npoints=64, nqueries=16,
    )
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.uniform(-3, 3, (2, 256, 3)).astype(np.float32))
    inputs = {
        "point_clouds": pc,
        "point_cloud_dims_min": jnp.min(pc, axis=1),
        "point_cloud_dims_max": jnp.max(pc, axis=1),
    }
    variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
    out = model.apply(variables, inputs, train=False)
    # interim downsampling halves the token count: enc_inds has 32 entries
    assert out["enc_inds"].shape == (2, 32)
    assert out["enc_xyz"].shape == (2, 32, 3)
    assert out["box_corners"].shape[1:] == (2, 16, 8, 3)
    assert np.all(np.isfinite(np.asarray(out["box_corners"])))
