"""Masked encoder variant (--enc_type masked): shapes + mask semantics."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from coda_neurips2023_tpu.datasets.config import SunrgbdAnonymousConfig
from coda_neurips2023_tpu.models.model_3detr import CoDA3DETR


def test_fused_masked_attention_kernel_matches_reference():
    """Pallas radius-masked attention (interpret mode) == the plain-jnp
    restatement == flax MHA with an explicit allowed-mask."""
    import flax.linen as nn
    from jax.experimental.pallas import tpu as pltpu

    from coda_neurips2023_tpu.ops import pallas_masked_attention as pma

    rng = np.random.default_rng(3)
    b, h, s, d = 2, 4, 256, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, d, s)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(-2, 2, (b, s, 3)).astype(np.float32))
    xyz_t = jnp.transpose(xyz, (0, 2, 1))
    radius = 1.2
    want = np.asarray(pma._reference(q, k, v, xyz, xyz_t, radius))
    with pltpu.force_tpu_interpret_mode():
        # strict f32 operands: kernel math == restatement to fp tolerance
        got32 = np.asarray(
            pma.masked_attention(q, k, v, xyz, xyz_t, radius, "float32")
        )
        # shipped default (bf16 operands, f32 accumulation -- the precision
        # the XLA path already runs at on v5e under allow_excess_precision)
        got = np.asarray(pma.masked_attention(q, k, v, xyz, xyz_t, radius))
    np.testing.assert_allclose(got32, want, rtol=2e-5, atol=2e-5)
    # bf16 operands vs the f32 oracle: ~bf16 score noise through a softmax;
    # the on-chip incumbent (XLA f32 w/ allow_excess_precision) is itself
    # bf16-precision, so this gap does not exist vs the shipped XLA path
    np.testing.assert_allclose(got, want, rtol=8e-2, atol=8e-2)
    # cross-check the restatement vs flax attention with the same mask
    d2 = jnp.sum((xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1)
    allowed = jnp.sqrt(jnp.maximum(d2, 0.0)) < radius
    flax_out = nn.dot_product_attention(
        jnp.swapaxes(q, 1, 2) * np.sqrt(d),  # undo pre-scaling; flax rescales
        jnp.swapaxes(jnp.swapaxes(k, 2, 3), 1, 2),
        jnp.swapaxes(v, 1, 2),
        mask=allowed[:, None, :, :],
    )
    np.testing.assert_allclose(
        got32, np.asarray(jnp.swapaxes(flax_out, 1, 2)), rtol=2e-4, atol=2e-4
    )


def test_fused_masked_self_attention_module_matches_flax_mha():
    """FusedMaskedSelfAttention applied with params initialized by the STOCK
    flax MHA gives the same output -- param-tree interchangeability, the
    guarantee that lets eval flip implementations under one checkpoint."""
    import flax.linen as nn
    from jax.experimental.pallas import tpu as pltpu

    from coda_neurips2023_tpu.models.transformer import FusedMaskedSelfAttention

    rng = np.random.default_rng(4)
    b, s, dm, heads = 2, 128, 32, 4
    x = jnp.asarray(rng.standard_normal((b, s, dm)).astype(np.float32))
    pos = jnp.asarray(rng.standard_normal((b, s, dm)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(-2, 2, (b, s, 3)).astype(np.float32))
    radius = 1.0

    mha = nn.MultiHeadDotProductAttention(
        num_heads=heads, kernel_init=nn.initializers.xavier_uniform()
    )
    q = x + pos
    params = mha.init(jax.random.PRNGKey(1), inputs_q=q, inputs_k=q, inputs_v=x)
    d2 = jnp.sum((xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1)
    allowed = jnp.sqrt(jnp.maximum(d2, 0.0)) < radius
    want = np.asarray(
        mha.apply(params, inputs_q=q, inputs_k=q, inputs_v=x,
                  mask=allowed[:, None, :, :])
    )
    fused = FusedMaskedSelfAttention(heads=heads, d_model=dm)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused.apply(params, q, x, xyz, radius))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    # unmasked mode (the vanilla-encoder path): xyz=None
    want_u = np.asarray(mha.apply(params, inputs_q=q, inputs_k=q, inputs_v=x))
    with pltpu.force_tpu_interpret_mode():
        got_u = np.asarray(fused.apply(params, q, x, None))
    np.testing.assert_allclose(got_u, want_u, rtol=2e-2, atol=2e-2)


def test_fused_cross_attention_matches_flax_mha():
    """Decoder cross-attention route: FusedMaskedSelfAttention with
    k_in=memory+pos, v_in=memory == stock flax MHA, same params."""
    import flax.linen as nn
    from jax.experimental.pallas import tpu as pltpu

    from coda_neurips2023_tpu.models.transformer import FusedMaskedSelfAttention

    rng = np.random.default_rng(5)
    b, sq, skv, dm, heads = 2, 128, 256, 32, 4
    qq = jnp.asarray(rng.standard_normal((b, sq, dm)).astype(np.float32))
    memory = jnp.asarray(rng.standard_normal((b, skv, dm)).astype(np.float32))
    pos = jnp.asarray(rng.standard_normal((b, skv, dm)).astype(np.float32))
    kk = memory + pos

    mha = nn.MultiHeadDotProductAttention(
        num_heads=heads, kernel_init=nn.initializers.xavier_uniform()
    )
    params = mha.init(
        jax.random.PRNGKey(2), inputs_q=qq, inputs_k=kk, inputs_v=memory
    )
    want = np.asarray(mha.apply(params, inputs_q=qq, inputs_k=kk, inputs_v=memory))
    fused = FusedMaskedSelfAttention(heads=heads, d_model=dm)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused.apply(params, qq, memory, None, 0.0, kk))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


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
