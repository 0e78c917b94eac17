"""Tensor parallelism: (dp, mp) mesh equals dp-only numerics.

The reference is DP-only (SURVEY.md section 2.2); parallel/tp.py adds
megatron-style head/FFN sharding over a 2-D mesh.  These tests pin (a) that
the rules actually shard the transformer leaves, (b) that a train step on a
(dp=4, mp=2) mesh reproduces the dp-only step bit-for-tolerance, and (c) that
multiple steps do not drift (the AdamW moments stay consistently sharded).
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import numpy as np

import jax
from jax.sharding import PartitionSpec as P

from coda_neurips2023_tpu.engine import create_train_state, make_train_step
from coda_neurips2023_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from coda_neurips2023_tpu.parallel.tp import (
    constrain_train_step,
    make_tp_mesh,
    partition_spec,
    shard_state_tp,
    tp_param_summary,
)

from test_train import tiny_setup


def test_rules_shard_attention_and_ffn():
    cfg, model, batch, criterion, tx, schedule = tiny_setup(batch_size=4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    by_name = {
        "/".join(str(k.key) for k in path): partition_spec(path, leaf, 2)
        for path, leaf in flat
    }
    # tiny model: enc 4 heads x 8, dec 4 heads x 16, ffn 32 -- all mp=2
    # divisible, so every attention/FFN leaf must shard
    assert by_name["encoder/layer0/self_attn/query/kernel"] == P(None, "mp", None)
    assert by_name["encoder/layer0/self_attn/query/bias"] == P("mp", None)
    assert by_name["encoder/layer0/self_attn/out/kernel"] == P("mp", None, None)
    assert by_name["encoder/layer0/self_attn/out/bias"] == P()
    assert by_name["decoder/layer1/multihead_attn/value/kernel"] == P(None, "mp", None)
    assert by_name["decoder/layer0/linear1/kernel"] == P(None, "mp")
    assert by_name["decoder/layer0/linear1/bias"] == P("mp")
    assert by_name["decoder/layer0/linear2/kernel"] == P("mp", None)
    assert by_name["decoder/layer0/linear2/bias"] == P()
    # non-transformer leaves replicated
    assert by_name["sem_cls_head/layer0/kernel"] == P()
    assert by_name["pre_encoder/mlp_module/conv0/kernel"] == P()
    # the full TrainState (params + AdamW mu/nu) shards 3x the param count
    n_p, _ = tp_param_summary(state.params, 2)
    n_s, _ = tp_param_summary(state, 2)
    assert n_p > 0 and n_s == 3 * n_p, (n_p, n_s)


def test_rules_keep_indivisible_leaves_replicated():
    cfg, model, batch, criterion, tx, schedule = tiny_setup(batch_size=4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    # mp=64 divides nothing in the tiny model: every leaf must stay P()
    for path, leaf in flat:
        if leaf.ndim >= 1 and leaf.shape[-1] % 64 != 0:
            assert partition_spec(path, leaf, 64) == P()


def test_tp_train_step_matches_dp():
    cfg, model, batch, criterion, tx, schedule = tiny_setup(batch_size=8)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(model, criterion, tx, lr_schedule=schedule)
    rng = jax.random.PRNGKey(1)

    # dp-only reference on the 8-device mesh
    mesh_dp = make_mesh(8)
    state_dp = replicate(mesh_dp, state)
    batch_dp = shard_batch(mesh_dp, batch)
    state_dp, metrics_dp = train_step(state_dp, batch_dp, rng)

    # (dp=4, mp=2): heads + FFN sharded
    mesh_tp = make_tp_mesh(8, mp=2)
    state_tp = shard_state_tp(mesh_tp, state)
    batch_tp = shard_batch(mesh_tp, batch)
    state_tp, metrics_tp = train_step(state_tp, batch_tp, rng)

    np.testing.assert_allclose(
        float(metrics_dp["loss"]), float(metrics_tp["loss"]), rtol=2e-4
    )
    # updated params agree leaf-wise (gather to host)
    p_dp = jax.tree.map(np.asarray, jax.device_get(state_dp.params))
    p_tp = jax.tree.map(np.asarray, jax.device_get(state_tp.params))
    flat_dp = jax.tree_util.tree_flatten_with_path(p_dp)[0]
    flat_tp = dict(
        (tuple(str(k.key) for k in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(p_tp)[0]
    )
    for path, leaf in flat_dp:
        key = tuple(str(k.key) for k in path)
        # atol covers one unit-LR AdamW step (~lr=1e-6 here): mp reduction
        # order can flip the update SIGN of a zero-init bias whose grad is
        # ~0, which is a ~2e-6 abs (but 2.0 rel) difference -- noise, not drift
        np.testing.assert_allclose(
            leaf, flat_tp[key], rtol=5e-4, atol=5e-6, err_msg="/".join(key)
        )


def test_tp_multi_step_no_drift():
    cfg, model, batch, criterion, tx, schedule = tiny_setup(batch_size=8)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(model, criterion, tx, lr_schedule=schedule)

    mesh_dp = make_mesh(8)
    state_dp = replicate(mesh_dp, state)
    batch_dp = shard_batch(mesh_dp, batch)

    mesh_tp = make_tp_mesh(8, mp=4)  # all 4 heads / 8 ffn-per-shard
    state_tp = shard_state_tp(mesh_tp, state)
    batch_tp = shard_batch(mesh_tp, batch)
    # pin output shardings: plain jit lets GSPMD gather params between steps
    train_step_tp = constrain_train_step(train_step, mesh_tp, state_tp)

    for i in range(3):
        rng = jax.random.PRNGKey(i)
        state_dp, metrics_dp = train_step(state_dp, batch_dp, rng)
        state_tp, metrics_tp = train_step_tp(state_tp, batch_tp, rng)
        np.testing.assert_allclose(
            float(metrics_dp["loss"]), float(metrics_tp["loss"]), rtol=5e-4
        )
    # params remain mp-sharded after the steps (the update did not silently
    # gather them): spot-check one attention kernel's sharding
    leaf = state_tp.params["encoder"]["layer0"]["self_attn"]["query"]["kernel"]
    spec = leaf.sharding.spec
    assert "mp" in tuple(spec), spec


def test_tp_stage1_fused_step_matches_dp():
    """The flagship stage-1 fused step (trunk + frozen CLIP teacher inside
    ONE jit) on the (dp, mp) mesh: CLIP leaves shard under the tp.py CLIP
    rules and the loss matches the dp-only run."""
    import types

    from coda_neurips2023_tpu.criterion import build_criterion
    from coda_neurips2023_tpu.datasets.loader import collate
    from coda_neurips2023_tpu.datasets.config import (
        SunrgbdAnonymousConfig,
        SunrgbdImageConfig,
    )
    from coda_neurips2023_tpu.datasets.synthetic import SyntheticDetectionDataset
    from coda_neurips2023_tpu.models.model_3detr import CoDA3DETR
    from coda_neurips2023_tpu.optimizer import build_optimizer
    from coda_neurips2023_tpu.stages import StageContext
    from test_stages import _crit_args, stage_args, tiny_clip

    cfg = SunrgbdAnonymousConfig()
    eval_cfg = SunrgbdImageConfig()
    model = CoDA3DETR(
        dataset_config=cfg, enc_dim=32, dec_dim=64, enc_nlayers=2,
        dec_nlayers=2, enc_ffn_dim=32, dec_ffn_dim=32, preenc_npoints=64,
        nqueries=16,
    )
    ds = SyntheticDetectionDataset(cfg, num_scenes=8, num_points=256,
                                   with_images=True)
    batch = collate([ds[i] for i in range(8)])
    batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
    args = stage_args()
    criterion = build_criterion(_crit_args(args), cfg)
    tx, schedule = build_optimizer(args, None, 4)
    rng = jax.random.PRNGKey(1)

    # dp-only reference
    ctx = StageContext(args, eval_cfg, clip_model=tiny_clip(), crop_size=16)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    mesh_dp = make_mesh(8)
    fused = ctx.make_fused_train_step(model, criterion, tx, lr_schedule=schedule)
    _, metrics_dp = fused(replicate(mesh_dp, state), shard_batch(mesh_dp, batch), rng)

    # (dp=4, mp=2): trunk AND CLIP sharded; same ctx would reuse the step
    # cache, so build a fresh one with pre-sharded clip vars
    mesh_tp = make_tp_mesh(8, mp=2)
    ctx_tp = StageContext(args, eval_cfg, clip_model=tiny_clip(), crop_size=16)
    n_clip, _ = tp_param_summary(ctx_tp.clip_variables, 2)
    assert n_clip > 0, "CLIP rules sharded nothing"
    ctx_tp.clip_variables = shard_state_tp(mesh_tp, ctx_tp.clip_variables)
    state_tp = shard_state_tp(mesh_tp, create_train_state(
        model, tx, jax.random.PRNGKey(0), batch))
    fused_tp = constrain_train_step(
        ctx_tp.make_fused_train_step(model, criterion, tx, lr_schedule=schedule),
        mesh_tp, state_tp,
    )
    state_tp, metrics_tp = fused_tp(state_tp, shard_batch(mesh_tp, batch), rng)

    np.testing.assert_allclose(
        float(metrics_dp["loss"]), float(metrics_tp["loss"]), rtol=5e-4
    )
    # CLIP vars stayed mp-sharded (the step did not gather the teacher)
    leaf = ctx_tp.clip_variables["params"]["visual"]["transformer"][
        "resblock0"]["c_fc"]["kernel"]
    assert "mp" in tuple(leaf.sharding.spec), leaf.sharding
