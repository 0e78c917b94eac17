"""End-to-end train-step + eval integration tests on the virtual 8-CPU mesh."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coda_neurips2023_tpu.criterion import Matcher, SetCriterion
from coda_neurips2023_tpu.datasets.config import SunrgbdAnonymousConfig
from coda_neurips2023_tpu.datasets.synthetic import SyntheticDetectionDataset, collate
from coda_neurips2023_tpu.engine import (
    create_train_state,
    evaluate,
    make_eval_step,
    make_train_step,
)
from coda_neurips2023_tpu.models.model_3detr import CoDA3DETR
from coda_neurips2023_tpu.optimizer import build_optimizer, make_lr_schedule
from coda_neurips2023_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def tiny_setup(batch_size=8, num_points=256):
    cfg = SunrgbdAnonymousConfig()
    model = CoDA3DETR(
        dataset_config=cfg,
        enc_dim=32,
        dec_dim=64,
        enc_nlayers=2,
        dec_nlayers=2,
        enc_ffn_dim=32,
        dec_ffn_dim=32,
        preenc_npoints=64,
        nqueries=16,
    )
    ds = SyntheticDetectionDataset(cfg, num_scenes=batch_size, num_points=num_points)
    batch = collate([ds[i] for i in range(batch_size)])
    matcher = Matcher(cost_class=1, cost_objectness=5, cost_giou=3, cost_center=5)
    criterion = SetCriterion(
        matcher,
        cfg,
        {
            "loss_sem_cls_softmax_skip_none_gt_sample_weight": 1.0,
            "loss_no_object_weight": 0.05,
            "loss_no_object_contrast_weight": 0.05,
            "loss_angle_cls_weight": 0.1,
            "loss_angle_reg_weight": 0.5,
            "loss_center_weight": 5.0,
            "loss_size_weight": 1.0,
        },
    )
    args = types.SimpleNamespace(
        base_lr=5e-4,
        warm_lr=1e-6,
        warm_lr_epochs=2,
        final_lr=1e-6,
        lr_scheduler="cosine",
        weight_decay=0.1,
        filter_biases_wd=False,
        clip_gradient=0.1,
        max_epoch=10,
    )
    tx, schedule = build_optimizer(args, None, num_iters_per_epoch=4)
    return cfg, model, batch, criterion, tx, schedule


def test_train_step_runs_and_decreases_loss():
    cfg, model, batch, criterion, tx, schedule = tiny_setup(batch_size=4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(model, criterion, tx, lr_schedule=schedule)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(6):
        state, metrics = train_step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6
    # all aux-layer + final losses present
    assert any(k.startswith("loss_center_") for k in metrics)
    assert "loss_center" in metrics


def test_train_step_sharded_matches_single_device():
    cfg, model, batch, criterion, tx, schedule = tiny_setup(batch_size=8)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(model, criterion, tx, lr_schedule=schedule)
    rng = jax.random.PRNGKey(1)

    # single-device reference
    _, metrics_single = train_step(state, batch, rng)

    # 8-way dp-sharded
    mesh = make_mesh(8)
    state_sh = replicate(mesh, state)
    batch_sh = shard_batch(mesh, batch)
    _, metrics_sharded = train_step(state_sh, batch_sh, rng)

    np.testing.assert_allclose(
        float(metrics_single["loss"]), float(metrics_sharded["loss"]), rtol=2e-4
    )


def test_eval_ap_pipeline():
    cfg, model, batch, criterion, tx, schedule = tiny_setup(batch_size=4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    rng = np.random.default_rng(0)
    text = rng.standard_normal((5, 512)).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=1, keepdims=True))
    eval_step = make_eval_step(model, eval_text_features=text)
    eval_cfg = SunrgbdAnonymousConfig()
    eval_cfg.num_semcls = 5
    ap = evaluate(eval_step, state, [batch], eval_cfg)
    metrics = ap.compute_metrics()
    assert 0.25 in metrics and 0.5 in metrics
    assert "mAP" in metrics[0.25]
    assert np.isfinite(metrics[0.25]["mAP"])
    s = ap.metrics_to_str(metrics, per_class=False)
    assert "mAP0.25" in s


def test_lr_schedule_matches_reference_formula():
    args = types.SimpleNamespace(
        base_lr=1.97e-4,
        warm_lr=1e-6,
        warm_lr_epochs=18,
        final_lr=1e-6,
        lr_scheduler="cosine",
        max_epoch=1080,
    )
    sched = make_lr_schedule(args, num_iters_per_epoch=100)

    def ref_lr(curr_epoch):
        # engine.py:33-49; the warmup boundary is INCLUSIVE (engine.py:36
        # compares curr_epoch_normalized <= warm_lr_epochs/max_epoch), which
        # step 1800 == epoch 18.0 == warm_lr_epochs hits exactly
        if args.warm_lr_epochs > 0 and curr_epoch <= args.warm_lr_epochs:
            return args.warm_lr + curr_epoch / args.warm_lr_epochs * (
                args.base_lr - args.warm_lr
            )
        return args.final_lr + 0.5 * (args.base_lr - args.final_lr) * (
            1 + np.cos(np.pi * curr_epoch / args.max_epoch)
        )

    for step in [0, 50, 900, 1800, 54000, 107999]:
        got = float(sched(step))
        want = ref_lr(step / 100)
        assert got == pytest.approx(want, rel=1e-5), (step, got, want)


def test_2d_box_iou_supervised_loss_matches_skip_none_when_no_judge():
    """With no novel_box_judge signal, the 2d-box-iou-supervised CE reduces to
    the plain skip_none_gt_sample CE (reference criterion.py:248-278 with
    novel_box_judge == 0 everywhere)."""
    cfg, model, batch, _, tx, schedule = tiny_setup(batch_size=4)
    matcher = Matcher(cost_class=1, cost_objectness=5, cost_giou=3, cost_center=5)
    crit = SetCriterion(
        matcher,
        cfg,
        {
            "loss_sem_cls_softmax_skip_none_gt_sample_weight": 1.0,
            "loss_sem_cls_softmax_2d_box_iou_supervised_skip_none_gt_sample_weight": 1.0,
            "loss_no_object_weight": 0.05,
            "loss_no_object_contrast_weight": 0.05,
        },
    )
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    variables = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "constants": state.constants,
    }
    dev_batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
    outputs = model.apply(variables, dev_batch, train=False)
    _, loss_dict = jax.jit(crit)(outputs, dev_batch)
    a = float(loss_dict["loss_sem_cls_softmax_skip_none_gt_sample"])
    b = float(loss_dict["loss_sem_cls_softmax_2d_box_iou_supervised_skip_none_gt_sample"])
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_remat_matches_no_remat():
    """--remat (per-layer jax.checkpoint, both encoders + decoder) must be a
    pure memory/FLOPs trade: same params, same loss, same gradients -- the
    lifted dropout rngs replay identically during the recompute."""
    cfg, model, batch, criterion, tx, schedule = tiny_setup(batch_size=2)
    model_r = model.clone(remat=True)
    rng = jax.random.PRNGKey(1)

    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, criterion, tx, lr_schedule=schedule)
    state_a, metrics_a = step(state, batch, rng)

    # identical init (same structure/keys: remat does not change param paths)
    state_r = create_train_state(model_r, tx, jax.random.PRNGKey(0), batch)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state_r.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    step_r = make_train_step(model_r, criterion, tx, lr_schedule=schedule)
    state_b, metrics_b = step_r(state_r, batch, rng)

    np.testing.assert_allclose(
        float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )


def test_remat_masked_encoder_matches():
    """Same check for the masked-encoder flagship config (interim FPS
    downsampling between rematted layers)."""
    cfg, model, batch, criterion, tx, schedule = tiny_setup(batch_size=2)
    model = model.clone(enc_type="masked")
    model_r = model.clone(remat=True)
    rng = jax.random.PRNGKey(1)

    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, criterion, tx, lr_schedule=schedule)
    _, metrics_a = step(state, batch, rng)

    state_r = create_train_state(model_r, tx, jax.random.PRNGKey(0), batch)
    step_r = make_train_step(model_r, criterion, tx, lr_schedule=schedule)
    _, metrics_b = step_r(state_r, batch, rng)

    np.testing.assert_allclose(
        float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-6
    )
