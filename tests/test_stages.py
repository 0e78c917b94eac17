"""Stage-1/stage-2 training integration on the virtual CPU mesh (tiny CLIP)."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import types

import numpy as np
import pytest

import jax

from coda_neurips2023_tpu.criterion import build_criterion
from coda_neurips2023_tpu.datasets.config import SunrgbdAnonymousConfig, SunrgbdImageConfig
from coda_neurips2023_tpu.datasets.synthetic import SyntheticDetectionDataset, collate
from coda_neurips2023_tpu.engine import create_train_state, make_train_step
from coda_neurips2023_tpu.models.clip import CLIP
from coda_neurips2023_tpu.models.model_3detr import CoDA3DETR
from coda_neurips2023_tpu.optimizer import build_optimizer
from coda_neurips2023_tpu.stages import StageContext


def stage_args(**over):
    base = dict(
        base_lr=5e-4, warm_lr=1e-6, warm_lr_epochs=2, final_lr=1e-6,
        lr_scheduler="cosine", weight_decay=0.1, filter_biases_wd=False,
        clip_gradient=0.1, max_epoch=4,
        matcher_cls_cost=1, matcher_giou_cost=3, matcher_center_cost=5,
        matcher_objectness_cost=5,
        loss_giou_weight=0.0,
        loss_sem_cls_softmax_weight=0.0,
        loss_sem_cls_softmax_skip_none_gt_sample_weight=1.0,
        loss_no_object_weight=0.05, loss_no_object_contrast_weight=0.05,
        loss_angle_cls_weight=0.1, loss_angle_reg_weight=0.5,
        loss_center_weight=5.0, loss_size_weight=1.0,
        loss_predicted_region_embed_l1_weight=1.0,
        loss_feat_seen_softmax_weakly_loss_with_novel_cate_confi_weight=0.0,
        loss_contrast_object_text=0.0,
        train_range_max=10, test_range_max=46,
        confidence_type="non-confidence",
        if_clip_more_prompts=True, if_clip_superset=False,
        if_clip_weak_labels=False, distillation_box_num=4,
        clip_model_path=None, clip_bpe_path=None,
        online_nms_update_save_novel_label_clip_driven_with_cate_confidence=False,
        online_nms_update_save_epoch=50,
        save_objectness=0.3, clip_driven_keep_thres=0.3,
        if_accumulate_former_pseudo_labels=False,
    )
    base.update(over)
    return types.SimpleNamespace(**base)


def tiny_clip():
    return CLIP(
        embed_dim=512,  # head dim must match the text_correlation_head (512)
        image_resolution=16,
        vision_patch_size=8,
        vision_width=64,
        vision_layers=1,
        text_width=32,
        text_layers=1,
        text_heads=2,
        context_length=8,
        vocab_size=64,
    )


@pytest.fixture(scope="module")
def stage1_setup():
    cfg = SunrgbdAnonymousConfig()
    eval_cfg = SunrgbdImageConfig()
    model = CoDA3DETR(
        dataset_config=cfg, enc_dim=32, dec_dim=64, enc_nlayers=2, dec_nlayers=2,
        enc_ffn_dim=32, dec_ffn_dim=32, preenc_npoints=64, nqueries=16,
    )
    ds = SyntheticDetectionDataset(cfg, num_scenes=4, num_points=256, with_images=True)
    batch = collate([ds[i] for i in range(2)])
    batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
    return cfg, eval_cfg, model, batch


def test_stage1_distillation_train_step(stage1_setup):
    cfg, eval_cfg, model, batch = stage1_setup
    args = stage_args()
    ctx = StageContext(args, eval_cfg, clip_model=tiny_clip(), crop_size=16)
    criterion = build_criterion(_crit_args(args), cfg)
    tx, schedule = build_optimizer(args, None, 4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, criterion, tx, extra_targets_fn=ctx.extra_targets_fn(), lr_schedule=schedule)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert "loss_predicted_region_embed_l1" in metrics
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_predicted_region_embed_l1"]) >= 0


def test_stage2_weakly_loss_and_discovery(stage1_setup, tmp_path):
    cfg, eval_cfg, model, batch = stage1_setup
    args = stage_args(
        loss_feat_seen_softmax_weakly_loss_with_novel_cate_confi_weight=1.0,
        if_clip_weak_labels=True,
        online_nms_update_save_novel_label_clip_driven_with_cate_confidence=True,
        clip_driven_keep_thres=0.0,  # permissive so something gets written
        save_objectness=0.0,
    )
    ctx = StageContext(args, eval_cfg, clip_model=tiny_clip(), crop_size=16)
    criterion = build_criterion(_crit_args(args), cfg)
    tx, schedule = build_optimizer(args, None, 4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(
        model, criterion, tx, extra_targets_fn=ctx.extra_targets_fn(),
        return_last_outputs=True, lr_schedule=schedule,
    )
    state, metrics, last = step(state, batch, jax.random.PRNGKey(1))
    assert "loss_feat_seen_softmax_weakly_loss_with_novel_cate_confi" in metrics
    assert np.isfinite(float(metrics["loss"]))
    assert set(last) >= {"box_corners", "box_corners_xyz", "objectness_prob"}

    # discovery + writer
    paths = [str(tmp_path / f"{i:06d}_novel_bbox.npy") for i in range(2)]
    host_batch = dict(batch)
    host_batch["pseudo_box_path"] = paths
    discovery = ctx.discovery_fn()
    n = ctx.run_discovery_and_write(discovery, last, host_batch)
    assert n >= 0
    import os

    for p in paths:
        if os.path.exists(p):
            rows = np.load(p)
            assert rows.shape[1] == 10


def test_clip_eval_step_gt_box_and_expand(stage1_setup):
    """--if_use_gt_box / --if_expand_box ceiling-experiment eval variants."""
    cfg, eval_cfg, model, batch = stage1_setup
    args = stage_args(if_use_gt_box=True, if_expand_box=True)
    ctx = StageContext(args, eval_cfg, clip_model=tiny_clip(), crop_size=16)
    tx, schedule = build_optimizer(args, None, 4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    eval_step = ctx.make_clip_eval_step(model)
    out = jax.device_get(eval_step(state, batch))
    nq = 16
    assert out["box_corners"].shape[:2] == (2, nq)
    assert out["sem_cls_prob"].shape[:2] == (2, nq)
    assert np.all(np.isfinite(out["sem_cls_prob"]))
    # GT geometry must be passed through: first gt box corners match
    ngt = int(np.sum(np.asarray(batch["gt_box_present"])[0]))
    if ngt > 0:
        np.testing.assert_allclose(
            out["box_corners"][0, :ngt],
            np.asarray(batch["gt_box_corners"])[0, :ngt],
            rtol=1e-5,
        )
    # objectness is the GT present mask (padded/truncated to nq)
    present = np.asarray(batch["gt_box_present"])[0]
    expect = np.zeros(nq, np.float32)
    expect[: min(nq, present.shape[0])] = present[:nq]
    np.testing.assert_allclose(out["objectness_prob"][0], expect)


def test_eval_layer_id_selects_decoder_layer(stage1_setup):
    """--eval_layer_id: evaluating layer 0 differs from the final layer."""
    from coda_neurips2023_tpu.engine import make_eval_step

    cfg, eval_cfg, model, batch = stage1_setup
    args = stage_args()
    tx, schedule = build_optimizer(args, None, 4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    import jax.numpy as jnp

    text = jnp.ones((cfg.num_semcls, 512), jnp.float32)
    out_last = jax.device_get(
        make_eval_step(model, eval_text_features=text)(state, batch)
    )
    out_l0 = jax.device_get(
        make_eval_step(model, eval_text_features=text, eval_layer_id=0)(state, batch)
    )
    assert out_last["box_corners"].shape == out_l0["box_corners"].shape
    assert not np.allclose(out_last["box_corners"], out_l0["box_corners"])


def _crit_args(args):
    # criterion builder reads a couple of extra flag names
    args = types.SimpleNamespace(**vars(args))
    for name in [
        "loss_sem_cls_softmax_2d_box_iou_supervised_skip_none_gt_sample_weight",
        "loss_sem_cls_softmax_skip_none_gt_sample_en_discovery_objectness_weight",
        "loss_sem_cls_softmax_skip_none_gt_sample_keep_discovery_objectness_weight",
        "loss_sem_cls_softmax_discovery_novel_objectness_weight",
    ]:
        if not hasattr(args, name):
            setattr(args, name, 0.0)
    return args


def test_targets_step_selection_varies_per_step(stage1_setup):
    """The distillation crop selection must be redrawn every step (reference
    np.random.choice per forward, model_3detr.py:997) -- round-1 bug: the
    phase-A rng was constant, so the same query slots were supervised
    forever."""
    cfg, eval_cfg, model, batch = stage1_setup
    args = stage_args(distillation_box_num=4)
    ctx = StageContext(args, eval_cfg, clip_model=tiny_clip(), crop_size=16)
    tx, schedule = build_optimizer(args, None, 4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    targets_step = ctx.make_targets_step(model)
    rng = jax.random.PRNGKey(1)
    t0 = jax.device_get(targets_step(state, batch, rng))
    t1 = jax.device_get(targets_step(state.replace(step=state.step + 1), batch, rng))
    m0 = t0["gt_text_correlation_embedding_mask"][..., 0]
    m1 = t1["gt_text_correlation_embedding_mask"][..., 0]
    assert m0.sum() > 0 and m1.sum() > 0
    assert not np.array_equal(m0, m1), "selection identical across steps"


def test_two_phase_matches_single_jit_train_step(stage1_setup):
    """Phase-A targets now come from the TRAIN-mode forward with the same
    dropout rng as phase B, so the split two-phase step must produce exactly
    the same losses as the fused single-jit step (reference computes targets
    inside the one train forward, model_3detr.py:902-1210)."""
    cfg, eval_cfg, model, batch = stage1_setup
    args = stage_args()
    ctx = StageContext(args, eval_cfg, clip_model=tiny_clip(), crop_size=16)
    criterion = build_criterion(_crit_args(args), cfg)
    tx, schedule = build_optimizer(args, None, 4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(1)

    fused = make_train_step(
        model, criterion, tx, extra_targets_fn=ctx.extra_targets_fn(),
        criterion_consts=ctx.criterion_consts(), lr_schedule=schedule,
    )
    split = ctx.make_two_phase_train_step(model, criterion, tx, lr_schedule=schedule)

    _, m_fused = fused(state, batch, rng)
    _, m_split = split(state, batch, rng)
    np.testing.assert_allclose(
        float(m_fused["loss"]), float(m_split["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_fused["loss_predicted_region_embed_l1"]),
        float(m_split["loss_predicted_region_embed_l1"]),
        rtol=1e-5,
    )


def test_fused_train_step_matches_two_phase(stage1_setup):
    """make_fused_train_step (CLIP weights as traced batch inputs) must equal
    the two-phase split exactly."""
    cfg, eval_cfg, model, batch = stage1_setup
    args = stage_args()
    ctx = StageContext(args, eval_cfg, clip_model=tiny_clip(), crop_size=16)
    criterion = build_criterion(_crit_args(args), cfg)
    tx, schedule = build_optimizer(args, None, 4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(1)

    fused = ctx.make_fused_train_step(model, criterion, tx, lr_schedule=schedule)
    split = ctx.make_two_phase_train_step(model, criterion, tx, lr_schedule=schedule)
    _, m_fused = fused(state, batch, rng)
    _, m_split = split(state, batch, rng)
    np.testing.assert_allclose(float(m_fused["loss"]), float(m_split["loss"]), rtol=1e-5)


def test_clip_tower_dtype_selection():
    """fp32 default (explicit bf16 measured SLOWER on v5e, see
    stages.clip_tower_dtype); --clip_dtype bf16 / --compute_dtype bf16 opt in."""
    import jax.numpy as jnp

    from coda_neurips2023_tpu.stages import clip_tower_dtype

    assert clip_tower_dtype(types.SimpleNamespace()) == jnp.float32
    assert clip_tower_dtype(types.SimpleNamespace(clip_dtype="bf16")) == jnp.bfloat16
    assert (
        clip_tower_dtype(types.SimpleNamespace(clip_dtype="float32")) == jnp.float32
    )
    assert (
        clip_tower_dtype(
            types.SimpleNamespace(clip_dtype="float32", compute_dtype="bf16")
        )
        == jnp.bfloat16
    )


def test_if_only_novel_prompt_narrows_eval_vocab(stage1_setup):
    """--if_only_novel_prompt classifies against rows 10:37 of the test bank
    (reference model_3detr.py:1985, 2846: novel-only zero-shot analysis)."""
    cfg, eval_cfg, model, batch = stage1_setup
    args = stage_args(if_only_novel_prompt=True)
    ctx = StageContext(args, eval_cfg, clip_model=tiny_clip(), crop_size=16)
    tx, schedule = build_optimizer(args, None, 4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    eval_step = ctx.make_clip_eval_step(model)
    out = jax.device_get(eval_step(state, batch))
    assert out["sem_cls_prob"].shape[-1] == 27
    assert np.all(np.isfinite(out["sem_cls_prob"]))
