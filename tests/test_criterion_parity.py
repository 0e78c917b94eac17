"""LIVE criterion parity: the reference torch SetCriterion + scipy Matcher
(/root/reference/criterion.py) run on CPU vs our device criterion, on the
SAME model outputs and targets, at the SHIPPED loss weights (parsed out of
/root/reference/scripts/coda_sunrgbd_stage{1,2}.sh so the tested config IS
the released recipe).

Covers in one shot: matcher cost construction + optimal assignment semantics,
rotated gIoU (reference torch.jit tensor path vs our pairs-last kernel),
every loss active in stage 1 and stage 2, the aux-decoder-layer weighting
(criterion.py:1106-1215), and the total-loss assembly.  The assignment is
the reference's scipy optimum; any loss mismatch beyond float noise fails.
"""

import importlib
import os
import re

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_import import REF, chdir, install_stubs, reference_available, restore

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(), reason="reference tree absent"),
]

B, NPTS, NQ, L = 4, 1024, 16, 3


def _script_floats(path):
    txt = open(path).read().replace("\\\n", " ")
    out = {}
    for m in re.finditer(r"--(\w+)\s+([0-9][0-9.eE+-]*)", txt):
        try:
            out[m.group(1)] = float(m.group(2))
        except ValueError:
            pass
    return out


def _make_args(stage: int):
    from coda_neurips2023_tpu.main import make_args_parser

    args = make_args_parser().parse_args([])
    weights = _script_floats(
        os.path.join(REF, "scripts", f"coda_sunrgbd_stage{stage}.sh")
    )
    for k, v in weights.items():
        if (k.startswith("loss_") or k.startswith("matcher_")) and hasattr(args, k):
            setattr(args, k, v)
    args.dataset_name = "sunrgbd_anonymous_aligned_image"
    args.if_use_v1 = True
    if stage == 2:
        args.confidence_type_in_datalayer = "weight_one"
    return args


def _model_outputs_and_targets():
    """One forward of a tiny flax model on a synthetic batch -> consistent
    (stacked outputs, numpy targets, stage extras)."""
    import jax
    import jax.numpy as jnp

    from coda_neurips2023_tpu.datasets.config import SunrgbdAnonymousConfig
    from coda_neurips2023_tpu.datasets.synthetic import (
        SyntheticDetectionDataset,
        collate,
    )
    from coda_neurips2023_tpu.models.model_3detr import CoDA3DETR

    cfg = SunrgbdAnonymousConfig()
    ds = SyntheticDetectionDataset(cfg, num_scenes=B, num_points=NPTS, seed=3)
    batch = collate([ds[i] for i in range(B)])
    model = CoDA3DETR(
        dataset_config=cfg, enc_dim=32, dec_dim=64, enc_nlayers=2, dec_nlayers=L,
        enc_ffn_dim=32, dec_ffn_dim=32, preenc_npoints=64, nqueries=NQ,
    )
    inputs = {
        "point_clouds": jnp.asarray(batch["point_clouds"]),
        "point_cloud_dims_min": jnp.asarray(batch["point_cloud_dims_min"]),
        "point_cloud_dims_max": jnp.asarray(batch["point_cloud_dims_max"]),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), inputs
    )
    outs = model.apply(variables, inputs, train=False)
    outs = {k: np.asarray(v) for k, v in outs.items()}

    rng = np.random.default_rng(5)
    extras = {
        # stage-1 distillation targets (B, nq, 512) + (B, nq, 1) mask
        "gt_text_correlation_embedding": rng.standard_normal(
            (B, NQ, 512)
        ).astype(np.float32),
        "gt_text_correlation_embedding_mask": (
            rng.uniform(size=(B, NQ, 1)) > 0.4
        ).astype(np.float32),
        # stage-2 weak labels against a 20-class bank
        "text_features_clip": None,  # filled below per-batch
        "weak_box_cate_label": rng.integers(0, 20, (B, NQ)).astype(np.int64),
        "weak_confidence_weight": rng.uniform(0.0, 1.0, (B, NQ)).astype(np.float32),
        "logit_scale": np.float32(51.3),
    }
    bank = rng.standard_normal((20, 512)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    extras["text_features_clip"] = np.broadcast_to(bank, (B, 20, 512)).copy()
    # seen labels must index into the 20-class bank
    batch["gt_box_seen_sem_cls_label"] = np.clip(
        batch["gt_box_seen_sem_cls_label"], 0, 19
    )
    return outs, {k: np.asarray(v) for k, v in batch.items()}, extras


def _ref_loss(args, outs, targets, extras):
    """Run the REFERENCE criterion (scipy matcher, torch losses) on CPU."""
    saved = install_stubs()
    try:
        ref_crit_mod = importlib.import_module("criterion")
        with chdir(REF):
            cfgmod = importlib.import_module(
                "datasets.sunrgbd_anonymous_aligned_image_with_novel_cate_confi"
            )
            ref_cfg = cfgmod.SunrgbdAnonymousAlignedImageDatasetConfigWithNovelCateConfi(
                if_print=False, args=args
            )
            criterion = ref_crit_mod.build_criterion(args, ref_cfg)

        def t(x, long=False):
            x = torch.from_numpy(np.asarray(x))
            return x.long() if long else x

        layer_keys = [
            "sem_cls_logits", "sem_cls_prob", "objectness_prob",
            "center_normalized", "center_unnormalized", "size_normalized",
            "size_unnormalized", "angle_logits", "angle_residual",
            "angle_residual_normalized", "angle_continuous", "box_corners",
            "box_corners_xyz", "text_correlation_embedding",
        ]

        def layer(l):
            d = {k: t(outs[k][l]) for k in layer_keys if k in outs}
            return d

        ref_outputs = {"outputs": layer(L - 1), "aux_outputs": [layer(l) for l in range(L - 1)]}
        ref_outputs["outputs"]["gt_text_correlation_embedding"] = t(
            extras["gt_text_correlation_embedding"]
        )
        ref_outputs["outputs"]["gt_text_correlation_embedding_mask"] = t(
            extras["gt_text_correlation_embedding_mask"]
        )
        ref_outputs["outputs"]["text_features_clip"] = t(extras["text_features_clip"])
        ref_outputs["outputs"]["logit_scale"] = t(extras["logit_scale"])
        ref_outputs["outputs"]["weak_box_cate_label"] = t(
            extras["weak_box_cate_label"], long=True
        )
        ref_outputs["outputs"]["weak_confidence_weight"] = t(
            extras["weak_confidence_weight"]
        )

        ref_targets = {
            k: t(v, long=(v.dtype == np.int64)) for k, v in targets.items()
        }
        with torch.no_grad():
            loss, loss_dict = criterion(ref_outputs, ref_targets)
        return float(loss), {k: float(v) for k, v in loss_dict.items()}
    finally:
        restore(saved)


def _our_loss(args, outs, targets, extras):
    import jax.numpy as jnp

    from coda_neurips2023_tpu.criterion import build_criterion
    from coda_neurips2023_tpu.datasets.config import SunrgbdAnonymousConfig

    criterion = build_criterion(args, SunrgbdAnonymousConfig())
    outs_j = {k: jnp.asarray(v) for k, v in outs.items()}
    tgt = {
        k: jnp.asarray(v)
        for k, v in targets.items()
        if k.startswith("gt_")
        or k in ("discovery_novel", "novel_box_judge", "full_image_embedding")
    }
    tgt["gt_text_correlation_embedding"] = jnp.asarray(
        extras["gt_text_correlation_embedding"]
    )
    tgt["gt_text_correlation_embedding_mask"] = jnp.asarray(
        extras["gt_text_correlation_embedding_mask"]
    )
    # ours takes the shared (K, C) bank; the reference broadcasts to (B, K, C)
    tgt["text_features_clip"] = jnp.asarray(extras["text_features_clip"][0])
    tgt["logit_scale"] = jnp.asarray(extras["logit_scale"])
    tgt["weak_box_cate_label"] = jnp.asarray(extras["weak_box_cate_label"])
    tgt["weak_confidence_weight"] = jnp.asarray(extras["weak_confidence_weight"])
    loss, loss_dict = criterion(outs_j, tgt)
    return float(loss), {k: float(v) for k, v in loss_dict.items()}


@pytest.fixture(scope="module")
def shared():
    return _model_outputs_and_targets()


@pytest.mark.parametrize("stage", [1, 2])
def test_criterion_matches_reference_at_shipped_weights(shared, stage):
    outs, targets, extras = shared
    args = _make_args(stage)
    ref_total, ref_dict = _ref_loss(args, outs, targets, extras)
    our_total, our_dict = _our_loss(args, outs, targets, extras)

    assert our_total == pytest.approx(ref_total, rel=2e-4, abs=2e-5), (
        f"stage {stage} total: ours {our_total} vs reference {ref_total}"
    )
    # every weighted loss the reference computed must agree by name
    checked = 0
    for k, v in ref_dict.items():
        if k not in our_dict:
            continue
        assert our_dict[k] == pytest.approx(v, rel=2e-4, abs=2e-5), (
            f"stage {stage} {k}: ours {our_dict[k]} vs reference {v}"
        )
        checked += 1
    assert checked >= 8, f"too few shared loss keys compared: {checked}"


@pytest.mark.parametrize("variant", ["keep", "en"])
def test_discovery_objectness_variants_match_reference(shared, variant):
    """The `en_` and `keep_` discovery-objectness CE variants differ materially
    in the reference (relabel-to-0 + cnt*nq normalizer vs zeroed loss weights +
    weight-sum normalizer, /root/reference/criterion.py:281-348); run each one
    against the reference on a batch with discovery-marked proposals AND one
    scene with zero GT boxes (the two variants gate that scene differently)."""
    outs, targets, extras = shared
    args = _make_args(2)
    for k in vars(args):
        if "discovery_objectness_weight" in k:
            setattr(args, k, 0.0)
    setattr(
        args,
        f"loss_sem_cls_softmax_skip_none_gt_sample_{variant}_discovery_objectness_weight",
        1.0,
    )
    args.loss_sem_cls_softmax_skip_none_gt_sample_weight = 0.0

    rng = np.random.default_rng(11)
    targets = {k: np.array(v, copy=True) for k, v in targets.items()}
    targets["discovery_novel"] = (rng.uniform(size=(B, NQ)) > 0.6).astype(np.int64)
    # scene 0: discoveries present but NO ground-truth objects -- the keep_
    # variant must drop it (num_obj gate), the en_ variant must count it
    targets["gt_box_present"][0] = 0  # nactual_gt is derived from this on both sides
    assert targets["discovery_novel"][0].sum() > 0

    ref_total, ref_dict = _ref_loss(args, outs, targets, extras)
    our_total, our_dict = _our_loss(args, outs, targets, extras)
    key = f"loss_sem_cls_softmax_skip_none_gt_sample_{variant}_discovery_objectness"
    assert key in ref_dict and key in our_dict
    assert our_dict[key] == pytest.approx(ref_dict[key], rel=2e-4, abs=2e-5), (
        f"{variant}: ours {our_dict[key]} vs reference {ref_dict[key]}"
    )
    assert our_total == pytest.approx(ref_total, rel=2e-4, abs=2e-5)


# registry losses NOT active in the shipped stage-1/2 recipes (those are
# covered above): turned on ONE AT A TIME at weight 1.0 against the live
# reference criterion.  Together with the shipped-config tests this pins the
# semantics of every loss the rebuild's registry exposes
# (/root/reference/criterion.py:135-168 loss_functions).
_UNSHIPPED_SWEEP = [
    "loss_sem_cls_weight",
    "loss_sem_cls_softmax_weight",
    "loss_giou_weight",
    "loss_sem_cls_softmax_discovery_novel_objectness_weight",
    "loss_sem_cls_softmax_2d_box_iou_supervised_skip_none_gt_sample_weight",
    "loss_predicted_region_embed_cos_weight",
    "loss_contrastive_weight",
    "loss_feat_seen_sigmoid_loss_weight",
    "loss_feat_seen_sigmoid_with_full_image_loss_weight",
    "loss_feat_seen_softmax_loss_weight",
    "loss_feat_seen_softmax_weakly_loss_weight",
    "loss_feat_seen_softmax_loss_with_novel_cate_confi_weight",
    "loss_feat_seen_softmax_iou_match_weakly_loss_with_novel_cate_confi_weight",
    "loss_predicted_region_embed_l1_only_last_layer_weight",
]


@pytest.mark.parametrize("weight_key", _UNSHIPPED_SWEEP)
def test_unshipped_registry_losses_match_reference(shared, weight_key):
    outs, targets, extras = shared
    args = _make_args(2)
    # zero every loss, then enable just this one (keep the matcher costs and
    # the CE bg class weights -- they are criterion ctor inputs, not losses)
    for k in vars(args):
        if (
            k.startswith("loss_")
            and k.endswith("_weight")
            and "no_object" not in k
        ):
            setattr(args, k, 0.0)
    setattr(args, weight_key, 1.0)

    targets = {k: np.array(v, copy=True) for k, v in targets.items()}
    rng = np.random.default_rng(11)
    if "discovery" in weight_key:
        targets["discovery_novel"] = (
            rng.uniform(size=(B, NQ)) > 0.6
        ).astype(np.int64)
    if "2d_box_iou_supervised" in weight_key:
        # the 2D-IoU judge signal (reference reads targets['novel_box_judge'];
        # produced by the image-supervised variants): some positives, and
        # scene 0 has judged boxes but no GT -- exercises the has-object gate
        targets["novel_box_judge"] = (
            rng.uniform(size=(B, NQ)) > 0.7
        ).astype(np.float32)
        targets["gt_box_present"][0] = 0
    if "full_image" in weight_key:
        targets["full_image_embedding"] = rng.standard_normal(
            (B, 512)
        ).astype(np.float32)

    if weight_key == "loss_contrastive_weight":
        # the reference's loss_contrastive is DEAD CODE: it reads
        # self.logit_scale, whose every definition is commented out
        # (/root/reference/criterion.py:118-122, 458) -- enabling the weight
        # crashes the reference itself.  Pin that brokenness; our
        # implementation (criterion.py loss_contrastive) follows the evident
        # intent (CLIP-style symmetric CE) and is exercised for finiteness.
        # (it KeyErrors first on 'pooled_updated_text_features', an output no
        # wired model produces; with that injected it would still hit the
        # undefined self.logit_scale)
        with pytest.raises((AttributeError, KeyError),
                           match="logit_scale|pooled_updated_text_features"):
            _ref_loss(args, outs, targets, extras)
        # ours stays runnable: the pooled text/image features come only from
        # unwired prompt-training variants, so the loss evaluates to 0 here
        our_total, our_dict = _our_loss(args, outs, targets, extras)
        assert np.isfinite(our_dict["loss_contrastive"])
        return

    ref_total, ref_dict = _ref_loss(args, outs, targets, extras)
    our_total, our_dict = _our_loss(args, outs, targets, extras)
    key = weight_key[: -len("_weight")]
    ref_keys = [k for k in ref_dict if k.startswith(key)]
    assert ref_keys, f"reference computed nothing for {key}: {list(ref_dict)}"
    for k in ref_keys:
        assert k in our_dict, f"{k} missing from our loss dict {list(our_dict)}"
        assert our_dict[k] == pytest.approx(ref_dict[k], rel=2e-4, abs=2e-5), (
            f"{k}: ours {our_dict[k]} vs reference {ref_dict[k]}"
        )
    assert our_total == pytest.approx(ref_total, rel=2e-4, abs=2e-5)


@pytest.mark.parametrize(
    "confidence_type",
    ["non-confidence", "clip-max-prob", "objectness", "clip+objectness"],
)
def test_weakly_loss_confidence_types_match_reference(shared, confidence_type):
    """loss_feat_seen_softmax_weakly_loss's confidence map has four modes
    (/root/reference/criterion.py:561-575), and seen labels of -1 (novel
    boxes) fall back to the weak label AFTER the confidence override mask is
    built -- inject some -1 labels so that ordering is actually tested."""
    outs, targets, extras = shared
    args = _make_args(2)
    for k in vars(args):
        if k.startswith("loss_") and k.endswith("_weight") and "no_object" not in k:
            setattr(args, k, 0.0)
    args.loss_feat_seen_softmax_weakly_loss_weight = 1.0
    args.confidence_type = confidence_type

    rng = np.random.default_rng(13)
    targets = {k: np.array(v, copy=True) for k, v in targets.items()}
    lab = targets["gt_box_seen_sem_cls_label"]
    lab[rng.uniform(size=lab.shape) > 0.7] = -1  # novel-marked seen labels

    ref_total, ref_dict = _ref_loss(args, outs, targets, extras)
    our_total, our_dict = _our_loss(args, outs, targets, extras)
    k = "loss_feat_seen_softmax_weakly_loss"
    assert our_dict[k] == pytest.approx(ref_dict[k], rel=2e-4, abs=2e-5), (
        f"{confidence_type}: ours {our_dict[k]} vs reference {ref_dict[k]}"
    )
    assert our_total == pytest.approx(ref_total, rel=2e-4, abs=2e-5)
