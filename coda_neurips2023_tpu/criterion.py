"""Set-prediction criterion: device-side matcher + CoDA losses.

Re-design of /root/reference/criterion.py for TPU:
  * the Hungarian matcher runs ON DEVICE (ops/hungarian.py) instead of a
    per-sample scipy call on the host (criterion.py:59-80);
  * rotated gIoU for the matcher cost is the vectorized device kernel
    (ops/giou.py) instead of the Cython CPU roundtrip (criterion.py:1107);
  * the final + aux decoder layers are processed in ONE vmapped pass over the
    stacked layer axis instead of a python loop (criterion.py:1205-1215);
  * distributed semantics: the reference normalizes matched-sum losses by
    num_boxes = allreduce_mean(per-replica GT count) then DDP-averages the
    loss; under a batch-sharded global jit this is algebraically identical to
    dividing the global matched sum by the global GT count, which is what we
    compute -- no collectives needed in user code.  ONE exception:
    `loss_sem_cls_softmax_skip_none_gt_sample` -- the reference computes
    per-replica sum/(cnt_i*nq) and averages over replicas, while we compute
    global_sum/(global_cnt*nq).  The two agree exactly iff every replica has
    the same count of non-empty scenes; otherwise ours weights every
    non-empty scene equally while the reference up-weights scenes on replicas
    with fewer of them (bounded by max_i(cnt/R)/cnt_i over replicas; with
    bs 8/replica and SUN RGB-D's ~0.4% empty-scene rate the discrepancy is
    <1% of the loss on rare steps and zero on most).  Since round 5 the
    reference DDP formula IS the CLI default (SetCriterion.per_replica_norm,
    bitwise vs the replica-loop oracle, tests/test_losses_tail.py): a dp=8
    A/B at a 10% empty-scene stress rate (scripts/ab_loss_norm.py) measured
    up to 34.2% single-step divergence on this loss (1.65% on the total
    loss) under the global formula -- material enough that reference-exact
    wins; --if_global_batch_loss_norm opts back into the global formula.

Loss registry mirrors SetCriterion (criterion.py:135-168): every loss is
gated by `<name>_weight > 1e-32`; cardinality is log-only.  The losses active
in the shipped configs are implemented exactly; see each method's docstring
for the reference anchor.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from coda_neurips2023_tpu.ops.giou import generalized_box3d_iou
from coda_neurips2023_tpu.ops.hungarian import matcher_assignments

# losses never applied to aux (intermediate) decoder layers
# (reference single_output_forward, criterion.py:1124-1135)
_LAST_LAYER_ONLY = (
    "loss_contrastive",
    "loss_image_seen_class",
    "loss_batchwise_contrastive",
    "loss_3d_2d_region_embed",
    "loss_predicted_region_embed_l1_only_last_layer",
)


def huber_loss(error, delta: float = 1.0):
    """Reference utils/misc.py:25-36."""
    abs_error = jnp.abs(error)
    quadratic = jnp.minimum(abs_error, delta)
    linear = abs_error - quadratic
    return 0.5 * quadratic ** 2 + delta * linear


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """torchvision.ops.sigmoid_focal_loss semantics, reduction='none'."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def optax_sigmoid_ce(logits, labels):
    """Binary CE with logits (numerically stable)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _cross_entropy(logits, labels, class_weights=None):
    """torch F.cross_entropy(reduction='none') semantics: w[y] * nll."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        nll = nll * class_weights[labels]
    return nll


def _gather_per_prop(x, per_prop_gt_inds):
    """gather GT-side (B, ngt, ...) tensors to proposal side (B, nprop, ...)."""
    idx = per_prop_gt_inds
    while idx.ndim < x.ndim:
        idx = idx[..., None]
    return jnp.take_along_axis(x, jnp.broadcast_to(idx, idx.shape[:2] + x.shape[2:]), axis=1)


class Matcher:
    """Cost construction per reference criterion.py:26-58."""

    def __init__(self, cost_class, cost_objectness, cost_giou, cost_center):
        self.cost_class = cost_class
        self.cost_objectness = cost_objectness
        self.cost_giou = cost_giou
        self.cost_center = cost_center

    def __call__(self, outputs, targets):
        sem_cls_prob = outputs["sem_cls_prob"]  # (B, nq, n_fg)
        ngt = targets["gt_box_sem_cls_label"].shape[1]
        gt_labels = targets["gt_box_sem_cls_label"].astype(jnp.int32)  # (B, ngt)
        class_mat = -jnp.take_along_axis(
            sem_cls_prob, gt_labels[:, None, :], axis=2
        )  # (B, nq, ngt)
        objectness_mat = -outputs["objectness_prob"][..., None]
        center_mat = jax.lax.stop_gradient(outputs["center_dist"])
        giou_mat = -jax.lax.stop_gradient(outputs["gious"])
        cost = (
            self.cost_class * class_mat
            + self.cost_objectness * objectness_mat
            + self.cost_center * center_mat
            + self.cost_giou * giou_mat
        )
        return matcher_assignments(cost, targets["nactual_gt"])


class SetCriterion:
    def __init__(
        self,
        matcher: Matcher,
        dataset_config,
        loss_weight_dict: dict,
        train_range_max: int = 10,
        confidence_type: str = "non-confidence",
        per_replica_norm: int = 0,
    ):
        self.matcher = matcher
        self.dataset_config = dataset_config
        self.loss_weight_dict = dict(loss_weight_dict)
        self.confidence_type = confidence_type
        self.train_range_max = train_range_max
        # --if_per_replica_loss_norm: reproduce the reference's DDP semantics
        # for loss_sem_cls_softmax_skip_none_gt_sample BITWISE -- per-replica
        # sum/(cnt_r*nq+1e-32), averaged over the R contiguous batch shards --
        # instead of the default global_sum/(global_cnt*nq) (module docstring
        # deviation note).  0/1 keeps the global formula.
        self.per_replica_norm = int(per_replica_norm)
        # per-class CE weights: bg (last) gets loss_no_object_weight
        n = dataset_config.num_semcls + 1
        w = np.ones(n, np.float32)
        w[-1] = self.loss_weight_dict.pop("loss_no_object_weight", 0.2)
        self.semcls_percls_weights = jnp.asarray(w)
        w2 = np.ones(train_range_max + 1, np.float32)
        w2[-1] = self.loss_weight_dict.pop("loss_no_object_contrast_weight", 0.2)
        self.seen_semcls_percls_weights = jnp.asarray(w2)

        # registry mirrors SetCriterion.loss_functions (criterion.py:135-168);
        # entries are weight-gated, so unused ones cost nothing.
        self.loss_functions = {
            "loss_sem_cls": self.loss_sem_cls,
            "loss_sem_cls_softmax": self.loss_sem_cls_softmax,
            "loss_sem_cls_softmax_skip_none_gt_sample": self.loss_sem_cls_softmax_skip_none_gt_sample,
            "loss_sem_cls_softmax_skip_none_gt_sample_en_discovery_objectness": self.loss_sem_cls_softmax_skip_none_gt_sample_en_discovery_objectness,
            "loss_sem_cls_softmax_skip_none_gt_sample_keep_discovery_objectness": self.loss_sem_cls_softmax_skip_none_gt_sample_keep_discovery_objectness,
            "loss_sem_cls_softmax_discovery_novel_objectness": self.loss_sem_cls_softmax_discovery_novel_objectness,
            "loss_sem_cls_softmax_2d_box_iou_supervised_skip_none_gt_sample": self.loss_sem_cls_softmax_2d_box_iou_supervised_skip_none_gt_sample,
            "loss_angle": self.loss_angle,
            "loss_center": self.loss_center,
            "loss_size": self.loss_size,
            "loss_giou": self.loss_giou,
            "loss_region_embed": self.loss_region_embed,
            "loss_predicted_region_embed_l1": self.loss_predicted_region_embed_l1,
            "loss_predicted_region_embed_l1_only_last_layer": self.loss_predicted_region_embed_l1,
            "loss_predicted_region_embed_cos": self.loss_predicted_region_embed_cos,
            "loss_feat_seen_softmax_weakly_loss_with_novel_cate_confi": self.loss_feat_seen_softmax_weakly_loss_with_novel_cate_confi,
            "loss_feat_seen_softmax_iou_match_weakly_loss_with_novel_cate_confi": self.loss_feat_seen_softmax_iou_match_weakly_loss_with_novel_cate_confi,
            "loss_contrast_object_text": self.loss_contrast_object_text,
            "loss_image_seen_class": self.loss_image_seen_class,
            "loss_contrastive": self.loss_contrastive,
            "loss_sem_focal_cls": self.loss_sem_focal_cls,
            "loss_feat_seen_sigmoid_loss": self.loss_feat_seen_sigmoid_loss,
            "loss_feat_seen_sigmoid_with_full_image_loss": self.loss_feat_seen_sigmoid_with_full_image_loss,
            "loss_feat_seen_softmax_loss": self.loss_feat_seen_softmax_loss,
            "loss_feat_seen_softmax_weakly_loss": self.loss_feat_seen_softmax_weakly_loss,
            "loss_feat_seen_softmax_loss_with_novel_cate_confi": self.loss_feat_seen_softmax_loss_with_novel_cate_confi,
            "loss_batchwise_contrastive": self.loss_batchwise_contrastive,
            "loss_prompt_softmax": self.loss_prompt_softmax,
            "loss_prompt_sigmoid": self.loss_prompt_sigmoid,
        }

    # ---------------- individual losses ----------------

    def loss_cardinality(self, outputs, targets, assignments):
        """Log-only (criterion.py:170-180)."""
        pred_logits = outputs["sem_cls_logits"]
        pred_objects = jnp.sum(
            jnp.argmax(pred_logits, -1) != pred_logits.shape[-1] - 1, axis=1
        )
        return jnp.mean(
            jnp.abs(pred_objects.astype(jnp.float32) - targets["nactual_gt"].astype(jnp.float32))
        )

    def loss_sem_cls_softmax(self, outputs, targets, assignments):
        """criterion.py:182-219 (vectorized form, torch CE 'mean' with class
        weights = weighted sum / sum of selected weights)."""
        pred_logits = outputs["sem_cls_logits"]
        bg = pred_logits.shape[-1] - 1
        gt_label = _gather_per_prop(
            targets["gt_box_sem_cls_label"].astype(jnp.int32), assignments["per_prop_gt_inds"]
        )
        gt_label = jnp.where(
            assignments["proposal_matched_mask"] > 0, gt_label, bg
        )
        nll = _cross_entropy(pred_logits, gt_label, self.semcls_percls_weights)
        wsum = jnp.sum(self.semcls_percls_weights[gt_label])
        loss = jnp.sum(nll) / jnp.maximum(wsum, 1e-32)
        return loss

    def loss_sem_cls_softmax_skip_none_gt_sample(self, outputs, targets, assignments):
        """criterion.py:221-248: per-sample skip of no-GT scenes; normalize by
        (#scenes-with-objects * nprop).  With per_replica_norm=R the reference
        DDP formula is reproduced exactly: torch computes the normalizer from
        the REPLICA-local cnt (criterion.py:235-244) and DDP averages the R
        losses (engine.py:152-153); batch rows are sharded contiguously over
        the dp mesh (parallel/mesh.py shard_batch), so replica r owns rows
        [r*B/R, (r+1)*B/R)."""
        pred_logits = outputs["sem_cls_logits"]
        bg = pred_logits.shape[-1] - 1
        gt_label = _gather_per_prop(
            targets["gt_box_sem_cls_label"].astype(jnp.int32), assignments["per_prop_gt_inds"]
        )
        gt_label = jnp.where(assignments["proposal_matched_mask"] > 0, gt_label, bg)
        nll = _cross_entropy(pred_logits, gt_label, self.semcls_percls_weights)  # (B, nq)
        has_obj = (targets["nactual_gt"] > 0).astype(nll.dtype)  # (B,)
        per_sample = jnp.sum(nll, axis=1) * has_obj
        r = self.per_replica_norm
        if r > 1 and per_sample.shape[0] % r == 0:
            sums = jnp.sum(per_sample.reshape(r, -1), axis=1)  # (R,)
            cnts = jnp.sum(has_obj.reshape(r, -1), axis=1)  # (R,)
            return jnp.mean(sums / (cnts * nll.shape[1] + 1e-32))
        cnt = jnp.sum(has_obj)
        return jnp.sum(per_sample) / (cnt * nll.shape[1] + 1e-32)

    def loss_sem_cls(self, outputs, targets, assignments):
        """Focal variant (criterion.py:388-406)."""
        pred_logits = outputs["sem_cls_logits"]
        bg = pred_logits.shape[-1] - 1
        gt_label = _gather_per_prop(
            targets["gt_box_sem_cls_label"].astype(jnp.int32), assignments["per_prop_gt_inds"]
        )
        gt_label = jnp.where(assignments["proposal_matched_mask"] > 0, gt_label, bg)
        onehot = jax.nn.one_hot(gt_label, pred_logits.shape[-1], dtype=pred_logits.dtype)
        return jnp.mean(sigmoid_focal_loss(pred_logits, onehot))

    def loss_sem_cls_softmax_skip_none_gt_sample_en_discovery_objectness(
        self, outputs, targets, assignments
    ):
        """criterion.py:276-330: like skip_none_gt_sample but proposals marked
        as discovered novel objects get class 0, and scenes count as non-empty
        when they have discoveries."""
        pred_logits = outputs["sem_cls_logits"]
        bg = pred_logits.shape[-1] - 1
        gt_label = _gather_per_prop(
            targets["gt_box_sem_cls_label"].astype(jnp.int32), assignments["per_prop_gt_inds"]
        )
        gt_label = jnp.where(assignments["proposal_matched_mask"] > 0, gt_label, bg)
        disc = targets.get("discovery_novel")
        if disc is not None:
            gt_label = jnp.where(disc > 0, 0, gt_label)
        nll = _cross_entropy(pred_logits, gt_label, self.semcls_percls_weights)
        n_disc = jnp.sum(disc, axis=1) if disc is not None else 0.0
        has_obj = ((targets["nactual_gt"] + n_disc) > 0).astype(nll.dtype)
        per_sample = jnp.sum(nll, axis=1) * has_obj
        return jnp.sum(per_sample) / (jnp.sum(has_obj) * nll.shape[1] + 1e-32)

    def loss_sem_cls_softmax_skip_none_gt_sample_keep_discovery_objectness(
        self, outputs, targets, assignments
    ):
        """criterion.py:316-350: unlike the `en_` variant, discovered novels
        are NOT relabeled -- their loss weight is zeroed ("do not supervise
        novel boxes").  The normalizer is the SUM of surviving loss weights
        over scenes that have real GT objects (not cnt*nq), and the
        empty-scene gate looks at `num_obj` ONLY (a scene with discoveries but
        no GT contributes nothing)."""
        pred_logits = outputs["sem_cls_logits"]
        bg = pred_logits.shape[-1] - 1
        gt_label = _gather_per_prop(
            targets["gt_box_sem_cls_label"].astype(jnp.int32), assignments["per_prop_gt_inds"]
        )
        gt_label = jnp.where(assignments["proposal_matched_mask"] > 0, gt_label, bg)
        nll = _cross_entropy(pred_logits, gt_label, self.semcls_percls_weights)  # (B, nq)
        disc = targets.get("discovery_novel")
        w = jnp.ones_like(nll)
        if disc is not None:
            w = jnp.where(disc > 0, 0.0, w)
        has_obj = (targets["nactual_gt"] > 0).astype(nll.dtype)  # (B,)
        per_sample = jnp.sum(nll * w, axis=1) * has_obj
        cnt = jnp.sum(jnp.sum(w, axis=1) * has_obj)
        return jnp.sum(per_sample) / (cnt + 1e-32)

    def loss_sem_cls_softmax_2d_box_iou_supervised_skip_none_gt_sample(
        self, outputs, targets, assignments
    ):
        """criterion.py:248-278: skip_none_gt_sample CE where proposals flagged
        by a 2D-IoU `novel_box_judge` signal get class 0, and scenes count as
        non-empty when they have any judged box.  The reference never produces
        `novel_box_judge` in shipped models (the key is read from the model's
        outputs when present, criterion.py:1202-1203); absent here it defaults
        to zeros, reducing to the plain skip_none_gt_sample loss."""
        pred_logits = outputs["sem_cls_logits"]
        bg = pred_logits.shape[-1] - 1
        gt_label = _gather_per_prop(
            targets["gt_box_sem_cls_label"].astype(jnp.int32), assignments["per_prop_gt_inds"]
        )
        gt_label = jnp.where(assignments["proposal_matched_mask"] > 0, gt_label, bg)
        judge = targets.get("novel_box_judge", outputs.get("novel_box_judge"))
        if judge is None:
            judge = jnp.zeros(gt_label.shape, jnp.float32)
        gt_label = jnp.where(judge > 0, 0, gt_label)
        nll = _cross_entropy(pred_logits, gt_label, self.semcls_percls_weights)
        n_judged = jnp.sum(judge, axis=1)
        has_obj = ((targets["nactual_gt"] + n_judged) > 0).astype(nll.dtype)
        per_sample = jnp.sum(nll, axis=1) * has_obj
        return jnp.sum(per_sample) / (jnp.sum(has_obj) * nll.shape[1] + 1e-32)

    def loss_sem_cls_softmax_discovery_novel_objectness(self, outputs, targets, assignments):
        """criterion.py:360-386: plain weighted-mean CE with discovered novels
        forced to class 0."""
        pred_logits = outputs["sem_cls_logits"]
        bg = pred_logits.shape[-1] - 1
        gt_label = _gather_per_prop(
            targets["gt_box_sem_cls_label"].astype(jnp.int32), assignments["per_prop_gt_inds"]
        )
        gt_label = jnp.where(assignments["proposal_matched_mask"] > 0, gt_label, bg)
        disc = targets.get("discovery_novel")
        if disc is not None:
            gt_label = jnp.where(disc > 0, 0, gt_label)
        nll = _cross_entropy(pred_logits, gt_label, self.semcls_percls_weights)
        wsum = jnp.sum(self.semcls_percls_weights[gt_label])
        return jnp.sum(nll) / jnp.maximum(wsum, 1e-32)

    def loss_image_seen_class(self, outputs, targets, assignments):
        """Image-level multi-label focal loss (criterion.py:408-430); needs a
        per-image seen-class score head (unwired model variants)."""
        pred = outputs.get("seen_class_scores_per_image")
        if pred is None:
            return jnp.float32(0.0)
        gt = targets["gt_image_class_label"].astype(pred.dtype)
        return jnp.mean(sigmoid_focal_loss(pred, gt))

    def loss_contrastive(self, outputs, targets, assignments):
        """Image<->text symmetric contrastive CE (criterion.py:454-471): used
        by prompt-training model variants that emit pooled text/image CLIP
        features; logit-scaled similarity, arange labels, (CE_i + CE_t)/2."""
        text = outputs.get("pooled_updated_text_features")
        image = outputs.get("image_features_clip")
        if text is None or image is None:
            return jnp.float32(0.0)
        scale = targets.get("logit_scale", jnp.float32(100.0))
        sim = scale * image @ text.T
        labels = jnp.arange(sim.shape[0])
        loss_i = jnp.mean(_cross_entropy(sim, labels))
        loss_t = jnp.mean(_cross_entropy(sim.T, labels))
        return (loss_i + loss_t) / 2.0

    def loss_sem_focal_cls(self, outputs, targets, assignments):
        """Sigmoid focal CE on a dedicated seen-class logits head
        (criterion.py:408-430 loss_sem_focal_cls): matched proposals take
        their seen label, unmatched the LAST class; mean reduction."""
        pred_logits = outputs.get("seen_sem_cls_logits")
        if pred_logits is None:
            return jnp.float32(0.0)
        gt_label = _gather_per_prop(
            targets["gt_box_seen_sem_cls_label"].astype(jnp.int32),
            assignments["per_prop_gt_inds"],
        )
        bg = pred_logits.shape[-1] - 1
        gt_label = jnp.where(assignments["proposal_matched_mask"] > 0, gt_label, bg)
        onehot = jax.nn.one_hot(
            jnp.clip(gt_label, 0, bg), pred_logits.shape[-1], dtype=pred_logits.dtype
        )
        return jnp.mean(sigmoid_focal_loss(pred_logits, onehot))

    def loss_feat_seen_sigmoid_loss(self, outputs, targets, assignments):
        """Sigmoid-focal seen-class loss on UNNORMALIZED query/text
        correlations (criterion.py:479-510): matched rows supervise all C
        classes (one-hot at the seen label), unmatched rows supervise only the
        first train_range_max classes toward 0 (the reference hardcodes 10);
        denominator = n_matched*C + n_unmatched*train_range_max."""
        emb = outputs["text_correlation_embedding"]  # NOT normalized, no scale
        text = targets["text_features_clip"].astype(jnp.float32)
        corr = jnp.einsum("bqc,kc->bqk", emb, text)
        ncls = corr.shape[-1]
        gt_label = _gather_per_prop(
            targets["gt_box_seen_sem_cls_label"].astype(jnp.int32),
            assignments["per_prop_gt_inds"],
        )
        matched = assignments["proposal_matched_mask"] > 0
        # unmatched -> out-of-range class => all-zero one-hot row
        gt_label = jnp.where(matched, gt_label, ncls)
        onehot = jax.nn.one_hot(gt_label, ncls + 1, dtype=corr.dtype)[..., :-1]
        loss = sigmoid_focal_loss(corr, onehot)
        n_seen = min(self.train_range_max, ncls)
        neg = jnp.concatenate(
            [jnp.ones((n_seen,), corr.dtype), jnp.zeros((ncls - n_seen,), corr.dtype)]
        )
        w = jnp.where(matched[..., None], jnp.ones_like(loss), neg)
        all_num = (
            jnp.sum(matched) * ncls + jnp.sum(~matched) * n_seen
        ).astype(corr.dtype)
        return jnp.sum(loss * w) / jnp.maximum(all_num, 1e-32)

    def loss_feat_seen_sigmoid_with_full_image_loss(self, outputs, targets, assignments):
        """Full-image-conditioned sigmoid-focal seen loss
        (criterion.py:780-808): the text bank's first train_range_max rows are
        modulated elementwise by the CLIP embedding of the whole image; mean
        focal reduction."""
        full = targets.get("full_image_embedding")
        if full is None:
            return jnp.float32(0.0)
        emb = outputs["text_correlation_embedding"]
        text = targets["text_features_clip"].astype(jnp.float32)
        n_seen = min(self.train_range_max, text.shape[0])
        text = text[:n_seen][None] * full[:, None, :]  # (B, n_seen, 512)
        corr = jnp.einsum("bqc,bkc->bqk", emb, text)
        gt_label = _gather_per_prop(
            targets["gt_box_seen_sem_cls_label"].astype(jnp.int32),
            assignments["per_prop_gt_inds"],
        )
        gt_label = jnp.where(assignments["proposal_matched_mask"] > 0, gt_label, n_seen)
        onehot = jax.nn.one_hot(gt_label, n_seen + 1, dtype=corr.dtype)[..., :-1]
        return jnp.mean(sigmoid_focal_loss(corr, onehot))

    def loss_region_embed(self, outputs, targets, assignments):
        """Matched-pair embedding L1 (criterion.py:902-922)."""
        gt_emb = _gather_per_prop(
            targets["gt_text_correlation_embedding"], assignments["per_prop_gt_inds"]
        )
        pred = outputs["text_correlation_embedding"]
        w = assignments["proposal_matched_mask"][..., None]
        ave = pred.shape[0] * pred.shape[2]
        return jnp.sum(jnp.abs(pred * w / ave - gt_emb * w / ave))

    def loss_predicted_region_embed_cos(self, outputs, targets, assignments):
        """Cosine variant of the distillation loss (criterion.py:995-1013)."""
        gt_emb = targets["gt_text_correlation_embedding"]
        mask = targets["gt_text_correlation_embedding_mask"]
        pred = outputs["text_correlation_embedding"]
        num = jnp.sum(gt_emb * pred, axis=-1)
        den = jnp.maximum(
            jnp.linalg.norm(gt_emb, axis=-1) * jnp.linalg.norm(pred, axis=-1), 1e-16
        )
        cos_loss = 1.0 - num / den
        return jnp.sum(cos_loss * mask[..., 0]) / jnp.maximum(jnp.sum(mask), 1e-32)

    def loss_feat_seen_softmax_iou_match_weakly_loss_with_novel_cate_confi(
        self, outputs, targets, assignments
    ):
        """criterion.py:648-700: weak labels/confidences only (no matched
        override)."""
        emb = outputs["text_correlation_embedding"]
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-32)
        text = targets["text_features_clip"].astype(jnp.float32)
        logits = jnp.einsum("bqc,kc->bqk", emb, text) * targets["logit_scale"]
        gt_label = targets["weak_box_cate_label"].astype(jnp.int32)
        confi = targets["weak_confidence_weight"]
        nll = _cross_entropy(logits, gt_label)
        return jnp.sum(nll * confi) / (jnp.sum(confi > 1e-32) + 1e-32)

    def loss_angle(self, outputs, targets, assignments):
        """criterion.py:834-900: CE over angle bins + huber(residual), matched
        only, normalized by global num_boxes."""
        angle_logits = outputs["angle_logits"]
        angle_residual = outputs["angle_residual_normalized"]
        num_bin = self.dataset_config.num_angle_bin
        gt_angle_label = _gather_per_prop(
            targets["gt_angle_class_label"].astype(jnp.int32), assignments["per_prop_gt_inds"]
        )
        gt_residual_norm = _gather_per_prop(
            targets["gt_angle_residual_label"] / (np.pi / num_bin),
            assignments["per_prop_gt_inds"],
        )
        mask = assignments["proposal_matched_mask"]
        cls_loss = jnp.sum(_cross_entropy(angle_logits, gt_angle_label) * mask)
        res_for_gt = jnp.take_along_axis(angle_residual, gt_angle_label[..., None], -1)[..., 0]
        reg_loss = jnp.sum(huber_loss(res_for_gt - gt_residual_norm, 1.0) * mask)
        nb = targets["num_boxes"]
        return {"loss_angle_cls": cls_loss / nb, "loss_angle_reg": reg_loss / nb}

    def loss_center(self, outputs, targets, assignments):
        """criterion.py:1015-1040."""
        center_dist = outputs["center_dist"]
        sel = jnp.take_along_axis(
            center_dist, assignments["per_prop_gt_inds"][..., None], axis=2
        )[..., 0]
        return jnp.sum(sel * assignments["proposal_matched_mask"]) / targets["num_boxes"]

    def loss_size(self, outputs, targets, assignments):
        """criterion.py:1065-1100."""
        gt_sizes = _gather_per_prop(
            targets["gt_box_sizes_normalized"], assignments["per_prop_gt_inds"]
        )
        l1 = jnp.sum(jnp.abs(outputs["size_normalized"] - gt_sizes), axis=-1)
        return jnp.sum(l1 * assignments["proposal_matched_mask"]) / targets["num_boxes"]

    def loss_giou(self, outputs, targets, assignments):
        """criterion.py:1042-1063."""
        giou_dist = 1.0 - outputs["gious"]
        sel = jnp.take_along_axis(
            giou_dist, assignments["per_prop_gt_inds"][..., None], axis=2
        )[..., 0]
        return jnp.sum(sel * assignments["proposal_matched_mask"]) / targets["num_boxes"]

    def loss_predicted_region_embed_l1(self, outputs, targets, assignments):
        """Stage-1 distillation loss (criterion.py:924-947): masked L1 between
        the predicted 512-d embedding and the CLIP crop embedding of the
        predicted box, normalized by (#valid crops * 512)."""
        gt_emb = targets["gt_text_correlation_embedding"]  # (B, nq, 512)
        mask = targets["gt_text_correlation_embedding_mask"]  # (B, nq, 1)
        pred = outputs["text_correlation_embedding"]
        ave_weight = jnp.sum(mask) * pred.shape[-1]
        l1 = jnp.sum(jnp.abs(pred * mask - gt_emb * mask))
        return l1 / jnp.maximum(ave_weight, 1e-32)

    def loss_feat_seen_softmax_weakly_loss_with_novel_cate_confi(
        self, outputs, targets, assignments
    ):
        """Stage-2 discovery-driven classification (criterion.py:599-646):
        CE of query-embedding/text-bank logits against seen labels (matched
        proposals) or CLIP weak labels (unmatched), confidence-weighted."""
        emb = outputs["text_correlation_embedding"]
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-32)
        text = targets["text_features_clip"].astype(jnp.float32)  # (ncls, 512)
        logits = jnp.einsum("bqc,kc->bqk", emb, text) * targets["logit_scale"]

        seen_label = _gather_per_prop(
            targets["gt_box_seen_sem_cls_label"].astype(jnp.int32),
            assignments["per_prop_gt_inds"],
        )
        seen_confi = _gather_per_prop(
            targets["gt_box_seen_sem_cls_confi"], assignments["per_prop_gt_inds"]
        )
        matched = assignments["proposal_matched_mask"] > 0
        gt_label = jnp.where(matched, seen_label, targets["weak_box_cate_label"].astype(jnp.int32))
        confi = jnp.where(matched, seen_confi, targets["weak_confidence_weight"])
        if self.confidence_type == "non-confidence":
            confi = jnp.where(confi > 1e-16, 1.0, confi)
        nll = _cross_entropy(logits, gt_label)
        denom = jnp.sum(confi > 1e-32) + 1e-32
        return jnp.sum(nll * confi) / denom

    def loss_contrast_object_text(self, outputs, targets, assignments):
        """Object<->text contrastive CE over seen classes (criterion.py:432-452):
        matched proposals take their seen class, unmatched take the LAST text
        class as background; CE 'mean' with the bg-weighted seen weights."""
        emb = outputs["text_correlation_embedding"]
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-32)
        text = targets["text_features_clip"].astype(jnp.float32)
        logits = jnp.einsum("bqc,kc->bqk", emb, text) * targets["logit_scale"]
        bg = logits.shape[-1] - 1
        gt_label = _gather_per_prop(
            targets["gt_box_seen_sem_cls_label"].astype(jnp.int32),
            assignments["per_prop_gt_inds"],
        )
        gt_label = jnp.where(assignments["proposal_matched_mask"] > 0, gt_label, bg)
        gt_label = jnp.clip(gt_label, 0, bg)
        w = self.seen_semcls_percls_weights
        wsel = w[jnp.clip(gt_label, 0, w.shape[0] - 1)]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, gt_label[..., None], axis=-1)[..., 0] * wsel
        return jnp.sum(nll) / jnp.maximum(jnp.sum(wsel), 1e-32)

    def _seen_logits(self, outputs, targets):
        emb = outputs["text_correlation_embedding"]
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-32)
        text = targets["text_features_clip"].astype(jnp.float32)
        return jnp.einsum("bqc,kc->bqk", emb, text) * targets["logit_scale"]

    def loss_feat_seen_softmax_loss(self, outputs, targets, assignments):
        """criterion.py:512-542: matched-only seen-class CE, weight 1 on
        matched rows; the reference normalizer is ``n_matched * nq``
        (``all_num = sum(matched) * loss.shape[-1]`` where the CE output is
        (B, nq)) -- NOT the matched count (live-parity-tested)."""
        logits = self._seen_logits(outputs, targets)
        seen_label = _gather_per_prop(
            targets["gt_box_seen_sem_cls_label"].astype(jnp.int32),
            assignments["per_prop_gt_inds"],
        )
        confi = assignments["proposal_matched_mask"]
        nll = _cross_entropy(logits, seen_label)
        nq = nll.shape[-1]
        return jnp.sum(nll * confi) / (jnp.sum(confi > 1e-32) * nq + 1e-32)

    def loss_feat_seen_softmax_weakly_loss(self, outputs, targets, assignments):
        """criterion.py:545-597: matched proposals take their seen label,
        the rest the CLIP weak label; the confidence map depends on
        ``confidence_type`` (ones / weak weights / objectness / average, with
        matched-and-labeled rows forced to 1.0 in the non-ones modes); seen
        labels of -1 (novel boxes) fall back to the weak label AFTER the
        confidence override mask is computed.  Normalizer = count of nonzero
        confidences.  Live-parity-tested per confidence type."""
        logits = self._seen_logits(outputs, targets)
        seen_label = _gather_per_prop(
            targets["gt_box_seen_sem_cls_label"].astype(jnp.int32),
            assignments["per_prop_gt_inds"],
        )
        weak_label = targets["weak_box_cate_label"].astype(jnp.int32)
        matched = assignments["proposal_matched_mask"] > 0
        gt_label = jnp.where(matched, seen_label, weak_label)
        override = jnp.logical_and(matched, gt_label != -1)
        if self.confidence_type == "clip-max-prob":
            confi = jnp.where(override, 1.0, targets["weak_confidence_weight"])
        elif self.confidence_type == "objectness":
            obj = jax.lax.stop_gradient(outputs["objectness_prob"])
            confi = jnp.where(override, 1.0, obj)
        elif self.confidence_type == "clip+objectness":
            obj = jax.lax.stop_gradient(outputs["objectness_prob"])
            mix = (obj + targets["weak_confidence_weight"]) / 2.0
            confi = jnp.where(override, 1.0, mix)
        else:  # "non-confidence"
            confi = jnp.ones(gt_label.shape, logits.dtype)
        gt_label = jnp.where(gt_label == -1, weak_label, gt_label)
        nll = _cross_entropy(logits, gt_label)
        return jnp.sum(nll * confi) / (jnp.sum(confi > 1e-32) + 1e-32)

    def loss_feat_seen_softmax_loss_with_novel_cate_confi(self, outputs, targets, assignments):
        """criterion.py:690-739: matched-only with per-box confidences (pseudo
        boxes carry their datalayer confidence)."""
        logits = self._seen_logits(outputs, targets)
        seen_label = _gather_per_prop(
            targets["gt_box_seen_sem_cls_label"].astype(jnp.int32),
            assignments["per_prop_gt_inds"],
        )
        seen_confi = _gather_per_prop(
            targets["gt_box_seen_sem_cls_confi"], assignments["per_prop_gt_inds"]
        )
        confi = jnp.where(assignments["proposal_matched_mask"] > 0, seen_confi, 0.0)
        nll = _cross_entropy(logits, seen_label)
        return jnp.sum(nll * confi) / (jnp.sum(confi > 1e-32) + 1e-16)

    def loss_batchwise_contrastive(self, outputs, targets, assignments):
        """CLIP-style symmetric InfoNCE between per-sample pooled image and
        text features (criterion.py:800-833); needs outputs from the unwired
        cross-encoder variants -- zero when absent."""
        text = outputs.get("pooled_updated_text_features")
        img = outputs.get("image_features_clip")
        if text is None or img is None:
            return jnp.float32(0.0)
        sim = targets["logit_scale"] * img @ text.T
        labels = jnp.arange(sim.shape[0])
        logp_i = jax.nn.log_softmax(sim, axis=-1)
        logp_t = jax.nn.log_softmax(sim.T, axis=-1)
        loss_i = -jnp.mean(jnp.take_along_axis(logp_i, labels[:, None], 1))
        loss_t = -jnp.mean(jnp.take_along_axis(logp_t, labels[:, None], 1))
        return (loss_i + loss_t) / 2.0

    def loss_prompt_softmax(self, outputs, targets, assignments):
        """Prompt-learning CE (criterion.py:762-781); prompt model outputs."""
        emb = outputs.get("prompt_text_correlation_embedding")
        if emb is None:
            return jnp.float32(0.0)
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-32)
        text = outputs["prompt_text_features_clip"]
        logits = jnp.einsum("bqc,bkc->bqk", emb, text)[:, 0, :]
        logits = logits * outputs["prompt_temperature_param"]
        nll = _cross_entropy(logits, targets["seen_classes"].astype(jnp.int32))
        return jnp.mean(nll)

    def loss_prompt_sigmoid(self, outputs, targets, assignments):
        """Prompt-learning focal variant (criterion.py:741-760)."""
        emb = outputs.get("prompt_text_correlation_embedding")
        if emb is None:
            return jnp.float32(0.0)
        text = outputs["prompt_text_features_clip"]
        logits = jnp.einsum("bqc,bkc->bqk", emb, text)[:, 0, :]
        onehot = jax.nn.one_hot(targets["seen_classes"].astype(jnp.int32), 10)
        return jnp.mean(sigmoid_focal_loss(logits, onehot)) + 0 * outputs[
            "prompt_temperature_param"
        ]

    # ---------------- assembly ----------------

    def _active_losses(self, last_layer: bool):
        names = []
        for name in self.loss_functions:
            wkey = name + "_weight"
            if name == "loss_angle":
                active = (
                    self.loss_weight_dict.get("loss_angle_cls_weight", 0) > 1e-32
                    or self.loss_weight_dict.get("loss_angle_reg_weight", 0) > 1e-32
                )
            else:
                active = self.loss_weight_dict.get(wkey, 0) > 1e-32
            if not active:
                continue
            if not last_layer and name in _LAST_LAYER_ONLY:
                continue
            names.append(name)
        return names

    def single_layer_losses(self, outputs, targets, last_layer: bool):
        """Losses for one decoder layer's outputs (reference
        single_output_forward, criterion.py:1102-1160)."""
        gious = generalized_box3d_iou(
            outputs["box_corners"],
            targets["gt_box_corners"],
            targets["nactual_gt"],
            rotated_boxes=bool(self.dataset_config.num_angle_bin > 1),
        )
        outputs = dict(outputs)
        outputs["gious"] = gious
        center_dist = jnp.sum(
            jnp.abs(
                outputs["center_normalized"][:, :, None, :]
                - targets["gt_box_centers_normalized"][:, None, :, :]
            ),
            axis=-1,
        )
        outputs["center_dist"] = center_dist
        assignments = self.matcher(outputs, targets)

        losses = {}
        for name in self._active_losses(last_layer):
            val = self.loss_functions[name](outputs, targets, assignments)
            if isinstance(val, dict):
                losses.update(val)
            else:
                losses[name] = val
        losses["loss_cardinality"] = self.loss_cardinality(outputs, targets, assignments)

        total = jnp.float32(0.0)
        for k, v in losses.items():
            wkey = k + "_weight"
            if wkey in self.loss_weight_dict and self.loss_weight_dict[wkey] > 1e-32:
                losses[k] = v * self.loss_weight_dict[wkey]
                total = total + losses[k]
        return total, losses, assignments

    def __call__(self, outputs_stacked: dict, targets: dict):
        """outputs_stacked: model dict with leading decoder-layer axis L.
        Returns (total_loss, loss_dict) like reference SetCriterion.forward
        (criterion.py:1162-1216); aux layer losses get `_k` suffixes.
        """
        targets = dict(targets)
        nactual_gt = jnp.sum(targets["gt_box_present"], axis=1).astype(jnp.int32)
        targets["nactual_gt"] = nactual_gt
        # global GT count (see module docstring for why this equals the
        # reference's allreduce-mean + DDP-average)
        targets["num_boxes"] = jnp.maximum(jnp.sum(nactual_gt).astype(jnp.float32), 1.0)

        num_layers = outputs_stacked["sem_cls_logits"].shape[0]
        layer_keys = [
            k
            for k, v in outputs_stacked.items()
            if hasattr(v, "ndim") and v.ndim > 0 and v.shape[0] == num_layers
            and k not in ("query_xyz", "enc_xyz", "enc_inds")
        ]

        def layer_outputs(l):
            return {k: outputs_stacked[k][l] for k in layer_keys}

        # aux layers in one vmapped pass
        if num_layers > 1:
            aux_stack = {k: outputs_stacked[k][:-1] for k in layer_keys}
            aux_fn = functools.partial(self._aux_layer, targets=targets)
            aux_totals, aux_losses = jax.vmap(aux_fn)(aux_stack)
        else:
            aux_totals, aux_losses = jnp.zeros((0,)), {}

        total, losses, _ = self.single_layer_losses(
            layer_outputs(num_layers - 1), targets, last_layer=True
        )
        total = total + jnp.sum(aux_totals)
        for k, v in aux_losses.items():
            for l in range(num_layers - 1):
                losses[f"{k}_{l}"] = v[l]
        return total, losses

    def _aux_layer(self, outputs, targets):
        total, losses, _ = self.single_layer_losses(outputs, targets, last_layer=False)
        return total, losses


def build_criterion(args, dataset_config, num_replicas: int = 1):
    """Reference criterion.py:1219-1310 (weights pulled from the same flags).
    `num_replicas` (the dp mesh size) only matters under
    --if_per_replica_loss_norm; see SetCriterion.per_replica_norm."""
    matcher = Matcher(
        cost_class=args.matcher_cls_cost,
        cost_giou=args.matcher_giou_cost,
        cost_center=args.matcher_center_cost,
        cost_objectness=args.matcher_objectness_cost,
    )
    def g(name, default=0.0):
        return getattr(args, name, default)

    loss_weight_dict = {
        "loss_giou_weight": args.loss_giou_weight,
        "loss_sem_cls_weight": g("loss_sem_cls_weight"),
        "loss_sem_cls_softmax_weight": args.loss_sem_cls_softmax_weight,
        "loss_sem_cls_softmax_skip_none_gt_sample_weight": args.loss_sem_cls_softmax_skip_none_gt_sample_weight,
        "loss_sem_cls_softmax_skip_none_gt_sample_en_discovery_objectness_weight": g(
            "loss_sem_cls_softmax_skip_none_gt_sample_en_discovery_objectness_weight"
        ),
        "loss_sem_cls_softmax_skip_none_gt_sample_keep_discovery_objectness_weight": g(
            "loss_sem_cls_softmax_skip_none_gt_sample_keep_discovery_objectness_weight"
        ),
        "loss_sem_cls_softmax_discovery_novel_objectness_weight": g(
            "loss_sem_cls_softmax_discovery_novel_objectness_weight"
        ),
        "loss_sem_cls_softmax_2d_box_iou_supervised_skip_none_gt_sample_weight": g(
            "loss_sem_cls_softmax_2d_box_iou_supervised_skip_none_gt_sample_weight"
        ),
        "loss_no_object_weight": args.loss_no_object_weight,
        "loss_no_object_contrast_weight": args.loss_no_object_contrast_weight,
        "loss_angle_cls_weight": args.loss_angle_cls_weight,
        "loss_angle_reg_weight": args.loss_angle_reg_weight,
        "loss_center_weight": args.loss_center_weight,
        "loss_size_weight": args.loss_size_weight,
        "loss_region_embed_weight": g("loss_region_embed_weight"),
        "loss_predicted_region_embed_l1_weight": args.loss_predicted_region_embed_l1_weight,
        "loss_predicted_region_embed_l1_only_last_layer_weight": g(
            "loss_predicted_region_embed_l1_only_last_layer_weight"
        ),
        "loss_predicted_region_embed_cos_weight": g("loss_predicted_region_embed_cos_weight"),
        "loss_feat_seen_softmax_weakly_loss_with_novel_cate_confi_weight": args.loss_feat_seen_softmax_weakly_loss_with_novel_cate_confi_weight,
        "loss_feat_seen_softmax_iou_match_weakly_loss_with_novel_cate_confi_weight": g(
            "loss_feat_seen_softmax_iou_match_weakly_loss_with_novel_cate_confi_weight"
        ),
        "loss_contrast_object_text_weight": args.loss_contrast_object_text,
        "loss_image_seen_class_weight": g("loss_image_seen_class_weight"),
    }
    # every registered loss accepts its --<name>_weight flag (reference
    # criterion.py:1219-1310 passes all of them); sweep the remainder so no
    # accepted flag is silently dropped
    for name in (
        "loss_contrastive",
        "loss_sem_focal_cls",
        "loss_feat_seen_sigmoid_loss",
        "loss_feat_seen_sigmoid_with_full_image_loss",
        "loss_feat_seen_softmax_loss",
        "loss_feat_seen_softmax_weakly_loss",
        "loss_feat_seen_softmax_loss_with_novel_cate_confi",
        "loss_batchwise_contrastive",
        "loss_prompt_softmax",
        "loss_prompt_sigmoid",
    ):
        loss_weight_dict.setdefault(name + "_weight", g(name + "_weight"))
    return SetCriterion(
        matcher,
        dataset_config,
        loss_weight_dict,
        train_range_max=args.train_range_max,
        confidence_type=args.confidence_type,
        per_replica_norm=(
            num_replicas
            if (getattr(args, "if_per_replica_loss_norm", True)
                and not getattr(args, "if_global_batch_loss_norm", False))
            else 0
        ),
    )
