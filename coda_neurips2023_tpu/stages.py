"""Stage wiring: CLIP towers, text banks, distillation targets, discovery.

Glue between the flag surface and the jitted pipelines, mirroring what the
reference model ctor + forward do implicitly (model_3detr.py:147-520,
1767-1833):
  * stage 1 (coda_*_stage1.sh): loss_predicted_region_embed_l1 active ->
    the train step computes CLIP crop embeddings of predicted boxes
    (models/distillation.py) as criterion targets;
  * stage 2 (coda_*_stage2.sh): additionally the weakly-supervised
    classification loss (weak labels from CLIP) and, on save epochs, the
    novel-box discovery pass + pseudo-label writer (models/discovery.py).

Without a CLIP checkpoint on disk the towers fall back to a deterministic
random-weight CLIP (everything runs, numbers are meaningless) -- a loud
warning is printed once.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from coda_neurips2023_tpu.models.clip import CLIP, convert_openai_checkpoint
from coda_neurips2023_tpu.models.discovery import discover_novel_boxes, write_pseudo_labels
from coda_neurips2023_tpu.models.distillation import build_clip_distillation_targets
from coda_neurips2023_tpu.models.text_bank import build_text_banks


def _device_put_once(tree):
    """device_put for step-builder constants that must not DISTURB placement:
    leaves that are already jax Arrays (e.g. CLIP vars pre-sharded with the
    parallel/tp.py NamedShardings, or plain init outputs) stay exactly where
    they are; only host (numpy) leaves are transferred."""
    return jax.tree.map(
        lambda x: x if isinstance(x, jax.Array) else jax.device_put(x), tree
    )


def clip_tower_dtype(args):
    """Dtype for the frozen CLIP tower.  The reference runs CLIP fp16 on CUDA
    (convert_weights, CLIP/clip/model.py:1146); on v5e explicit bf16 measured
    SLOWER than fp32 end-to-end (507 vs 332 ms stage-1 step round 3; re-checked
    round 5 with stock attention after the fused-path regression was removed:
    422 vs 325 ms, same session, probe_ms ~25 both) -- fp32 matmuls already
    execute as bf16 MXU passes, and the bf16 HLO adds convert/relayout ops at
    the f32 crop/gate boundaries that outweigh the isolated tower win (80.7
    bf16 vs 93.0 fp32 ms/256 crops).  The default stays float32; --clip_dtype
    bf16 or --compute_dtype bf16 opts in."""
    bf16 = (
        getattr(args, "clip_dtype", "float32") in ("bf16", "bfloat16")
        or getattr(args, "compute_dtype", "float32") in ("bf16", "bfloat16")
    )
    return jnp.bfloat16 if bf16 else jnp.float32


class StageContext:
    def __init__(self, args, dataset_config, clip_model: Optional[CLIP] = None,
                 crop_size: int = 224):
        self.args = args
        self.crop_size = crop_size
        if clip_model is None:
            clip_model = CLIP(dtype=clip_tower_dtype(args))
        self.clip_model = clip_model
        self.clip_variables = None
        self.logit_scale = 100.0
        path = getattr(args, "clip_model_path", None)
        if path and os.path.exists(path):
            params = convert_openai_checkpoint(path)
            self.clip_variables = {"params": params}
            self.logit_scale = float(np.clip(np.exp(params["logit_scale"]), None, 100.0))
        else:
            print(
                "WARNING: CLIP checkpoint not found at %r -- using random CLIP "
                "weights (pipeline-validation mode only)" % (path,)
            )
            toks = jnp.zeros((1, self.clip_model.context_length), jnp.int32)
            imgs = jnp.zeros((1, crop_size, crop_size, 3), jnp.float32)
            self.clip_variables = self.clip_model.init(
                jax.random.PRNGKey(0), imgs, toks
            )
        if clip_tower_dtype(args) == jnp.bfloat16:
            # PURE-bf16 frozen tower: casting the params too (not just the
            # activations) removes the f32-LN convert/relayout chains that
            # made activations-only bf16 SLOWER in round 2 (BASELINE.md);
            # LN statistics stay f32 inside flax.  The tower is frozen, so
            # no optimizer-state precision concerns.
            self.clip_variables = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                self.clip_variables,
            )

        # real vocabularies (reference model_3detr.py:286-360): the LVIS-1204
        # superset when --if_clip_superset, the OV-3DETR cmp list always; the
        # name-list assets ship with the package (datasets/assets/), an
        # explicit --asset_dir overrides
        from coda_neurips2023_tpu.datasets.config import load_cmp_names, load_superset_names

        is_scannet = "scannet" in getattr(args, "dataset_name", "")
        asset_dir = getattr(args, "asset_dir", None)
        superset_names = (
            load_superset_names(asset_dir) if args.if_clip_superset else None
        )
        if args.if_clip_superset and superset_names is None:
            raise FileNotFoundError(
                "--if_clip_superset needs the LVIS name list (lvis_1204.npy) "
                "in --asset_dir or the packaged datasets/assets/"
            )
        cmp_names = load_cmp_names(asset_dir, scannet=is_scannet)
        seen_idx = getattr(dataset_config, "seen_vocab_idx", None) or None

        banks = build_text_banks(
            dataset_config,
            train_range_max=args.train_range_max,
            test_range_max=args.test_range_max,
            superset_names=superset_names,
            cmp_names=cmp_names,
            seen_idx=seen_idx,
            if_clip_more_prompts=args.if_clip_more_prompts,
            clip_model=self.clip_model,
            clip_variables=self.clip_variables,
            bpe_path=getattr(args, "clip_bpe_path", None),
        )
        self.superset_prompts = banks.pop("superset_prompts", None)
        self.text_banks = {k: jnp.asarray(v) for k, v in banks.items()}

        # frozen CLIP image tower as a pure function (closed over weights)
        variables = self.clip_variables
        model = self.clip_model

        def clip_image_fn(images):
            return jax.lax.stop_gradient(
                model.apply(variables, images, method=model.encode_image)
            )

        self.clip_image_fn = clip_image_fn

    # ------------------------------------------------------------ train glue

    @property
    def train_text_features(self):
        """Bank the criterion classifies against (superset when
        --if_clip_superset, else the seen slice; model_3detr.py:1786-1791)."""
        if self.args.if_clip_superset:
            return self.text_banks["superset"]
        return self.text_banks["train"][: self.args.train_range_max]

    def needs_distillation(self) -> bool:
        a = self.args
        return (
            a.loss_predicted_region_embed_l1_weight > 1e-32
            or a.loss_feat_seen_softmax_weakly_loss_with_novel_cate_confi_weight > 1e-32
            or a.loss_contrast_object_text > 1e-32
        )

    def _distillation_call(self, last, batch, rng, clip_fn, text_bank):
        """One shared call site for the distillation-target builder: all the
        epoch gates (keep-box on the MONOTONE all_epoch, reference
        main.py:355-358; objectness selection on the reset curr_epoch >= 540,
        model_3detr.py:990) and flag plumbing live here so the fused and
        two-phase step builders cannot diverge."""
        args = self.args
        if_keep_box = getattr(args, "if_keep_box", False)
        select_by_obj = getattr(args, "if_select_box_by_objectness", False)
        keep_enabled = False
        if if_keep_box:
            keep_enabled = batch.get(
                "all_epoch", batch.get("curr_epoch", jnp.int32(0))
            ) >= getattr(args, "begin_keep_epoch", 540)
        return build_clip_distillation_targets(
            jax.random.fold_in(rng, 7),
            last,
            batch,
            clip_fn,
            text_features=text_bank,
            logit_scale=jnp.float32(self.logit_scale),
            distillation_box_num=args.distillation_box_num,
            if_clip_weak_labels=args.if_clip_weak_labels,
            crop_size=self.crop_size,
            if_keep_box=if_keep_box,
            keep_objectness=getattr(args, "keep_objectness", 0.5),
            train_range_max=args.train_range_max,
            keep_enabled=keep_enabled,
            if_select_box_by_objectness=select_by_obj,
            objectness_select_enabled=(
                batch.get("curr_epoch", jnp.int32(0)) >= 540
                if select_by_obj else False
            ),
        )

    def extra_targets_fn(self):
        """(outputs, batch, rng) -> criterion targets, run INSIDE the jitted
        train step (like the reference forward)."""
        if not self.needs_distillation():
            return None
        text = self.train_text_features
        scale = jnp.float32(self.logit_scale)
        clip_fn = self.clip_image_fn
        clip_model = self.clip_model

        def fn(outputs, batch, rng):
            if "input_image" not in batch:
                return {}
            # fused single-jit path: CLIP weights/text bank arrive as traced
            # batch entries (closure-captured weights get baked into the HLO
            # as literals and overflow the compile service, HTTP 413)
            fn_clip = clip_fn
            fn_text = text
            if "_clip_vars" in batch:
                cv = batch["_clip_vars"]

                def fn_clip(images):
                    return jax.lax.stop_gradient(
                        clip_model.apply(cv, images, method=clip_model.encode_image)
                    )

                fn_text = batch.get("_text_bank", text)
            last = {k: v[-1] for k, v in outputs.items() if hasattr(v, "ndim")}
            targets = self._distillation_call(last, batch, rng, fn_clip, fn_text)
            targets["text_features_clip"] = fn_text
            targets["logit_scale"] = scale
            return targets

        return fn

    def make_fused_train_step(self, model, criterion, tx, return_last_outputs=False,
                              lr_schedule=None):
        """ONE jit: distillation targets computed inside the train step from
        the train-mode forward (exactly the reference forward's structure,
        model_3detr.py:902-1210).  CLIP weights and the text bank are fed as
        traced inputs through reserved batch keys so the HLO stays small;
        criterion_consts are NOT closed over either (the superset bank can be
        1201x512)."""
        from coda_neurips2023_tpu.engine import make_train_step

        train_step = make_train_step(
            model,
            criterion,
            tx,
            extra_targets_fn=self.extra_targets_fn(),
            return_last_outputs=return_last_outputs,
            criterion_consts=None,  # text bank arrives via _text_bank
            lr_schedule=lr_schedule,
        )
        clip_vars_device = _device_put_once(self.clip_variables)
        text_device = jax.device_put(self.train_text_features)
        scale = jnp.float32(self.logit_scale)

        def step(state, batch, rng):
            if "input_image" in batch:
                batch = {
                    **batch,
                    "_clip_vars": clip_vars_device,
                    "_text_bank": text_device,
                }
            return train_step(state, batch, rng)

        return step

    def make_clip_eval_step(self, model, bank: str = "test"):
        """Baseline-head eval step (--if_with_clip): crop every predicted box
        and CLIP-zero-shot classify (reference clip_to_class_training,
        model_3detr.py:557-900).  CLIP weights are jit ARGUMENTS (see
        make_targets_step for why)."""
        from coda_neurips2023_tpu.models.distillation import clip_crop_scores

        scale = jnp.float32(self.logit_scale)
        clip_model = self.clip_model
        crop = self.crop_size

        if_use_gt_box = getattr(self.args, "if_use_gt_box", False)
        if_expand_box = getattr(self.args, "if_expand_box", False)

        @jax.jit
        def impl(state, batch, clip_vars, text_bank):
            variables = {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "constants": state.constants,
            }
            outputs = model.apply(variables, batch, train=False)
            last = {
                k: v[-1]
                for k, v in outputs.items()
                if k not in ("query_xyz", "enc_xyz", "enc_inds")
            }
            if if_use_gt_box:
                # ceiling experiment (--if_use_gt_box, model_3detr.py:560-581):
                # classify GT boxes instead of predictions
                nq = last["objectness_prob"].shape[1]
                mo = batch["gt_box_corners"].shape[1]
                pad = max(nq - mo, 0)

                def pad_to_nq(x):
                    widths = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
                    return jnp.pad(x, widths)[:, :nq]

                last = dict(last)
                last["box_corners"] = pad_to_nq(batch["gt_box_corners"])
                last["box_corners_xyz"] = pad_to_nq(batch["gt_box_corners_xyz"])
                last["center_unnormalized"] = pad_to_nq(batch["gt_box_centers"])
                last["size_unnormalized"] = pad_to_nq(batch["gt_box_sizes"])
                last["angle_continuous"] = pad_to_nq(batch["gt_box_angles"])
                last["objectness_prob"] = pad_to_nq(batch["gt_box_present"])

            def clip_arg_fn(images):
                return jax.lax.stop_gradient(
                    clip_model.apply(clip_vars, images, method=clip_model.encode_image)
                )

            last["sem_cls_prob"] = clip_crop_scores(
                last, batch, clip_arg_fn, text_bank, scale, crop,
                expand_box=if_expand_box,
            )
            return {
                "box_corners": last["box_corners"],
                "sem_cls_prob": last["sem_cls_prob"],
                "objectness_prob": last["objectness_prob"],
                "center_unnormalized": last["center_unnormalized"],
                "size_unnormalized": last["size_unnormalized"],
                "angle_continuous": last["angle_continuous"],
            }

        clip_vars_device = _device_put_once(self.clip_variables)
        text = self.text_banks[bank]
        if getattr(self.args, "if_only_novel_prompt", False) and bank == "test":
            # --if_only_novel_prompt (reference model_3detr.py:1985, 2846):
            # zero-shot classify against ONLY the novel slice of the test
            # vocabulary (SUN RGB-D v1 rows 10:37); sem_cls_prob narrows to
            # 27 classes -- an analysis mode, caller arranges the eval config.
            # The reference slices the FULL vocab dict and hardcodes 27
            # output classes; with a test bank truncated below 37 rows the
            # slice would silently shrink, so fail loudly instead.
            if text.shape[0] < 37:
                raise ValueError(
                    "--if_only_novel_prompt needs a test text bank with >= 37 "
                    f"rows (the novel slice is vocab rows 10:37); got "
                    f"{text.shape[0]} -- raise --test_range_max to cover the "
                    "full vocabulary (reference model_3detr.py:1985)"
                )
            text = text[10:37]
        text_device = jax.device_put(text)

        def eval_step(state, batch):
            return impl(state, batch, clip_vars_device, text_device)

        return eval_step

    # ------------------------------------------------- two-phase train step

    def criterion_consts(self):
        return {
            "text_features_clip": self.train_text_features,
            "logit_scale": jnp.float32(self.logit_scale),
        }

    def make_targets_step(self, model):
        """Phase A of the two-phase stage training: a separate jit computing
        the CLIP distillation targets from a TRAIN-mode forward.  Splitting
        keeps each compiled graph small (the fused single-jit variant
        overwhelms compile servers).  The forward runs with train=True and the
        SAME dropout rng as phase B (both fold state.step into the step rng,
        engine.make_train_step), so the boxes that get cropped/CLIP-encoded
        here are exactly the boxes the train forward predicts -- matching the
        reference, which computes targets inside the one train forward
        (model_3detr.py:902-1210); the rng fold also redraws the per-sample
        distillation crop selection every step (reference np.random.choice per
        forward, model_3detr.py:997)."""
        text = self.train_text_features
        clip_model = self.clip_model

        # CLIP weights and the text bank are traced ARGUMENTS, not closures:
        # closed-over weights get baked into the HLO as literals (hundreds of
        # MB for ViT-B/16), which overflows the compile service's request
        # limit (HTTP 413).
        @jax.jit
        def targets_step_impl(state, batch, rng, clip_vars, text_bank):
            variables = {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "constants": state.constants,
            }
            # identical fold to engine.make_train_step -> same dropout masks
            # as the phase-B train forward; fresh selection rng every step
            rng = jax.random.fold_in(rng, state.step)
            outputs, _ = model.apply(
                variables,
                batch,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],  # discarded; phase B applies the update
            )
            last = {k: v[-1] for k, v in outputs.items() if hasattr(v, "ndim")}

            def clip_arg_fn(images):
                return jax.lax.stop_gradient(
                    clip_model.apply(clip_vars, images, method=clip_model.encode_image)
                )

            return self._distillation_call(last, batch, rng, clip_arg_fn, text_bank)

        clip_vars_device = _device_put_once(self.clip_variables)
        text_device = jax.device_put(text)

        def targets_step(state, batch, rng):
            return targets_step_impl(state, batch, rng, clip_vars_device, text_device)

        return targets_step

    def make_two_phase_train_step(self, model, criterion, tx, return_last_outputs=False,
                                  lr_schedule=None):
        """Python-level step: phase-A targets jit + phase-B train jit."""
        from coda_neurips2023_tpu.engine import make_train_step

        targets_step = self.make_targets_step(model)
        train_step = make_train_step(
            model,
            criterion,
            tx,
            extra_targets_fn=None,
            return_last_outputs=return_last_outputs,
            criterion_consts=self.criterion_consts(),
            lr_schedule=lr_schedule,
        )

        def step(state, batch, rng):
            if "input_image" in batch:
                targets = targets_step(state, batch, rng)
                batch = {**batch, **targets}
            return train_step(state, batch, rng)

        return step

    # -------------------------------------------------------- discovery glue

    def is_save_epoch(self, curr_epoch: int) -> bool:
        a = self.args
        return (
            a.online_nms_update_save_novel_label_clip_driven_with_cate_confidence
            and a.online_nms_update_save_epoch > 0
            and curr_epoch % a.online_nms_update_save_epoch == 0
        )

    def discovery_fn(self):
        args = self.args
        superset = (
            self.text_banks["superset"]
            if args.if_clip_superset
            else self.text_banks["test"]
        )
        scale = jnp.float32(self.logit_scale)
        clip_model = self.clip_model
        crop = self.crop_size

        @jax.jit
        def fn_impl(last_outputs, batch, clip_vars, text_bank):
            def clip_arg_fn(images):
                return jax.lax.stop_gradient(
                    clip_model.apply(clip_vars, images, method=clip_model.encode_image)
                )

            return discover_novel_boxes(
                last_outputs,
                batch,
                clip_arg_fn,
                text_bank,
                scale,
                train_range_max=args.train_range_max,
                save_objectness=args.save_objectness,
                clip_driven_keep_thres=args.clip_driven_keep_thres,
                crop_size=crop,
            )

        clip_vars_device = _device_put_once(self.clip_variables)
        text_device = jax.device_put(superset)

        def fn(last_outputs, batch):
            return fn_impl(last_outputs, batch, clip_vars_device, text_device)

        return fn

    def run_discovery_and_write(self, discovery, last_outputs, batch):
        """Host-side: jitted discovery + per-scan np.save
        (model_3detr.py:1506-1541)."""
        if "input_image" not in batch or "pseudo_box_path" not in batch:
            return 0
        out = discovery(last_outputs, {k: v for k, v in batch.items() if not isinstance(v, list)})
        info = np.asarray(out["save_box_info"])
        mask = np.asarray(out["novel_mask"])
        write_pseudo_labels(
            info,
            mask,
            batch["pseudo_box_path"],
            np.asarray(batch["gt_ori_box_num"]),
            accumulate=self.args.if_accumulate_former_pseudo_labels,
        )
        return int(mask.sum())
