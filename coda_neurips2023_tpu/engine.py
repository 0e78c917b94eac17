"""Train/eval engine.

Re-design of /root/reference/engine.py for single-controller JAX:
  * ONE jitted, mesh-sharded train step (forward + criterion + grad + AdamW
    update + BN stat update) replaces the reference's python step body with
    its device->host matcher/gIoU escapes, NCCL allreduce of the loss dict
    (engine.py:152-153) and DDP gradient allreduce;
  * the per-iteration warmup+cosine LR lives inside the optax schedule
    (optimizer.py) instead of mutating param groups per step
    (engine.py:33-55, 124);
  * non-finite loss aborts the run like engine.py:155-157;
  * evaluation jits the forward and streams (already-global) outputs to the
    host APCalculator -- no all_gather_dict (engine.py:2634-2636).
"""

from __future__ import annotations

import functools
import sys
import time
from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from coda_neurips2023_tpu.models.model_3detr import get_class_scores
from coda_neurips2023_tpu.parallel.mesh import batch_sharding, make_mesh, replicate, shard_batch
from coda_neurips2023_tpu.utils.ap_calculator import APCalculator
from coda_neurips2023_tpu.utils.misc import SmoothedValue


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    constants: Any
    opt_state: Any


def create_train_state(model, tx, rng, sample_inputs) -> TrainState:
    # jit the init: eager flax init dispatches thousands of tiny ops, which is
    # pathological through a remote-compile TPU backend
    init_fn = jax.jit(lambda r, b: model.init(r, b, train=False))
    variables = init_fn(rng, sample_inputs)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        constants=variables.get("constants", {}),
        opt_state=tx.init(params),
    )


# keys of the batch dict the criterion consumes as targets
_TARGET_KEYS = (
    "point_clouds",
    "gt_box_corners",
    "gt_box_centers_normalized",
    "gt_box_sizes_normalized",
    "gt_box_angles",
    "gt_angle_class_label",
    "gt_angle_residual_label",
    "gt_box_sem_cls_label",
    "gt_box_present",
    "gt_box_seen_sem_cls_label",
    "gt_box_seen_sem_cls_confi",
    # produced by the phase-A targets jit in two-phase stage training
    "gt_text_correlation_embedding",
    "gt_text_correlation_embedding_mask",
    "weak_box_cate_label",
    "weak_confidence_weight",
    "discovery_novel",
)


_DISCOVERY_OUTPUT_KEYS = (
    "box_corners",
    "box_corners_xyz",
    "center_unnormalized",
    "size_unnormalized",
    "angle_continuous",
    "objectness_prob",
)


def make_train_step(
    model,
    criterion,
    tx,
    extra_targets_fn: Optional[Callable] = None,
    return_last_outputs: bool = False,
    criterion_consts: Optional[dict] = None,
    lr_schedule: Optional[Callable] = None,
):
    """Returns jit(state, batch, rng) -> (state, metrics[, last_outputs]).

    extra_targets_fn(outputs, batch, rng) -> dict may inject CLIP-dependent
    targets (text banks, distillation embeddings) into the criterion; stage-1
    and stage-2 paths use it (model_3detr.py get_predicted_box_clip_embedding*).
    With return_last_outputs, the jit also emits the last decoder layer's box
    quantities (stop-gradient) for the stage-2 discovery pass.

    The learning rate is a RUNTIME input: `batch["lr"]` if present (the epoch
    loop computes it from the possibly-reset epoch, reference engine.py:33-55 +
    main.py:568-573), else lr_schedule(state.step) (monotone fallback for
    benches/tests).  `tx` must produce unit-LR update directions
    (optimizer.build_optimizer).
    """

    def loss_fn(params, batch_stats, constants, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats, "constants": constants}
        outputs, mutated = model.apply(
            variables,
            batch,
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        targets = {k: batch[k] for k in _TARGET_KEYS if k in batch}
        if criterion_consts:
            targets.update(criterion_consts)
        if extra_targets_fn is not None:
            targets.update(extra_targets_fn(outputs, batch, rng))
        loss, loss_dict = criterion(outputs, targets)
        last = {}
        if return_last_outputs:
            last = {
                k: jax.lax.stop_gradient(outputs[k][-1]) for k in _DISCOVERY_OUTPUT_KEYS
            }
        return loss, (loss_dict, mutated["batch_stats"], last)

    # donate the incoming state's buffers on accelerator backends: params +
    # AdamW moments double-buffer otherwise (2x their HBM) and XLA can update
    # in place.  Every call site immediately rebinds `state` to the output
    # (train_one_epoch, benches, stage steps).  CPU stays non-donating so
    # tests may reuse a state pytree across backend-shared calls.
    donate = () if jax.default_backend() == "cpu" else (0,)

    @functools.partial(jax.jit, donate_argnums=donate)
    def train_step(state: TrainState, batch: dict, rng):
        batch = dict(batch)
        lr = batch.pop("lr", None)
        if lr is None:
            if lr_schedule is None:
                raise ValueError(
                    "no learning rate: pass batch['lr'] or lr_schedule="
                )
            lr = lr_schedule(state.step)
        lr = jnp.asarray(lr, jnp.float32)
        rng = jax.random.fold_in(rng, state.step)
        (loss, (loss_dict, new_stats, last)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, state.constants, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        # unit-LR directions from tx; apply -lr here (runtime LR input)
        updates = jax.tree.map(lambda u: (-lr).astype(u.dtype) * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        metrics = {"loss": loss, "lr": lr, **loss_dict}
        if return_last_outputs:
            return new_state, metrics, last
        return new_state, metrics

    return train_step


def make_eval_step(
    model,
    eval_text_features=None,
    eval_logit_scale: float = 100.0,
    clip_crop_fn: Optional[Callable] = None,
    eval_layer_id: int = -1,
):
    """Returns jit(state, batch) -> outputs for the APCalculator.

    With `eval_text_features` (ncls, 512), classification goes through the
    distillation head's text-correlation path (reference get_class_scores,
    model_3detr.py:1742-1764) -- no CLIP forward at eval.  With
    `clip_crop_fn(outputs_last, batch)` instead, predicted boxes are cropped
    and CLIP-zero-shot classified (the baseline head's --if_with_clip eval,
    clip_to_class_training, model_3detr.py:557-900).  `eval_layer_id` selects
    which decoder layer's outputs are evaluated (reference --eval_layer_id,
    get_class_scores model_3detr.py:1747-1750; -1 = final).
    """

    @jax.jit
    def eval_step(state: TrainState, batch: dict):
        variables = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "constants": state.constants,
        }
        outputs = model.apply(variables, batch, train=False)
        last = {
            k: v[eval_layer_id]
            for k, v in outputs.items()
            if k not in ("query_xyz", "enc_xyz", "enc_inds")
        }
        if clip_crop_fn is not None:
            last["sem_cls_prob"] = clip_crop_fn(last, batch)
        elif eval_text_features is not None:
            last["sem_cls_prob"] = get_class_scores(
                last["text_correlation_embedding"],
                eval_text_features,
                jnp.float32(eval_logit_scale),
            )
        return {
            "box_corners": last["box_corners"],
            "sem_cls_prob": last["sem_cls_prob"],
            "objectness_prob": last["objectness_prob"],
            "center_unnormalized": last["center_unnormalized"],
            "size_unnormalized": last["size_unnormalized"],
            "angle_continuous": last["angle_continuous"],
        }

    return eval_step


def _local_rows(tree):
    """Materialize this process's batch rows of globally batch-sharded jit
    outputs as host numpy (multi-host only).  Addressable shards are deduped
    by their batch-row start (mp replicas repeat rows) and concatenated in
    row order."""
    def get(x):
        if getattr(x, "is_fully_addressable", True):
            return x
        by_start = {}
        for s in x.addressable_shards:
            start = s.index[0].start or 0
            by_start.setdefault(start, s)
        return np.concatenate(
            [np.asarray(by_start[k].data) for k in sorted(by_start)], axis=0
        )

    return jax.tree.map(get, tree)


def train_one_epoch(
    train_step,
    state: TrainState,
    batches,
    rng,
    mesh=None,
    logger=None,
    curr_epoch: int = 0,
    log_every: int = 10,
    discovery_fn: Optional[Callable] = None,
    profile_dir: Optional[str] = None,
    lr_fn: Optional[Callable] = None,
    all_epoch: Optional[int] = None,
):
    """Python epoch loop (reference train_one_epoch, engine.py:58-377).
    With discovery_fn (stage-2 save epochs), the step returns the last
    decoder layer's outputs and discovery_fn(last_outputs, host_batch) mines +
    writes pseudo labels.  With profile_dir, iterations 2-5 of the epoch are
    captured with jax.profiler (the reference only has wall-clock meters,
    engine.py:81-82).  lr_fn(it)->float feeds the per-iteration learning rate
    (reference adjust_learning_rate, engine.py:124: a function of the RESET
    epoch under stage 2's periodic epoch reset)."""
    iter_time = SmoothedValue(window_size=10)
    loss_avg = SmoothedValue(window_size=10)
    metrics_out = {}
    # losses awaiting the batched finiteness check: syncing float(loss) every
    # step would block dispatch on the full device step latency (plus the
    # host->device tunnel), idling the chip during host batch prep.  Keeping
    # the loss on device and draining the window every `log_every` iterations
    # keeps up to log_every steps in flight; the reference's per-step abort
    # (engine.py:155-157) still happens, at most log_every-1 steps late.
    pending_losses = []

    def _drain_pending():
        vals = [float(x) for x in pending_losses]
        pending_losses.clear()
        for v in vals:
            if not np.isfinite(v):
                print("Loss in not finite. Training will be stopped.")
                sys.exit(1)
            loss_avg.update(v)

    for it, host_batch in enumerate(batches):
        if profile_dir is not None and it == 2:
            jax.profiler.start_trace(profile_dir)
        if profile_dir is not None and it == 6:
            jax.profiler.stop_trace()
        t0 = time.perf_counter()
        batch = {k: v for k, v in host_batch.items() if not isinstance(v, list)}
        batch["curr_epoch"] = np.int32(curr_epoch)  # for epoch-gated paths
        # monotone epoch for gates that must NOT follow the stage-2 periodic
        # reset (keep-box begins at all_epoch==begin_keep_epoch,
        # reference main.py:355-358 vs the reset epoch fed to forward)
        batch["all_epoch"] = np.int32(curr_epoch if all_epoch is None else all_epoch)
        if lr_fn is not None:
            batch["lr"] = np.float32(lr_fn(it))
        if mesh is not None:
            scalars = {
                k: batch.pop(k) for k in ("curr_epoch", "all_epoch", "lr") if k in batch
            }
            batch = shard_batch(mesh, batch)
            batch.update(scalars)  # scalars replicate implicitly
        result = train_step(state, batch, rng)
        if len(result) == 3:
            state, metrics, last_outputs = result
            if discovery_fn is not None:
                if jax.process_count() > 1:
                    # multi-host: host_batch holds only this process's rows
                    # (each process owns its loader shard and writes only its
                    # own scans' pseudo files -- the reference's per-rank
                    # np.save, model_3detr.py:1506-1541); slice the global jit
                    # outputs down to the matching local rows
                    last_outputs = _local_rows(last_outputs)
                discovery_fn(last_outputs, host_batch)
        else:
            state, metrics = result
        pending_losses.append(metrics["loss"])
        iter_time.update(time.perf_counter() - t0)
        metrics_out = metrics
        if it % log_every == 0:
            _drain_pending()
            # reference engine.py:210-217 per-log_every status line
            mem = ""
            try:
                stats = jax.local_devices()[0].memory_stats()
                if stats:
                    mem = f"; mem {stats.get('bytes_in_use', 0) / 2**30:.2f}GiB"
            except Exception:
                pass
            print(
                f"Epoch [{curr_epoch}] iter [{it}] loss {loss_avg.avg:.4f} "
                f"iter_time {iter_time.avg * 1000:.0f}ms{mem}"
            )
            if logger is not None:
                logger.log_scalars(
                    {k: float(v) for k, v in metrics.items()},
                    int(state.step),
                    prefix="Train_details/",
                )
    _drain_pending()  # epoch tail: abort semantics cover every step
    return state, metrics_out


def evaluate(
    eval_step,
    state: TrainState,
    batches,
    dataset_config,
    mesh=None,
    class2type_map=None,
    exact_eval: bool = True,
    dataset_name: str = "sunrgbd",
) -> APCalculator:
    """Reference evaluate (engine.py:2553-2664): stream jitted outputs into
    the host AP meter; caller computes metrics.

    Multi-host (process_count>1): each process loads its own shard of the
    eval set; jit outputs are global jax.Arrays whose remote shards are not
    addressable here, so BOTH the outputs and the metered target keys are
    all-gathered per batch (multihost_utils.process_allgather) and every
    process meters the full global batch -- exactly the reference's
    per-batch all_gather_dict of outputs+targets (engine.py:2634-2636,
    utils/dist.py:164-186), so AP is identical on every rank.  Only the 4
    target keys step_meter consumes are gathered (the reference gathers the
    entire batch dict and comments on the memory cost)."""
    ap = APCalculator(
        dataset_config=dataset_config,
        ap_iou_thresh=[0.25, 0.5],
        class2type_map=class2type_map,
        exact_eval=exact_eval,
        dataset_name=dataset_name,
    )
    meter_keys = (
        "point_clouds", "gt_box_corners", "gt_box_sem_cls_label", "gt_box_present",
    )
    multihost = jax.process_count() > 1

    def _meter(outputs_dev, batch, pad_mask):
        if multihost:
            from jax.experimental import multihost_utils

            # global jit outputs: materialize the full array on every host
            # (tiled=True is REQUIRED for non-fully-addressable inputs -- it
            # reassembles the global value instead of stacking a process axis)
            outputs = jax.tree.map(
                np.asarray, multihost_utils.process_allgather(outputs_dev, tiled=True)
            )
            # host-local target rows: concatenate in process order, which is
            # the dp-mesh row order (make_mesh uses jax.devices(), sorted by
            # process index)
            gathered = multihost_utils.process_allgather(
                {k: np.asarray(batch[k]) for k in meter_keys}, tiled=True
            )
            batch = {k: np.asarray(v) for k, v in gathered.items()}
            if pad_mask is not None:
                pad_mask = np.asarray(
                    multihost_utils.process_allgather(np.asarray(pad_mask), tiled=True)
                )
        else:
            outputs = jax.device_get(outputs_dev)
            batch = {k: batch[k] for k in meter_keys if k in batch}
        if pad_mask is not None and not np.all(pad_mask):
            # tail batch padded to static shape by the loader: drop the
            # repeated rows before metering.  Boolean select (not a suffix
            # slice): after a multi-host gather each process's padding sits
            # inside the concatenation, not at the global end.
            mask = np.asarray(pad_mask, bool)
            outputs = {k: v[mask] for k, v in outputs.items()}
            batch = {k: v[mask] for k, v in batch.items()}
        ap.step_meter({"outputs": outputs}, batch)

    # one-deep pipeline: the jitted step for batch i+1 is DISPATCHED before
    # batch i's outputs are pulled to host, so the host-side NMS/AP metering
    # (the eval bottleneck after the device step, see BASELINE.md) overlaps
    # the device computing the next batch.  jax dispatch is async; device_get
    # of the previous outputs only waits on that step.  The reference meters
    # strictly serially (engine.py:2553-2664).
    pending = None
    for batch in batches:
        pad_mask = batch.get("pad_mask")
        device_batch = {
            k: v
            for k, v in batch.items()
            if not isinstance(v, list) and k != "pad_mask"
        }
        if mesh is not None:
            device_batch = shard_batch(mesh, device_batch)
        outputs_dev = eval_step(state, device_batch)
        # start the device->host transfer immediately so it overlaps BOTH the
        # previous batch's host metering and this batch's device step; the
        # later device_get then just collects finished buffers.  (Multi-host:
        # the per-batch process_allgather owns the transfer instead.)
        if not multihost:
            for leaf in jax.tree.leaves(outputs_dev):
                if hasattr(leaf, "copy_to_host_async"):
                    leaf.copy_to_host_async()
        if pending is not None:
            _meter(*pending)
        pending = (outputs_dev, batch, pad_mask)
    if pending is not None:
        _meter(*pending)
    print(f"evaluated {ap.scan_cnt} scans")
    return ap
