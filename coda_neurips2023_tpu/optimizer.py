"""Optimizer + LR schedule.

Reference: AdamW with optional no-decay group for biases/1-D params
(/root/reference/optimizer.py:5-36) and a per-iteration warmup+cosine LR
schedule (/root/reference/engine.py:33-55):
  * warmup: lr = warm_lr + (base_lr - warm_lr) * epoch_frac / warm_lr_epochs
  * cosine: final_lr + 0.5*(base_lr - final_lr)*(1 + cos(pi * progress))
Gradient clipping to max L2 norm `clip_gradient` (0.1 in shipped configs,
engine.py:161-162) is folded into the optax chain.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def make_lr_schedule(args, num_iters_per_epoch: int, host: bool = False):
    """Per-iteration schedule matching engine.py:33-55.

    The reference computes LR per-iteration from `curr_iter / max_iters` where
    `curr_iter = curr_epoch * iters_per_epoch + batch_idx` and `curr_epoch` is
    the (possibly periodically RESET, main.py:568-573) epoch counter -- so
    stage 2 replays warmup+early-cosine every `reset_epoch_periodically`
    epochs.  Callers therefore pass the step as a function of the reset epoch,
    not of the monotone optimizer count.

    With host=True the schedule is pure python/math (for the per-iter host
    loop -- avoids a device roundtrip per iteration through the TPU tunnel).
    """
    max_iters = args.max_epoch * num_iters_per_epoch

    if host:
        def schedule(step):
            step = float(step)
            curr_epoch_f = step / num_iters_per_epoch
            # INCLUSIVE boundary, matching compute_learning_rate's
            # `curr_epoch_normalized <= warm_lr_epochs / max_epoch`
            # (engine.py:36): at step == warm_lr_epochs * iters_per_epoch the
            # reference still takes the warmup branch (= exactly base_lr)
            if args.warm_lr_epochs > 0 and curr_epoch_f <= args.warm_lr_epochs:
                return args.warm_lr + curr_epoch_f / args.warm_lr_epochs * (
                    args.base_lr - args.warm_lr
                )
            if args.lr_scheduler != "cosine":
                return args.base_lr
            progress = step / max_iters
            return args.final_lr + 0.5 * (args.base_lr - args.final_lr) * (
                1 + math.cos(math.pi * progress)
            )

        return schedule

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        curr_epoch_f = step / num_iters_per_epoch
        warm = args.warm_lr + curr_epoch_f / max(args.warm_lr_epochs, 1e-9) * (
            args.base_lr - args.warm_lr
        )
        progress = step / max_iters
        cos = args.final_lr + 0.5 * (args.base_lr - args.final_lr) * (
            1 + jnp.cos(jnp.pi * progress)
        )
        use_warm = jnp.logical_and(  # inclusive: see host schedule above
            args.warm_lr_epochs > 0, curr_epoch_f <= args.warm_lr_epochs
        )
        lr = jnp.where(use_warm, warm, cos)
        if args.lr_scheduler != "cosine":
            lr = jnp.where(use_warm, warm, args.base_lr)
        return lr

    return schedule


def build_optimizer(args, params, num_iters_per_epoch: int):
    """AdamW(+grad clip) with the reference's bias/1-D no-decay filter
    (optimizer.py:11-30, enabled by --filter_biases_wd).

    The returned transformation produces UNIT-LR update directions
    (scale_by_adam + decayed weights, sign not yet flipped by -lr): the train
    step multiplies by the current learning rate, which is a runtime input so
    stage 2's epoch-reset LR replay can feed LR per iteration without
    retracing (optax.adamw == chain(scale_by_adam, add_decayed_weights,
    scale_by_learning_rate))."""
    schedule = make_lr_schedule(args, num_iters_per_epoch)

    if getattr(args, "filter_biases_wd", False):
        def decay_mask(p):
            return jax.tree.map(lambda x: x.ndim > 1, p)

        wd = optax.add_decayed_weights(args.weight_decay, mask=decay_mask)
    else:
        wd = optax.add_decayed_weights(args.weight_decay)

    chain = [optax.scale_by_adam(), wd]
    if getattr(args, "clip_gradient", 0) and args.clip_gradient > 0:
        chain = [optax.clip_by_global_norm(args.clip_gradient)] + chain
    return optax.chain(*chain), schedule
