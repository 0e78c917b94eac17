"""Shared problem definition for the multi-host tests: built identically by
the 2-process workers (tests/multihost_worker.py) and by the single-process
oracle (tests/test_multihost.py), so results are directly comparable.

Topology is held fixed at a 4-device "dp" mesh either way (2 procs x 2 local
devices vs 1 proc x 4 devices): GSPMD sees the same partitioning, so eval
outputs must agree to float precision and the AP metrics (host numpy either
way) must agree exactly.
"""

from __future__ import annotations

import numpy as np

LOCAL_DEVICES = 2  # per process in the 2-proc run; oracle uses 2*2=4 total
GLOBAL_DEVICES = 4
GLOBAL_BATCH = 4
N_EVAL_SCENES = 6  # -> one full batch + a padded tail batch of 2 real rows
N_POINTS = 512
TRAIN_STEPS = 2


def build_problem():
    """Model, criterion/optimizer, text bank, and GLOBAL data (identical in
    every process: the synthetic dataset is seed-deterministic)."""
    import types

    import jax

    from __graft_entry__ import _flagship
    from coda_neurips2023_tpu.criterion import Matcher, SetCriterion
    from coda_neurips2023_tpu.datasets.loader import make_loader
    from coda_neurips2023_tpu.datasets.synthetic import SyntheticDetectionDataset
    from coda_neurips2023_tpu.optimizer import build_optimizer

    model, cfg = _flagship(tiny=True)
    eval_ds = SyntheticDetectionDataset(cfg, num_scenes=N_EVAL_SCENES, num_points=N_POINTS)
    eval_batches = list(
        make_loader(eval_ds, GLOBAL_BATCH, shuffle=False, drop_last=False,
                    pad_last=True, num_workers=1)
    )
    train_ds = SyntheticDetectionDataset(
        cfg, num_scenes=GLOBAL_BATCH * TRAIN_STEPS, num_points=N_POINTS, seed=11
    )
    train_batches = list(
        make_loader(train_ds, GLOBAL_BATCH, shuffle=False, drop_last=True,
                    num_workers=1)
    )

    matcher = Matcher(cost_class=1, cost_objectness=5, cost_giou=3, cost_center=5)
    criterion = SetCriterion(
        matcher, cfg,
        {
            "loss_sem_cls_softmax_skip_none_gt_sample_weight": 1.0,
            "loss_no_object_weight": 0.05,
            "loss_no_object_contrast_weight": 0.05,
            "loss_center_weight": 5.0,
            "loss_size_weight": 1.0,
        },
    )
    opt_args = types.SimpleNamespace(
        base_lr=5e-4, warm_lr=1e-6, warm_lr_epochs=2, final_lr=1e-6,
        lr_scheduler="cosine", weight_decay=0.1, filter_biases_wd=False,
        clip_gradient=0.1, max_epoch=10,
    )
    tx, schedule = build_optimizer(opt_args, None, num_iters_per_epoch=10)

    rng = np.random.default_rng(3)
    bank = rng.standard_normal((cfg.num_semcls, 512)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    return {
        "model": model, "cfg": cfg, "criterion": criterion, "tx": tx,
        "schedule": schedule, "bank": bank,
        "eval_batches": eval_batches, "train_batches": train_batches,
    }


def _slice_rows(batch, rank, nprocs):
    """This process's rows of a GLOBAL batch (contiguous block: global row
    order is process-major, parallel/mesh.shard_batch)."""
    per = GLOBAL_BATCH // nprocs
    lo, hi = rank * per, (rank + 1) * per

    def cut(v):
        if isinstance(v, list):
            return v[lo:hi]
        v = np.asarray(v)
        return v[lo:hi] if v.ndim > 0 and v.shape[0] == GLOBAL_BATCH else v

    return {k: cut(v) for k, v in batch.items()}


def _scalars(metrics):
    out = {}
    for thr, ret in metrics.items():
        for k, v in ret.items():
            if isinstance(v, (int, float, np.floating)) and np.isfinite(float(v)):
                out[f"{float(thr)}/{k}"] = float(v)
    return out


def run_problem(problem, rank: int, nprocs: int) -> dict:
    """Eval AP metrics + train-epoch losses on a 4-device mesh; with
    nprocs > 1 each process feeds only its local batch rows."""
    import jax
    import jax.numpy as jnp

    from coda_neurips2023_tpu.engine import (
        create_train_state,
        evaluate,
        make_eval_step,
        make_train_step,
        train_one_epoch,
    )
    from coda_neurips2023_tpu.parallel.mesh import make_mesh, replicate

    model, cfg = problem["model"], problem["cfg"]
    mesh = make_mesh(GLOBAL_DEVICES)

    init_batch = {
        k: jnp.asarray(v)
        for k, v in problem["train_batches"][0].items()
        if not isinstance(v, list)
    }
    state = create_train_state(model, problem["tx"], jax.random.PRNGKey(0), init_batch)
    state = replicate(mesh, jax.device_get(state))

    eval_step = make_eval_step(model, eval_text_features=jnp.asarray(problem["bank"]))
    local_eval = [
        _slice_rows(b, rank, nprocs) if nprocs > 1 else b
        for b in problem["eval_batches"]
    ]
    ap = evaluate(eval_step, state, local_eval, cfg, mesh=mesh)
    metrics = _scalars(ap.compute_metrics())

    train_step = make_train_step(
        model, problem["criterion"], problem["tx"], lr_schedule=problem["schedule"]
    )
    local_train = [
        _slice_rows(b, rank, nprocs) if nprocs > 1 else b
        for b in problem["train_batches"]
    ]
    state, last_metrics = train_one_epoch(
        train_step, state, local_train, jax.random.PRNGKey(1), mesh=mesh,
        curr_epoch=0, log_every=1,
    )
    return {
        "scan_cnt": int(ap.scan_cnt),
        "eval_metrics": metrics,
        "final_loss": float(last_metrics["loss"]),
        "final_lr": float(last_metrics["lr"]),
    }
