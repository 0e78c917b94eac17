"""Checkpoint save / resume (orbax + JSON sidecar), async by default.

Reference contract (/root/reference/utils/io.py:8-72 + main.py:423-460,
485-498, 568-603):
  * `checkpoint.pth`-equivalent every N epochs, `checkpoint_{epoch:04d}`
    separates, `checkpoint_best` on metric improvement, `last_checkpoint` at
    the end; payload = {model, optimizer, epoch, best_val_metrics};
  * resume restores weights + optimizer + epoch (`--set_epoch` overrides);
  * the reference falls back to strict=False on key mismatch -- orbax
    restore here uses the target-tree structure, and `restore_params_only`
    gives the same "weights only" escape hatch.

The TrainState pytree goes through orbax; {epoch, best_val_metrics} live in
a `meta.json` sidecar (the reference keeps them in the torch pickle).
Pseudo-label state intentionally lives OUTSIDE the checkpoint in per-scan
files, matching the reference (SURVEY.md section 5).

TPU-first: saves go through one process-wide `ocp.AsyncCheckpointer` -- the
filesystem commit runs on background threads while training continues (the
reference's torch.save blocks the train loop, main.py:485-498).  The
device->host snapshot happens in save()'s BLOCKING phase (orbax contract),
so the next train step may freely donate/overwrite the state buffers.  Orbax stages into a temp dir and renames on commit, so a
crash mid-save never corrupts the previous checkpoint.  Every read path
(`resume_if_possible`, `restore_params_only`, `load_checkpoint_tree`) and
process exit (atexit) first drains pending saves, so save-then-load within
one process stays race-free.
"""

from __future__ import annotations

import atexit
import json
import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

_ASYNC_CKPTR = None


def _ckptr() -> ocp.AsyncCheckpointer:
    """Process-wide AsyncCheckpointer (created lazily; its save() first waits
    for any still-running previous save, so back-to-back saves serialize)."""
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        atexit.register(wait_for_pending_saves)
    return _ASYNC_CKPTR


def wait_for_pending_saves():
    """Block until every async checkpoint commit has landed on disk."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def _ckpt_dir(checkpoint_dir: str, name: str) -> str:
    return os.path.abspath(os.path.join(checkpoint_dir, name))


def save_checkpoint(
    checkpoint_dir: str,
    state,
    epoch: int,
    best_val_metrics: Optional[dict] = None,
    filename: str = "checkpoint",
    block: bool = False,
):
    """Rank-0 save of state (+ epoch / best metrics sidecar).

    Async by default: returns as soon as the save is staged (device buffers
    snapshot without a host roundtrip); pass ``block=True`` (or call
    ``wait_for_pending_saves``) to force completion."""
    if jax.process_index() != 0:
        return
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = _ckpt_dir(checkpoint_dir, filename)
    ckptr = _ckptr()
    ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
    # the sidecar is tiny and independent of the orbax commit: write it now
    # so it can never be newer than the checkpoint it describes
    with open(path + ".meta.json", "w") as f:
        json.dump(
            {
                "epoch": int(epoch),
                "best_val_metrics": {
                    k: float(v) for k, v in (best_val_metrics or {}).items()
                },
            },
            f,
        )
    if block:
        ckptr.wait_until_finished()


def _load_meta(path: str):
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {"epoch": 0, "best_val_metrics": {}}


def resume_if_possible(checkpoint_dir: str, state, filename: str = "checkpoint"):
    """Returns (epoch, best_val_metrics, state). epoch = -1 if nothing found
    (caller starts at 0), matching resume_if_possible (io.py:33-58)."""
    wait_for_pending_saves()
    path = _ckpt_dir(checkpoint_dir, filename)
    if not checkpoint_dir or not os.path.isdir(path):
        return -1, {}, state
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, jax.device_get(state))
    meta = _load_meta(path)
    return int(meta["epoch"]), meta["best_val_metrics"], restored


def restore_params_only(checkpoint_path: str, state, model_args=None):
    """Weights-only restore (the reference's strict=False fallback +
    `--test_ckpt` load path, io.py:60-68 / main.py:908-909).

    Accepts either an orbax directory produced by this framework, or a
    reference `.pth` checkpoint (converted on the fly via
    utils/torch_convert.py)."""
    wait_for_pending_saves()
    if checkpoint_path.endswith(".pth") or checkpoint_path.endswith(".pt"):
        from coda_neurips2023_tpu.utils.torch_convert import load_reference_checkpoint

        kw = {}
        if model_args is not None:
            kw = dict(
                enc_nlayers=model_args.enc_nlayers,
                dec_nlayers=model_args.dec_nlayers,
                enc_nhead=model_args.enc_nhead,
                dec_nhead=model_args.dec_nhead,
            )
        params, stats, constants, _ = load_reference_checkpoint(checkpoint_path, **kw)
        import jax.numpy as jnp

        # the converted tree REPLACES state.params wholesale, so a shape
        # mismatch (e.g. a distillation-head .pth loaded into the baseline
        # build, or vice versa) must fail HERE with the key diff, not later
        # inside model.apply with a missing-collection error
        def _leaf_paths(tree):
            return {
                jax.tree_util.keystr(kp)
                for kp, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
            }

        want, got = _leaf_paths(state.params), _leaf_paths(params)
        if want != got:
            raise ValueError(
                f"checkpoint {checkpoint_path} does not match the built model: "
                f"missing={sorted(want - got)[:8]} unexpected={sorted(got - want)[:8]} "
                f"(is --model_name consistent with the checkpoint's head set?)"
            )
        merged_constants = jax.device_get(state.constants)
        for k, v in constants.items():
            merged_constants[k] = v
        return state.replace(
            params=jax.tree.map(jnp.asarray, params),
            batch_stats=jax.tree.map(jnp.asarray, stats),
            constants=jax.tree.map(jnp.asarray, merged_constants),
        )
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(checkpoint_path), jax.device_get(state))
    return state.replace(
        params=restored.params,
        batch_stats=restored.batch_stats,
        constants=restored.constants,
    )


def load_checkpoint_tree(checkpoint_dir: str, filename: str = "checkpoint"):
    """Load a checkpoint WITHOUT a target state (raw pytree + meta sidecar).
    Used by the torch exporter (utils/torch_convert.py) where no model
    instance exists."""
    wait_for_pending_saves()
    path = _ckpt_dir(checkpoint_dir, filename)
    if not os.path.isdir(path):
        raise FileNotFoundError(path)
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(path)
    return jax.device_get(tree), _load_meta(path)
