"""Checkpoint save / resume (orbax).

Reference contract (/root/reference/utils/io.py:8-72 + main.py:423-460,
485-498, 568-603):
  * `checkpoint.pth`-equivalent every N epochs, `checkpoint_{epoch:04d}`
    separates, `checkpoint_best` on metric improvement, `last_checkpoint` at
    the end; payload = {model, optimizer, epoch, best_val_metrics};
  * resume restores weights + optimizer + epoch (`--set_epoch` overrides);
  * the reference falls back to strict=False on key mismatch -- orbax
    restore here uses the target-tree structure, and `restore_params_only`
    gives the same "weights only" escape hatch.

Pseudo-label state intentionally lives OUTSIDE the checkpoint in per-scan
files, matching the reference (SURVEY.md section 5).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(checkpoint_dir: str, name: str) -> str:
    return os.path.abspath(os.path.join(checkpoint_dir, name))


def save_checkpoint(
    checkpoint_dir: str,
    state,
    epoch: int,
    best_val_metrics: Optional[dict] = None,
    filename: str = "checkpoint",
):
    """Rank-0 save of {state, epoch, best_val_metrics}."""
    if jax.process_index() != 0:
        return
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = _ckpt_dir(checkpoint_dir, filename)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "state": jax.device_get(state),
        "meta": {
            "epoch": np.int64(epoch),
            "best_val_metrics": best_val_metrics or {},
        },
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def resume_if_possible(checkpoint_dir: str, state, filename: str = "checkpoint"):
    """Returns (epoch, best_val_metrics, state). epoch = -1 if nothing found
    (caller starts at 0), matching resume_if_possible (io.py:33-58)."""
    path = _ckpt_dir(checkpoint_dir, filename)
    if not checkpoint_dir or not os.path.isdir(path):
        return -1, {}, state
    ckptr = ocp.StandardCheckpointer()
    target = {
        "state": jax.device_get(state),
        "meta": {"epoch": np.int64(0), "best_val_metrics": {}},
    }
    restored = ckptr.restore(path, target)
    epoch = int(restored["meta"]["epoch"])
    best = restored["meta"]["best_val_metrics"]
    return epoch, best, restored["state"]


def restore_params_only(checkpoint_path: str, state):
    """Weights-only restore (the reference's strict=False fallback +
    `--test_ckpt` load path, io.py:60-68 / main.py:908-909)."""
    ckptr = ocp.StandardCheckpointer()
    target = {
        "state": jax.device_get(state),
        "meta": {"epoch": np.int64(0), "best_val_metrics": {}},
    }
    restored = ckptr.restore(os.path.abspath(checkpoint_path), target)
    st = restored["state"]
    return state.replace(
        params=st.params, batch_stats=st.batch_stats, constants=st.constants
    )
