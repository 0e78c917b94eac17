"""Resume the skip_none_gt normalizer A/B (VERDICT r4 #7) from a completed
`global` arm: run ONLY the per-replica arm, then compare against the stored
metrics.jsonl/final_eval.pkl of the global arm.

Use after a crash/timeout killed the second arm of scripts/ab_loss_norm.py
(the arms are independent given identical seeds, so re-running one is sound).

Usage: timeout 3000 python scripts/ab_loss_norm_resume.py --outdir /tmp/ab4
"""

import argparse
import faulthandler
import json
import os
import pickle
import shutil
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# if this run wedges again, dump all-thread stacks before the watchdog window
faulthandler.dump_traceback_later(2400, exit=False)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, jax.devices()

from ab_loss_norm import BASE_FLAGS, run_once, series  # noqa: E402


def main():
    cli = argparse.ArgumentParser()
    cli.add_argument("--empty-rate", type=float, default=0.10)
    cli.add_argument("--outdir", default="/tmp/ab4")
    a = cli.parse_args()

    gdir = os.path.join(a.outdir, "global")
    assert os.path.exists(os.path.join(gdir, "final_eval.pkl")), (
        "global arm incomplete; run scripts/ab_loss_norm.py instead"
    )
    # wipe the partial per_replica arm so metrics.jsonl starts clean
    pdir = os.path.join(a.outdir, "per_replica")
    if os.path.exists(pdir):
        shutil.rmtree(pdir)

    p_steps, p_final = run_once("per_replica", True, a.empty_rate, a.outdir)

    g_steps = []
    with open(os.path.join(gdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if any(k.startswith("Train_details/") for k in rec):
                g_steps.append(rec)
    with open(os.path.join(gdir, "final_eval.pkl"), "rb") as f:
        g_final = pickle.load(f)

    import numpy as np

    for key in ("Train_details/loss",
                "Train_details/loss_sem_cls_softmax_skip_none_gt_sample"):
        gs, ps = series(g_steps, key), series(p_steps, key)
        n = min(len(gs), len(ps))
        if n == 0:
            print(f"[{key}] not logged")
            continue
        rel = [abs(gs[i] - ps[i]) / max(abs(gs[i]), 1e-9) for i in range(n)]
        print(f"[{key}] steps={n} max_rel_div={max(rel):.4%} "
              f"mean_rel_div={float(np.mean(rel)):.4%} "
              f"final global={gs[n-1]:.5f} per_replica={ps[n-1]:.5f}")

    def ap25(final):
        try:
            return {f"mAP@{t}": float(final[t]["mAP"]) for t in (0.25, 0.5)}
        except Exception:
            return final

    print("final eval (global):     ", ap25(g_final))
    print("final eval (per_replica):", ap25(p_final))


if __name__ == "__main__":
    main()
