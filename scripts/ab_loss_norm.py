"""A/B the `skip_none_gt` loss normalizer default (VERDICT r4 #7).

The reference (criterion.py:235-244 + DDP loss averaging engine.py:152-153)
computes loss_sem_cls_softmax_skip_none_gt_sample as
mean_over_replicas(per_replica_sum / (per_replica_nonempty_cnt * nq)); our
global jit computes global_sum / (global_nonempty_cnt * nq).  The formulas
agree exactly unless empty scenes land UNEVENLY across replicas.  This
script trains the tiny flagship twice on an 8-device CPU mesh (dp=8) over a
synthetic corpus with empty scenes injected, identical seeds/data, once per
normalizer, and reports:

  * per-step total-loss trajectories + their max relative divergence
  * the skip_none_gt loss series specifically
  * final AP25 on the synthetic eval split for both runs

Usage: timeout 3000 python scripts/ab_loss_norm.py [--empty-rate 0.1]
       (sets JAX_PLATFORMS=cpu + 8 virtual devices itself)
"""

import argparse
import json
import os
import sys

# sitecustomize pins JAX_PLATFORMS=axon at interpreter start, so a
# setdefault is a no-op -- hard-override BEFORE and AFTER jax import,
# exactly like tests/conftest.py
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, jax.devices()


BASE_FLAGS = [
    "--dataset_name", "synthetic",
    "--model_name", "3detr_predictedbox_distillation",
    "--enc_dim", "32",
    "--dec_dim", "64",
    "--enc_nlayers", "2",
    "--dec_nlayers", "2",
    "--enc_ffn_dim", "32",
    "--dec_ffn_dim", "32",
    "--preenc_npoints", "64",
    "--nqueries", "16",
    "--num_points", "256",
    "--batchsize_per_gpu", "2",  # global batch 16 over dp=8
    "--batchsize_per_gpu_test", "2",  # per-device (x8 mesh = 16 global)
    "--max_epoch", "6",
    "--matcher_cls_cost", "1",
    "--matcher_center_cost", "5",
    "--matcher_objectness_cost", "5",
    "--matcher_giou_cost", "3",
    "--loss_sem_cls_softmax_skip_none_gt_sample_weight", "1",
    "--loss_no_object_weight", "0.05",
    "--loss_giou_weight", "2",
    "--loss_center_weight", "5",
    "--synthetic_num_scenes", "128",
    "--ngpus", "8",  # dp=8 over the virtual CPU mesh (default is 1!)
    "--log_every", "1",
    "--eval_every_epoch", "100",  # skip cadence evals; final eval still runs
]


def run_once(tag: str, per_replica: bool, empty_rate: float, outdir: str):
    from coda_neurips2023_tpu.main import build_everything, do_train, make_args_parser

    ckpt = os.path.join(outdir, tag)
    os.makedirs(ckpt, exist_ok=True)
    flags = BASE_FLAGS + [
        "--checkpoint_dir", ckpt,
        "--synthetic_empty_scene_rate", str(empty_rate),
    ]
    if per_replica:
        flags.append("--if_per_replica_loss_norm")
    else:
        # per-replica is the shipped default since round 5; the global arm
        # must opt out explicitly
        flags.append("--if_global_batch_loss_norm")
    args = make_args_parser().parse_args(flags)
    ctx = build_everything(args)
    do_train(args, ctx)

    steps = []
    with open(os.path.join(ckpt, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if any(k.startswith("Train_details/") for k in rec):
                steps.append(rec)
    import pickle

    with open(os.path.join(ckpt, "final_eval.pkl"), "rb") as f:
        final = pickle.load(f)
    return steps, final


def series(steps, key):
    return [s[key] for s in steps if key in s]


def main():
    cli = argparse.ArgumentParser()
    cli.add_argument("--empty-rate", type=float, default=0.10,
                     help="empty-scene rate (0.10 stresses the deviation; "
                          "SUN RGB-D's real rate is ~0.004)")
    cli.add_argument("--outdir", default="/tmp/ab_loss_norm")
    a = cli.parse_args()

    g_steps, g_final = run_once("global", False, a.empty_rate, a.outdir)
    p_steps, p_final = run_once("per_replica", True, a.empty_rate, a.outdir)

    for key in ("Train_details/loss",
                "Train_details/loss_sem_cls_softmax_skip_none_gt_sample"):
        gs, ps = series(g_steps, key), series(p_steps, key)
        n = min(len(gs), len(ps))
        if n == 0:
            print(f"[{key}] not logged")
            continue
        rel = [abs(gs[i] - ps[i]) / max(abs(gs[i]), 1e-9) for i in range(n)]
        import numpy as np

        print(f"[{key}] steps={n} max_rel_div={max(rel):.4%} "
              f"mean_rel_div={float(np.mean(rel)):.4%} "
              f"final global={gs[n-1]:.5f} per_replica={ps[n-1]:.5f}")

    def ap25(final):
        # final_eval.pkl: {iou_thresh: {metric: value}}
        try:
            return {f"mAP@{t}": float(final[t]["mAP"]) for t in (0.25, 0.5)}
        except Exception:
            return final

    print("final eval (global):     ", ap25(g_final))
    print("final eval (per_replica):", ap25(p_final))


if __name__ == "__main__":
    main()
