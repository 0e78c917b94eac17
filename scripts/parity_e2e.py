"""END-TO-END reference-vs-rebuild mAP equality: ONE number for the whole
parity chain.

Runs, from the SAME checkpoint (a random torch init by default, or a real
reference `.pth` via --ckpt):

  reference torch Model3DETRPredictedBoxDistillationHead forward
      -> reference parse_predictions / eval_det / APCalculator
  flax CoDA3DETR (convert_reference_state_dict)
      -> our utils/ap_calculator AP stack

over the same synthetic eval set, and prints both metric dicts plus the max
absolute delta across every scalar metric (mAP25/50, AR, per-bucket).  This
composes the previously separate parity pieces (full-trunk forward parity,
AP-stack parity) into one measured end-to-end equality -- the protocol of
/root/reference/test_release_models.sh + engine.py:2553-2664 minus the
licensed data: the moment released checkpoints / real scans are available,
point --ckpt (and a real dataset loader) at them and this harness IS the
release-model validation run.

Usage:
    python scripts/parity_e2e.py [--scenes 8] [--batch 4] [--ckpt model.pth]
                                 [--tol 5e-3]
Exit code 0 iff max delta <= --tol (default 5e-3: the AP protocol is
discrete, so rtol-2e-3 forward noise flips a couple of the ~500 boxes; see
--tol help).
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REF = "/root/reference"
B_DEFAULT, N_POINTS, PREENC, NQ = 8, 6000, 512, 64


def _make_args():
    from coda_neurips2023_tpu.main import make_args_parser

    args = make_args_parser().parse_args([])
    args.dataset_name = "sunrgbd_anonymous_aligned_image"
    args.if_use_v1 = True
    args.preenc_npoints = PREENC
    args.nqueries = NQ
    return args


def _synthetic_eval_set(num_scenes, batch_size, seed=17):
    """Batches with the AP-protocol target keys, from the same synthetic
    scene generator the data-free CLI uses."""
    from coda_neurips2023_tpu.datasets.config import SunrgbdAnonymousConfig
    from coda_neurips2023_tpu.datasets.loader import collate
    from coda_neurips2023_tpu.datasets.synthetic import SyntheticDetectionDataset

    cfg = SunrgbdAnonymousConfig()
    ds = SyntheticDetectionDataset(
        cfg, num_scenes=num_scenes, num_points=N_POINTS, seed=seed
    )
    batches = []
    for start in range(0, num_scenes, batch_size):
        samples = [ds[i] for i in range(start, min(start + batch_size, num_scenes))]
        batches.append(collate(samples))
    return cfg, batches


def _run_reference(args, batches, ckpt_sd=None):
    """Reference torch model forward + reference AP stack.  Returns
    (state_dict numpy, text bank numpy, metrics dict)."""
    import torch

    from tests.ref_import import chdir, install_stubs, restore

    saved = install_stubs()
    try:
        mod = importlib.import_module("models.model_3detr")
        apc_mod = importlib.import_module("utils.ap_calculator")
        with chdir(REF):
            cfgmod = importlib.import_module(
                "datasets.sunrgbd_anonymous_aligned_image_with_novel_cate_confi"
            )
            ref_cfg = cfgmod.SunrgbdAnonymousAlignedImageDatasetConfigWithNovelCateConfi(
                if_print=False, args=args
            )
            torch.manual_seed(0)
            ref_model = mod.Model3DETRPredictedBoxDistillationHead(
                mod.build_preencoder(args), mod.build_encoder(args),
                mod.build_decoder(args), ref_cfg,
                encoder_dim=args.enc_dim, decoder_dim=args.dec_dim,
                mlp_dropout=args.mlp_dropout, num_queries=args.nqueries,
                if_with_clip_train=False, args=args,
            )
        ref_model.logit_scale = torch.nn.Parameter(
            torch.tensor(float(np.log(1.0 / 0.07)))
        )
        gen = torch.Generator().manual_seed(7)
        bank = torch.randn(ref_cfg.num_semcls, 512, generator=gen)
        ref_model.text_features_fg_norm = bank / bank.norm(dim=1, keepdim=True)
        if ckpt_sd is not None:
            missing, unexpected = ref_model.load_state_dict(
                {k: torch.as_tensor(v) for k, v in ckpt_sd.items()}, strict=False
            )
            if missing or unexpected:
                print(f"[ref] load_state_dict: missing={missing} unexpected={unexpected}")
        else:
            # perturb BN running stats so eval-mode normalization is
            # non-trivial through the converter
            with torch.no_grad():
                for m in ref_model.modules():
                    if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                        m.running_mean.uniform_(-0.3, 0.3, generator=gen)
                        m.running_var.uniform_(0.5, 1.5, generator=gen)
        ref_model = ref_model.eval()

        calc = apc_mod.APCalculator(
            dataset_config=ref_cfg, ap_iou_thresh=[0.25, 0.5], exact_eval=True,
            args=types.SimpleNamespace(dataset_name=args.dataset_name),
        )
        t = lambda x: torch.from_numpy(np.ascontiguousarray(x))
        for batch in batches:
            inputs_t = {
                "point_clouds": t(batch["point_clouds"]),
                "point_cloud_dims_min": t(batch["point_cloud_dims_min"]),
                "point_cloud_dims_max": t(batch["point_cloud_dims_max"]),
            }
            with torch.no_grad():
                out = ref_model(inputs_t, if_real_test=True)
            # With a random init the model's predictions overlap the synthetic
            # GT at mAP ~0 and every metric is trivially 0 == 0.  Re-seed the
            # GT from the AUX decoder layer's boxes at the final layer's
            # top-objectness slots: similar-but-not-identical to the evaluated
            # final-layer boxes, so IoUs land in a realistic range and the
            # AP/AR/Prec protocol (NMS ties, per-class proposals, thresholds)
            # is exercised at NONZERO values.  Both sides consume the same
            # re-seeded targets, so equality stays a fair comparison.
            ngt = batch["gt_box_corners"].shape[1]
            obj = out["outputs"]["objectness_prob"].cpu().numpy()
            aux_corners = out["aux_outputs"][-1]["box_corners"].cpu().numpy()
            sem = out["outputs"]["sem_cls_prob"].cpu().numpy()
            for i in range(obj.shape[0]):
                top = np.argsort(-obj[i])[:ngt]
                batch["gt_box_corners"][i] = aux_corners[i, top]
                batch["gt_box_sem_cls_label"][i] = np.argmax(sem[i, top], -1)
                batch["gt_box_present"][i] = 1.0
            calc.step_meter(
                {"outputs": {
                    "box_corners": out["outputs"]["box_corners"],
                    "sem_cls_prob": out["outputs"]["sem_cls_prob"],
                    "objectness_prob": out["outputs"]["objectness_prob"],
                }},
                {
                    "point_clouds": t(batch["point_clouds"]),
                    "gt_box_corners": t(batch["gt_box_corners"]),
                    "gt_box_sem_cls_label": t(batch["gt_box_sem_cls_label"]),
                    "gt_box_present": t(batch["gt_box_present"]),
                },
            )
        metrics = calc.compute_metrics()
        sd = {k: v.detach().cpu().numpy() for k, v in ref_model.state_dict().items()}
        return sd, ref_model.text_features_fg_norm.detach().cpu().numpy(), _scalars(metrics)
    finally:
        restore(saved)


def _run_ours(args, cfg, batches, sd, bank):
    """flax forward (through the converted checkpoint) + our AP stack."""
    import jax.numpy as jnp

    from coda_neurips2023_tpu.models.model_3detr import (
        build_3detr_predictedbox_distillation_head,
        get_class_scores,
    )
    from coda_neurips2023_tpu.utils.ap_calculator import APCalculator
    from coda_neurips2023_tpu.utils.torch_convert import convert_reference_state_dict

    model, _ = build_3detr_predictedbox_distillation_head(args, cfg)
    params, stats, constants, logit_scale = convert_reference_state_dict(
        sd, enc_nlayers=args.enc_nlayers, dec_nlayers=args.dec_nlayers,
        enc_nhead=args.enc_nhead, dec_nhead=args.dec_nhead,
    )
    variables = {"params": params, "batch_stats": stats, "constants": constants}
    bank_j = jnp.asarray(bank)
    scale = min(float(np.exp(logit_scale)), 100.0)

    calc = APCalculator(dataset_config=cfg, ap_iou_thresh=(0.25, 0.5), exact_eval=True)
    for batch in batches:
        inputs = {
            "point_clouds": jnp.asarray(batch["point_clouds"]),
            "point_cloud_dims_min": jnp.asarray(batch["point_cloud_dims_min"]),
            "point_cloud_dims_max": jnp.asarray(batch["point_cloud_dims_max"]),
        }
        out = model.apply(variables, inputs, train=False)
        scores = get_class_scores(
            out["text_correlation_embedding"][-1], bank_j, scale
        )
        calc.step_meter(
            {"outputs": {
                "box_corners": np.asarray(out["box_corners"][-1]),
                "sem_cls_prob": np.asarray(scores),
                "objectness_prob": np.asarray(out["objectness_prob"][-1]),
            }},
            {
                "point_clouds": batch["point_clouds"],
                "gt_box_corners": batch["gt_box_corners"],
                "gt_box_sem_cls_label": batch["gt_box_sem_cls_label"],
                "gt_box_present": batch["gt_box_present"],
            },
        )
    return _scalars(calc.compute_metrics())


def _scalars(metrics):
    """{iou_thresh: {name: float}} with only scalar entries kept."""
    out = {}
    for thr, ret in metrics.items():
        out[float(thr)] = {
            k: float(v)
            for k, v in ret.items()
            if isinstance(v, (int, float, np.floating)) and np.isfinite(float(v))
        }
    return out


def compare(ref_metrics, our_metrics):
    """-> (max_delta, report_lines) over the union of scalar metrics."""
    lines, deltas = [], [0.0]
    for thr in sorted(ref_metrics):
        ref_d = ref_metrics[thr]
        our_d = our_metrics.get(thr, {})
        for k in sorted(set(ref_d) | set(our_d)):
            r, o = ref_d.get(k), our_d.get(k)
            if r is None or o is None:
                lines.append(f"  [{thr}] {k}: ONLY ref={r} ours={o}")
                deltas.append(float("inf"))
            else:
                d = abs(r - o)
                deltas.append(d)
                mark = "" if d <= 1e-9 else f"   DELTA {d:.3e}"
                lines.append(f"  [{thr}] {k}: ref={r:.6f} ours={o:.6f}{mark}")
    return max(deltas), lines


def run_parity(num_scenes=B_DEFAULT, batch_size=4, ckpt=None, seed=17):
    args = _make_args()
    cfg, batches = _synthetic_eval_set(num_scenes, batch_size, seed=seed)
    ckpt_sd = None
    if ckpt:
        import torch

        raw = torch.load(ckpt, map_location="cpu")
        ckpt_sd = raw.get("model", raw) if isinstance(raw, dict) else raw
        ckpt_sd = {k: np.asarray(v) for k, v in ckpt_sd.items()}
    sd, bank, ref_metrics = _run_reference(args, batches, ckpt_sd)
    our_metrics = _run_ours(args, cfg, batches, sd, bank)
    return ref_metrics, our_metrics


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenes", type=int, default=B_DEFAULT)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--ckpt", default=None,
                   help="reference .pth to validate (default: random init)")
    p.add_argument("--tol", type=float, default=5e-3,
                   help="max allowed |ref - ours| on any scalar metric.  The "
                        "AP protocol is DISCRETE (greedy NMS tie-breaks, "
                        "IoU/point-count thresholds): forward parity at rtol "
                        "2e-3 flips O(1) of ~500 boxes per run, so exact "
                        "equality is not the right gate; 5e-3 ~= 2 flipped "
                        "boxes.  Tighten for trained checkpoints, where box "
                        "scores are decisive rather than float-noise ties.")
    a = p.parse_args()
    ref_metrics, our_metrics = run_parity(a.scenes, a.batch, a.ckpt)
    delta, lines = compare(ref_metrics, our_metrics)
    print("\n".join(lines))
    print(f"\nmax |ref - ours| over {sum(len(v) for v in ref_metrics.values())} "
          f"metrics: {delta:.3e}  (tol {a.tol:g})")
    sys.exit(0 if delta <= a.tol else 1)


if __name__ == "__main__":
    main()
