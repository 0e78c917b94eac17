"""LIVE AP-stack parity: the reference APCalculator / parse_predictions /
nms_3d_faster_samecls / eval_det (/root/reference/utils/{ap_calculator,
eval_det,nms}.py -- the declared bit-faithful metric contract, SURVEY.md
section 4 anchor (c)) run on the SAME predictions and ground truth as our
utils/ap_calculator.py, comparing every emitted metric.

Predictions are built to stress the protocol edges: scores straddling the
0.05 confidence threshold, overlapping boxes that NMS must break ties on,
empty boxes (< 5 points inside) that remove_empty_box must drop, and scenes
with zero GT of some classes (NaN-AP handling).
"""

import importlib
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_import import install_stubs, reference_available, restore

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(), reason="reference tree absent"),
]

B, NQ, NGT, NCLS, NPTS = 6, 24, 10, 8, 2048


def _scenario():
    """Random but protocol-stressing eval batch (numpy)."""
    from coda_neurips2023_tpu.ops import box_ops

    rng = np.random.default_rng(33)

    def boxes(n):
        centers = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
        sizes = rng.uniform(0.3, 1.4, (n, 3)).astype(np.float32)
        angles = rng.uniform(0, np.pi, (n,)).astype(np.float32)
        c_up = box_ops.flip_axis_to_camera(centers)
        return np.asarray(box_ops.get_3d_box_batch(sizes, angles, c_up))

    pred_corners = np.stack([boxes(NQ) for _ in range(B)])  # (B, NQ, 8, 3)
    gt_corners = np.stack([boxes(NGT) for _ in range(B)])
    # make half the predictions shadow a GT box (tight overlaps for NMS/IoU)
    pred_corners[:, :NGT] = gt_corners + rng.normal(
        0, 0.03, gt_corners.shape
    ).astype(np.float32)

    sem = rng.dirichlet(np.ones(NCLS) * 0.7, (B, NQ)).astype(np.float32)
    obj = rng.uniform(0.0, 1.0, (B, NQ)).astype(np.float32)
    # straddle the conf_thresh=0.05 gate
    obj[:, ::5] = rng.uniform(0.03, 0.08, obj[:, ::5].shape)

    # point cloud: clusters inside GT boxes + noise; some pred boxes get < 5
    # points (remove_empty_box path)
    pts = rng.uniform(-3.0, 3.0, (B, NPTS, 3)).astype(np.float32)
    centers = gt_corners.mean(axis=2)  # (B, NGT, 3)
    for b in range(B):
        for g in range(NGT):
            pts[b, g * 100 : g * 100 + 80] = centers[b, g] + rng.normal(
                0, 0.1, (80, 3)
            )

    gt_labels = rng.integers(0, NCLS, (B, NGT)).astype(np.int64)
    gt_labels[:, 0] = 0  # guarantee a populated class
    present = (rng.uniform(size=(B, NGT)) > 0.15).astype(np.float32)
    present[:, :2] = 1.0
    return {
        "box_corners": pred_corners,
        "sem_cls_prob": sem,
        "objectness_prob": obj,
        "point_clouds": pts,
        "gt_box_corners": gt_corners,
        "gt_box_sem_cls_label": gt_labels,
        "gt_box_present": present,
    }


def _ref_metrics(data):
    saved = install_stubs()
    try:
        apc_mod = importlib.import_module("utils.ap_calculator")
        cfg = types.SimpleNamespace(num_semcls=NCLS)
        args = types.SimpleNamespace(dataset_name="sunrgbd_anonymous_aligned_image")
        calc = apc_mod.APCalculator(
            dataset_config=cfg, ap_iou_thresh=[0.25, 0.5], exact_eval=True, args=args
        )
        t = lambda x: torch.from_numpy(np.asarray(x))
        calc.step_meter(
            {"outputs": {
                "box_corners": t(data["box_corners"]),
                "sem_cls_prob": t(data["sem_cls_prob"]),
                "objectness_prob": t(data["objectness_prob"]),
            }},
            {
                "point_clouds": t(data["point_clouds"]),
                "gt_box_corners": t(data["gt_box_corners"]),
                "gt_box_sem_cls_label": t(data["gt_box_sem_cls_label"]),
                "gt_box_present": t(data["gt_box_present"]),
            },
        )
        metrics = calc.compute_metrics()
        return {
            thr: {k: float(v) for k, v in ret.items() if isinstance(v, (int, float, np.floating))}
            for thr, ret in metrics.items()
        }
    finally:
        restore(saved)


def _our_metrics(data):
    from coda_neurips2023_tpu.utils.ap_calculator import APCalculator

    cfg = types.SimpleNamespace(num_semcls=NCLS)
    calc = APCalculator(dataset_config=cfg, ap_iou_thresh=(0.25, 0.5), exact_eval=True)
    calc.step_meter(
        {"outputs": {
            "box_corners": data["box_corners"],
            "sem_cls_prob": data["sem_cls_prob"],
            "objectness_prob": data["objectness_prob"],
        }},
        {
            "point_clouds": data["point_clouds"],
            "gt_box_corners": data["gt_box_corners"],
            "gt_box_sem_cls_label": data["gt_box_sem_cls_label"],
            "gt_box_present": data["gt_box_present"],
        },
    )
    metrics = calc.compute_metrics()
    return {
        thr: {k: float(v) for k, v in ret.items() if isinstance(v, (int, float, np.floating))}
        for thr, ret in metrics.items()
    }


def test_ap_stack_matches_reference():
    data = _scenario()
    ref = _ref_metrics(data)
    ours = _our_metrics(data)
    assert set(ref.keys()) == set(ours.keys())  # iou thresholds
    for thr in ref:
        shared = set(ref[thr]) & set(ours[thr])
        # every AP/Prec/Recall/mAP/AR value must agree exactly (both numpy)
        assert any("Average Precision" in k for k in shared)
        assert "mAP" in shared and "AR" in shared
        for k in sorted(shared):
            r, o = ref[thr][k], ours[thr][k]
            if np.isnan(r) and np.isnan(o):
                continue
            assert o == pytest.approx(r, rel=1e-6, abs=1e-9), (
                f"iou {thr} metric {k}: ours {o} vs reference {r}"
            )
        missing = set(ref[thr]) - set(ours[thr])
        assert not missing, f"metrics the reference emits but we don't: {missing}"


def test_ap_stack_matches_reference_scannet_buckets():
    """Same live comparison with a scannet-style config (>=21 classes,
    seen/novel idx bucket protocol, reference ap_calculator.py:1578-1593)."""
    ncls = 24
    data = _scenario()
    rng = np.random.default_rng(5)
    # widen the class dimension to 24 (re-draw sem probs + labels)
    B_, NQ_ = data["sem_cls_prob"].shape[:2]
    data["sem_cls_prob"] = rng.dirichlet(np.ones(ncls) * 0.7, (B_, NQ_)).astype(
        np.float32
    )
    data["gt_box_sem_cls_label"] = rng.integers(
        0, ncls, data["gt_box_sem_cls_label"].shape
    ).astype(np.int64)
    data["gt_box_sem_cls_label"][:, 0] = 0

    seen = list(range(10))
    novel = list(range(10, ncls))

    saved = install_stubs()
    try:
        import importlib

        apc_mod = importlib.import_module("utils.ap_calculator")
        cfg = types.SimpleNamespace(
            num_semcls=ncls, seen_idx_list=seen, novel_idx_list=novel
        )
        args = types.SimpleNamespace(dataset_name="scannet50_image")
        calc = apc_mod.APCalculator(
            dataset_config=cfg, ap_iou_thresh=[0.25, 0.5], exact_eval=True, args=args
        )
        t = lambda x: torch.from_numpy(np.asarray(x))
        calc.step_meter(
            {"outputs": {
                "box_corners": t(data["box_corners"]),
                "sem_cls_prob": t(data["sem_cls_prob"]),
                "objectness_prob": t(data["objectness_prob"]),
            }},
            {
                "point_clouds": t(data["point_clouds"]),
                "gt_box_corners": t(data["gt_box_corners"]),
                "gt_box_sem_cls_label": t(data["gt_box_sem_cls_label"]),
                "gt_box_present": t(data["gt_box_present"]),
            },
        )
        ref = {
            thr: {k: float(v) for k, v in ret.items()
                  if isinstance(v, (int, float, np.floating))}
            for thr, ret in calc.compute_metrics().items()
        }
    finally:
        restore(saved)

    from coda_neurips2023_tpu.utils.ap_calculator import APCalculator

    cfg = types.SimpleNamespace(
        num_semcls=ncls, seen_idx_list=seen, novel_idx_list=novel
    )
    calc = APCalculator(
        dataset_config=cfg, ap_iou_thresh=(0.25, 0.5), exact_eval=True,
        dataset_name="scannet50_image",
    )
    calc.step_meter(
        {"outputs": {
            "box_corners": data["box_corners"],
            "sem_cls_prob": data["sem_cls_prob"],
            "objectness_prob": data["objectness_prob"],
        }},
        {
            "point_clouds": data["point_clouds"],
            "gt_box_corners": data["gt_box_corners"],
            "gt_box_sem_cls_label": data["gt_box_sem_cls_label"],
            "gt_box_present": data["gt_box_present"],
        },
    )
    ours = {
        thr: {k: float(v) for k, v in ret.items()
              if isinstance(v, (int, float, np.floating))}
        for thr, ret in calc.compute_metrics().items()
    }
    for thr in ref:
        assert "mAP_novel" in ref[thr] and "AR_fre" in ref[thr]
        missing = set(ref[thr]) - set(ours[thr])
        assert not missing, f"metrics the reference emits but we don't: {missing}"
        for k in sorted(set(ref[thr]) & set(ours[thr])):
            r, o = ref[thr][k], ours[thr][k]
            if np.isnan(r) and np.isnan(o):
                continue
            assert o == pytest.approx(r, rel=1e-6, abs=1e-9), (
                f"iou {thr} metric {k}: ours {o} vs reference {r}"
            )


@pytest.mark.parametrize(
    "variant",
    [
        "default",
        "no_nms",
        "nms_2d",            # use_3d_nms=False -> BEV 2D NMS branch
        "nms_2d_old_type",   # + use_old_type_nms inside nms_2d_faster
        "nms_3d_not_samecls",  # cls_nms=False -> class-agnostic 3D NMS
        "cls_confidence_only",  # score = sem prob alone, not * objectness
        "no_per_class_proposal",
        "no_remove_empty_box",
    ],
)
def test_parse_predictions_config_variants_match_reference(variant):
    """parse_predictions has 5 independent protocol switches
    (/root/reference/utils/ap_calculator.py:777-960 + get_ap_config_dict);
    the default-path parity above exercises only the shipped combination.
    Run each branch against the live reference on the same stress batch."""
    data = _scenario()
    overrides = {
        "default": {},
        "no_nms": {"no_nms": True},
        "nms_2d": {"use_3d_nms": False, "cls_nms": False},
        "nms_2d_old_type": {
            "use_3d_nms": False, "cls_nms": False, "use_old_type_nms": True
        },
        "nms_3d_not_samecls": {"cls_nms": False},
        # per_class_proposal must be off with cls_confidence_only: the
        # reference asserts the combination away (ap_calculator.py:947)
        "cls_confidence_only": {
            "use_cls_confidence_only": True, "per_class_proposal": False
        },
        "no_per_class_proposal": {"per_class_proposal": False},
        "no_remove_empty_box": {"remove_empty_box": False},
    }[variant]

    saved = install_stubs()
    try:
        apc_mod = importlib.import_module("utils.ap_calculator")
        ref_cfg = apc_mod.get_ap_config_dict(
            dataset_config=types.SimpleNamespace(num_semcls=NCLS), **overrides
        )
        t = lambda x: torch.from_numpy(np.asarray(x))
        ref = apc_mod.parse_predictions(
            t(data["box_corners"]), t(data["sem_cls_prob"]),
            t(data["objectness_prob"]), t(data["point_clouds"]), ref_cfg,
        )
    finally:
        restore(saved)

    from coda_neurips2023_tpu.utils import ap_calculator as ours_mod

    our_cfg = ours_mod.get_ap_config_dict(
        dataset_config=types.SimpleNamespace(num_semcls=NCLS), **overrides
    )
    ours = ours_mod.parse_predictions(
        data["box_corners"], data["sem_cls_prob"], data["objectness_prob"],
        data["point_clouds"], our_cfg,
    )

    assert len(ref) == len(ours) == B
    for b in range(B):
        assert len(ref[b]) == len(ours[b]), (
            f"{variant} scan {b}: {len(ref[b])} ref vs {len(ours[b])} ours"
        )
        for (rc, rcorn, rs), (oc, ocorn, os_) in zip(ref[b], ours[b]):
            assert int(rc) == int(oc), f"{variant} scan {b} class"
            assert float(rs) == pytest.approx(float(os_), rel=1e-6, abs=1e-8)
            np.testing.assert_allclose(
                np.asarray(rcorn), np.asarray(ocorn), rtol=1e-6, atol=1e-7
            )
