"""AP stack sanity: metric contract behaves like the reference protocol."""

import numpy as np
import pytest

import jax.numpy as jnp

from coda_neurips2023_tpu.datasets.config import SunrgbdImageConfig
from coda_neurips2023_tpu.ops import box_ops
from coda_neurips2023_tpu.utils.ap_calculator import (
    APCalculator,
    get_ap_config_dict,
    parse_predictions,
    points_in_box_mask,
)
from coda_neurips2023_tpu.utils.eval_det import eval_det, voc_ap


def boxes_to_corners(centers, sizes, angles):
    cam = box_ops.flip_axis_to_camera(jnp.asarray(centers))
    return np.asarray(
        box_ops.get_3d_box_batch(jnp.asarray(sizes), jnp.asarray(angles), cam)
    )


def make_scene(rng, nbox, ncls=5):
    centers = rng.uniform(-3, 3, (nbox, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(0.5, 1.5, nbox)
    # keep boxes apart so NMS never merges GT
    centers[:, 0] = np.arange(nbox) * 4.0
    sizes = rng.uniform(0.5, 1.2, (nbox, 3)).astype(np.float32)
    angles = rng.uniform(-np.pi, np.pi, nbox).astype(np.float32)
    classes = rng.integers(0, ncls, nbox)
    corners = boxes_to_corners(centers[None], sizes[None], angles[None])[0]
    return centers, sizes, angles, classes, corners


class TestPerfectPredictions:
    def test_map_is_one(self):
        rng = np.random.default_rng(0)
        cfg = SunrgbdImageConfig(num_semcls=5)
        ap = APCalculator(cfg, ap_iou_thresh=[0.25, 0.5], exact_eval=False)
        for scan in range(3):
            nbox = int(rng.integers(2, 5))
            centers, sizes, angles, classes, corners = make_scene(rng, nbox)
            gt = [[(int(classes[j]), corners[j]) for j in range(nbox)]]
            # predictions identical to GT with high confidence
            pred = [[(int(classes[j]), corners[j], 0.99) for j in range(nbox)]]
            ap.accumulate(pred, gt)
        m = ap.compute_metrics()
        assert m[0.25]["mAP"] == pytest.approx(1.0)
        assert m[0.5]["mAP"] == pytest.approx(1.0)
        assert m[0.25]["AR"] == pytest.approx(1.0)

    def test_wrong_class_scores_zero(self):
        rng = np.random.default_rng(1)
        cfg = SunrgbdImageConfig(num_semcls=5)
        ap = APCalculator(cfg, ap_iou_thresh=[0.25], exact_eval=False)
        centers, sizes, angles, classes, corners = make_scene(rng, 3)
        gt = [[(0, corners[j]) for j in range(3)]]
        pred = [[(1, corners[j], 0.99) for j in range(3)]]  # all wrong class
        ap.accumulate(pred, gt)
        m = ap.compute_metrics()
        assert m[0.25]["0 Average Precision"] == 0.0


class TestParsePredictions:
    def test_nms_and_conf_filtering(self):
        rng = np.random.default_rng(2)
        cfg = SunrgbdImageConfig(num_semcls=3)
        nbox = 2
        centers, sizes, angles, classes, corners = make_scene(rng, nbox, ncls=3)
        # duplicate each box with lower objectness -> NMS must drop the dup
        pred_corners = np.concatenate([corners, corners + 1e-3])[None]
        sem = np.zeros((1, 4, 3), np.float32)
        sem[0, np.arange(4), np.concatenate([classes, classes])] = 1.0
        obj = np.array([[0.9, 0.8, 0.3, 0.2]], np.float32)
        pc = rng.uniform(-5, 5, (1, 500, 3)).astype(np.float32)
        config = get_ap_config_dict(dataset_config=cfg, remove_empty_box=False)
        out = parse_predictions(pred_corners, sem, obj, pc, config)
        kept_j = {tuple(np.round(b[0], 4)) for (_, b, s) in out[0]}
        # per_class_proposal: each kept box appears num_semcls times
        assert len(out[0]) == 2 * 3

    def test_points_in_box_matches_delaunay(self):
        from scipy.spatial import Delaunay

        rng = np.random.default_rng(3)
        centers, sizes, angles, classes, corners = make_scene(rng, 1)
        from coda_neurips2023_tpu.utils.ap_calculator import flip_axis_to_depth_np

        box_depth = flip_axis_to_depth_np(corners[0])
        pts = rng.uniform(-4, 8, (3000, 3))
        got = points_in_box_mask(pts, box_depth)
        want = Delaunay(box_depth).find_simplex(pts) >= 0
        # identical up to boundary-float tolerance
        assert np.mean(got == want) > 0.999


class TestVocAp:
    def test_known_pr_curve(self):
        rec = np.array([0.5, 1.0])
        prec = np.array([1.0, 0.5])
        # envelope: AP = 0.5*1.0 + 0.5*0.5
        assert voc_ap(rec, prec) == pytest.approx(0.75)


def test_scannet_buckets_alias_seen():
    """ScanNet (>=21 classes) buckets mAP/Prec/AR fre/common/base by
    seen_idx_list and novel by novel_idx_list, fre/common aliasing seen
    (reference ap_calculator.py:1578-1593, 1660-1690)."""
    import types

    rng = np.random.default_rng(3)
    ncls = 24
    cfg = types.SimpleNamespace(
        num_semcls=ncls,
        seen_idx_list=list(range(10)),
        novel_idx_list=list(range(10, ncls)),
    )
    ap = APCalculator(
        cfg, ap_iou_thresh=[0.25], exact_eval=False, dataset_name="scannet50_image"
    )
    # one GT box per class; predictions match only the seen classes
    centers = np.stack([np.arange(ncls) * 4.0, np.zeros(ncls), np.ones(ncls)], 1)
    sizes = np.full((ncls, 3), 1.0, np.float32)
    corners = boxes_to_corners(centers.astype(np.float32), sizes, np.zeros(ncls, np.float32))
    gt = [[(c, corners[c]) for c in range(ncls)]]
    pred = [[(c, corners[c], 0.99) for c in range(10)]]
    ap.accumulate(pred, gt)
    m = ap.compute_metrics()[0.25]
    assert m["mAP_base"] == pytest.approx(1.0)
    assert m["mAP_fre"] == m["mAP_common"] == m["mAP_base"]
    assert m["mAP_novel"] == pytest.approx(0.0)
    assert m["AR_fre"] == m["AR_common"] == m["AR_base"] == pytest.approx(1.0)
    assert m["AR_novel"] == pytest.approx(0.0)
    assert m["Prec_fre"] == m["Prec_common"] == m["Prec_base"]


def test_parse_predictions_pool_matches_serial(monkeypatch):
    """The forkserver-pool scan fan-out returns bitwise-identical results to
    the serial path (order preserved).  jax is deliberately initialized in
    the parent FIRST: the pool must be safe to create after XLA threads
    exist (the fork-after-threads deadlock class this pool is hardened
    against)."""
    import types

    import jax
    import jax.numpy as jnp

    from coda_neurips2023_tpu.utils import ap_calculator as apc

    assert float(jnp.asarray(1.0) + 1.0) == 2.0  # live backend in the parent
    assert jax.devices()
    monkeypatch.setenv("CODA_AP_WORKERS", "2")
    monkeypatch.setattr(apc, "_AP_POOL", None)
    rng = np.random.default_rng(7)
    B, NQ, NPTS, NCLS = 3, 16, 512, 5
    centers = rng.uniform(-2.5, 2.5, (B * NQ, 3)).astype(np.float32)
    sizes = rng.uniform(0.3, 1.4, (B * NQ, 3)).astype(np.float32)
    corners = boxes_to_corners(
        centers, sizes, rng.uniform(0, np.pi, B * NQ).astype(np.float32)
    ).reshape(B, NQ, 8, 3)
    sem = rng.dirichlet(np.ones(NCLS), (B, NQ)).astype(np.float32)
    obj = rng.uniform(0, 1, (B, NQ)).astype(np.float32)
    pc = rng.uniform(-3, 3, (B, NPTS, 3)).astype(np.float32)
    cfgd = apc.get_ap_config_dict(
        conf_thresh=0.05, dataset_config=types.SimpleNamespace(num_semcls=NCLS)
    )
    serial = apc.parse_predictions(corners, sem, obj, pc, cfgd, parallel=False)
    par = apc.parse_predictions(corners, sem, obj, pc, cfgd)
    assert len(serial) == len(par)
    for a, b in zip(serial, par):
        assert len(a) == len(b)
        for (c1, k1, s1), (c2, k2, s2) in zip(a, b):
            assert c1 == c2 and s1 == s2 and np.array_equal(k1, k2)
    # reset so other tests get the default pool decision
    monkeypatch.setattr(apc, "_AP_POOL", None)
