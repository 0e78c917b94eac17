"""Real-loader contract tests over synthetic on-disk fixtures (same file
formats as the reference data preparation)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from coda_neurips2023_tpu.datasets.config import (
    ScannetAnonymousConfig,
    SunrgbdAnonymousConfig,
)
from coda_neurips2023_tpu.datasets.loader import make_loader
from coda_neurips2023_tpu.datasets.scannet import ScannetDetectionDataset
from coda_neurips2023_tpu.datasets.sunrgbd import SunrgbdDetectionDataset

EXPECTED_KEYS = {
    "point_clouds", "gt_box_corners", "gt_box_corners_xyz", "gt_box_centers",
    "gt_box_centers_normalized", "gt_box_sem_cls_label",
    "gt_box_seen_sem_cls_label", "gt_box_seen_sem_cls_confi", "gt_box_present",
    "gt_box_sizes", "gt_box_sizes_normalized", "gt_box_angles",
    "gt_angle_class_label", "gt_angle_residual_label",
    "point_cloud_dims_min", "point_cloud_dims_max", "scan_idx",
}


def make_sunrgbd_fixture(root, n_scans=3):
    rng = np.random.default_rng(0)
    data_dir = str(root / "sunrgbd_pc_train")
    calib_dir = str(root / "calib")
    image_dir = str(root / "image")
    os.makedirs(data_dir), os.makedirs(calib_dir), os.makedirs(image_dir)
    for i in range(n_scans):
        scan = f"{i:06d}"
        pc = rng.uniform(-3, 3, (1200, 6)).astype(np.float32)
        np.savez(os.path.join(data_dir, scan + "_pc.npz"), pc=pc)
        k = rng.integers(1, 5)
        boxes = np.zeros((k, 8))
        boxes[:, 0:3] = rng.uniform(-2, 2, (k, 3))
        boxes[:, 3:6] = rng.uniform(0.2, 0.8, (k, 3))  # half extents
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, k)
        boxes[:, 7] = rng.integers(0, 12, k)
        np.save(os.path.join(data_dir, scan + "_bbox.npy"), boxes)
        rtilt = np.eye(3).reshape(-1, order="F")
        kmat = np.array([[520.0, 0, 360], [0, 520.0, 260], [0, 0, 1]]).reshape(
            -1, order="F"
        )
        with open(os.path.join(calib_dir, scan + ".txt"), "w") as f:
            f.write(" ".join(str(x) for x in rtilt) + "\n")
            f.write(" ".join(str(x) for x in kmat) + "\n")
        img = rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
        cv2.imwrite(os.path.join(image_dir, scan + ".jpg"), img)
    return str(root / "sunrgbd_pc"), calib_dir, image_dir


class TestSunrgbdLoader:
    def test_train_sample_contract(self, tmp_path):
        root, calib, image = make_sunrgbd_fixture(tmp_path)
        cfg = SunrgbdAnonymousConfig(train_range=(0, 10), test_range=(0, 46))
        ds = SunrgbdDetectionDataset(
            cfg, "train", root_dir=root, calib_dir=calib, image_dir=image,
            num_points=512, augment=True, if_input_image=True,
            if_image_augment=True, anonymous=True, use_pseudo_labels=True,
            seed=0,
        )
        assert len(ds) == 3
        s = ds[0]
        assert EXPECTED_KEYS <= set(s)
        assert s["point_clouds"].shape == (512, 3)
        assert s["gt_box_corners"].shape == (64, 8, 3)
        assert s["gt_box_present"].sum() >= 0
        assert s["input_image"].shape == (531, 730, 3)
        assert s["K"].shape == (3, 3) and s["Rtilt"].shape == (3, 3)
        assert os.path.exists(s["pseudo_box_path"])  # created on first load
        # anonymized labels
        assert np.all(s["gt_box_sem_cls_label"] == 0)
        # seen labels within train range for present real boxes
        live = s["gt_box_present"] > 0
        assert np.all(s["gt_box_seen_sem_cls_label"][live] < 10)

    def test_pseudo_label_merge(self, tmp_path):
        root, calib, image = make_sunrgbd_fixture(tmp_path)
        cfg = SunrgbdAnonymousConfig()
        ds = SunrgbdDetectionDataset(
            cfg, "train", root_dir=root, calib_dir=calib, image_dir=image,
            num_points=256, augment=False, if_input_image=False,
            anonymous=True, use_pseudo_labels=True, seed=0,
        )
        s0 = ds[0]
        n0 = int(s0["gt_box_present"].sum())
        # write two pseudo rows (full extents, 10-dim like discovery output)
        rows = np.zeros((2, 10))
        rows[:, 0:3] = [[0.5, 0.5, 0.5], [-0.5, -0.5, 0.5]]
        rows[:, 3:6] = 0.6
        rows[:, 7] = 20  # novel class id
        rows[:, 8] = 0.9
        rows[:, 9] = 0.8
        np.save(s0["pseudo_box_path"], rows)
        s1 = ds[0]
        assert int(s1["gt_box_present"].sum()) == n0 + 2

    def test_val_split_keeps_only_train_range(self, tmp_path):
        """The reference's anonymous val filter is the TRAIN-range filter (the
        test-range block is dead code behind an always-true
        `== 'train' or 'noveltrain'`; live-pinned in
        tests/test_dataset_live_parity.py)."""
        root, calib, image = make_sunrgbd_fixture(tmp_path)
        os.rename(str(tmp_path / "sunrgbd_pc_train"), str(tmp_path / "sunrgbd_pc_val"))
        cfg = SunrgbdAnonymousConfig()
        ds = SunrgbdDetectionDataset(
            cfg, "val", root_dir=root, calib_dir=calib, image_dir=image,
            num_points=256, augment=False, if_input_image=False, anonymous=True,
        )
        for i in range(len(ds)):
            s = ds[i]
            assert np.all(s["gt_box_sem_cls_label"] == 0)
            n = int(s["gt_box_present"].sum())
            raw = np.load(
                os.path.join(str(tmp_path / "sunrgbd_pc_val"), ds.scan_names[i] + "_bbox.npy")
            )
            n_seen = int(sum(int(c) in cfg.train_range for c in raw[:, 7]))
            assert n == n_seen
            # seen ids are the true class ids (novel boxes are dropped, never
            # remapped to train_max on val)
            assert np.all(s["gt_box_seen_sem_cls_label"][:n] < cfg.train_max)

    def test_loader_batching(self, tmp_path):
        root, calib, image = make_sunrgbd_fixture(tmp_path)
        cfg = SunrgbdAnonymousConfig()
        ds = SunrgbdDetectionDataset(
            cfg, "train", root_dir=root, calib_dir=calib, image_dir=image,
            num_points=256, augment=True, if_input_image=True, anonymous=True,
            use_pseudo_labels=False, seed=0,
        )
        loader = make_loader(ds, 2, shuffle=True, num_workers=2)
        batch = next(iter(loader))
        assert batch["point_clouds"].shape == (2, 256, 3)
        assert isinstance(batch["im_name"], list)
        assert batch["input_image"].shape == (2, 531, 730, 3)


class TestScannetLoader:
    def test_train_sample_contract(self, tmp_path):
        rng = np.random.default_rng(1)
        data_dir = str(tmp_path / "scannet_train")
        os.makedirs(data_dir)
        for i in range(2):
            name = f"scene{i:04d}_00_0"
            pc = rng.uniform(-3, 3, (800, 6)).astype(np.float32)
            np.save(os.path.join(data_dir, name + "_pc.npy"), pc)
            boxes = np.zeros((3, 8))
            boxes[:, 0:3] = rng.uniform(-2, 2, (3, 3))
            boxes[:, 3:6] = rng.uniform(0.2, 0.8, (3, 3))
            boxes[:, 7] = rng.integers(0, 10, 3)
            np.save(os.path.join(data_dir, name + "_bbox.npy"), boxes)
        cfg = ScannetAnonymousConfig(train_range=(0, 10), test_range=(0, 60))
        # root_dir IS the train dir (reference scannet contract)
        ds = ScannetDetectionDataset(
            cfg, "train", root_dir=str(tmp_path / "scannet_train"), num_points=256,
            augment=True, if_input_image=False, anonymous=True,
            use_pseudo_labels=True, seed=0,
        )
        assert len(ds) == 2
        s = ds[0]
        assert EXPECTED_KEYS <= set(s)
        assert s["point_clouds"].shape == (256, 3)
        assert np.all(s["gt_box_sem_cls_label"] == 0)
        assert np.all(np.isfinite(s["gt_box_corners"]))


def test_eval_pads_and_meters_every_scan():
    """Eval must meter EVERY scan (reference eval loaders never drop the tail,
    main.py:1027-1033): the loader pads the final short batch to the static
    batch size and engine.evaluate slices the padding back out."""
    import jax

    import numpy as np

    from coda_neurips2023_tpu.datasets.config import SunrgbdAnonymousConfig
    from coda_neurips2023_tpu.datasets.loader import make_loader
    from coda_neurips2023_tpu.datasets.synthetic import SyntheticDetectionDataset
    from coda_neurips2023_tpu.engine import evaluate

    cfg = SunrgbdAnonymousConfig()
    n = 4 * 2 + 3  # bs*k + r
    ds = SyntheticDetectionDataset(cfg, num_scenes=n, num_points=128)
    loader = make_loader(ds, 4, shuffle=False, drop_last=False, pad_last=True, num_workers=1)

    shapes = [b["point_clouds"].shape[0] for b in loader]
    assert shapes == [4, 4, 4], shapes  # static batch shapes incl. padded tail
    masks = [b["pad_mask"] for b in loader]
    assert masks[-1].tolist() == [True, True, True, False]

    nq = 8

    def fake_eval_step(state, batch):
        bs = batch["point_clouds"].shape[0]
        assert "pad_mask" not in batch  # never reaches the jitted step
        rng = np.random.default_rng(0)
        return {
            "box_corners": rng.random((bs, nq, 8, 3), np.float32),
            "sem_cls_prob": np.full((bs, nq, 1), 0.9, np.float32),
            "objectness_prob": np.full((bs, nq), 0.9, np.float32),
            "center_unnormalized": rng.random((bs, nq, 3), np.float32),
            "size_unnormalized": np.full((bs, nq, 3), 0.5, np.float32),
            "angle_continuous": np.zeros((bs, nq), np.float32),
        }

    ap = evaluate(fake_eval_step, None, loader, cfg, exact_eval=False)
    assert ap.scan_cnt == n, (ap.scan_cnt, n)
    assert len(ap.gt_map_cls) == n


def test_import_initializes_no_jax_backend():
    """Pool workers (loader + AP, forkserver) import package modules while
    UNPICKLING their payload -- before any initializer can force the CPU
    platform.  A module-level jax op therefore initializes whatever backend
    the ambient config pins (the axon TPU relay in production), hanging every
    worker when the relay is unreachable (observed: ops/hungarian.py _INF).
    Guard: importing every worker-reachable module must create NO backend."""
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "import coda_neurips2023_tpu.datasets.synthetic\n"
        "import coda_neurips2023_tpu.datasets.sunrgbd\n"
        "import coda_neurips2023_tpu.datasets.scannet\n"
        "import coda_neurips2023_tpu.utils.ap_calculator\n"
        "import coda_neurips2023_tpu.utils.eval_det\n"
        "import coda_neurips2023_tpu.utils.nms\n"
        "import coda_neurips2023_tpu.criterion\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb._backends, f'import ran a jax op: {list(xb._backends)}'\n"
        "print('no backend')\n"
    )
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=240,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "no backend" in out.stdout


def test_process_loader_matches_serial():
    """Process-worker loader (forkserver) yields the same deterministic
    batches as the serial path: batches are built under per-task seeds, so
    worker scheduling cannot change results.  jax is initialized in the
    parent first -- pool creation must be safe after XLA threads exist."""
    import jax.numpy as jnp
    import numpy as np

    assert float(jnp.asarray(1.0) + 1.0) == 2.0  # live backend in the parent

    from coda_neurips2023_tpu.datasets.config import SunrgbdAnonymousConfig
    from coda_neurips2023_tpu.datasets.loader import make_loader
    from coda_neurips2023_tpu.datasets.synthetic import SyntheticDetectionDataset

    cfg = SunrgbdAnonymousConfig()
    ds = SyntheticDetectionDataset(cfg, num_scenes=9, num_points=128)
    serial = list(make_loader(ds, 4, shuffle=True, seed=3, num_workers=1))
    procs = list(
        make_loader(ds, 4, shuffle=True, seed=3, num_workers=3, use_processes=True)
    )
    threads = list(make_loader(ds, 4, shuffle=True, seed=3, num_workers=3))
    assert len(serial) == len(procs) == len(threads) == 2
    for variant in (procs, threads):
        for a, b in zip(serial, variant):
            assert set(a) == set(b)
            for k in a:
                if isinstance(a[k], list):
                    assert a[k] == b[k]
                else:
                    np.testing.assert_array_equal(a[k], b[k])


def test_scannet_raw_id_pipeline(tmp_path):
    """End-to-end ScanNet sample assembly with RAW scannet-200 class ids on
    disk: anonymous train (weak labels at train_range_list positions) and
    scannet50 eval (labels remapped via class_id_to_idx)."""
    from coda_neurips2023_tpu.datasets.config import Scannet50ImageConfig
    from tests.test_vocab import SCANNET_TRAIN_LIST, SCANNET_TEST_LIST

    rng = np.random.default_rng(2)
    for split in ("train", "val"):
        data_dir = str(tmp_path / f"scannet_{split}")
        os.makedirs(data_dir)
        for i in range(2):
            name = f"scene{i:04d}_00_0"
            pc = rng.uniform(-3, 3, (800, 6)).astype(np.float32)
            np.save(os.path.join(data_dir, name + "_pc.npy"), pc)
            boxes = np.zeros((4, 8))
            boxes[:, 0:3] = rng.uniform(-2, 2, (4, 3))
            boxes[:, 3:6] = rng.uniform(0.2, 0.8, (4, 3))
            boxes[:, 7] = [2, 1163, 3, 71]  # seen, seen, excluded, novel
            np.save(os.path.join(data_dir, name + "_bbox.npy"), boxes)

    anon = ScannetAnonymousConfig(
        train_range=(0, 10), test_range=(0, 60),
        train_range_list=SCANNET_TRAIN_LIST, test_range_list=SCANNET_TEST_LIST,
    )
    ds = ScannetDetectionDataset(
        anon, "train", root_dir=str(tmp_path / "scannet_train"), num_points=256,
        augment=False, if_input_image=False, anonymous=True, seed=0,
    )
    s = ds[0]
    present = s["gt_box_present"] > 0
    assert present.sum() == 2  # only raw ids 2 and 1163 are in the train list
    assert np.all(s["gt_box_sem_cls_label"][present] == 0)  # anonymized
    # weak labels are positions in train_range_list: 2 -> 0, 1163 -> 9
    assert sorted(s["gt_box_seen_sem_cls_label"][present].tolist()) == [0, 9]

    ecfg = Scannet50ImageConfig(
        train_range_list=SCANNET_TRAIN_LIST, test_range_list=SCANNET_TEST_LIST
    )
    ds_eval = ScannetDetectionDataset(
        ecfg, "val", root_dir=str(tmp_path / "scannet_train"), num_points=256,
        augment=False, if_input_image=False, anonymous=False, seed=0,
    )
    s = ds_eval[0]
    present = s["gt_box_present"] > 0
    # 71 is the 51st UNSEEN test id -> cut by reset_scannet_num=50
    # (reference scannet50_image.py:52-58 cap); 3 is floor (not in the lists)
    assert 71 not in ecfg.class_id_to_idx
    assert present.sum() == 2
    labels = sorted(s["gt_box_sem_cls_label"][present].tolist())
    assert labels == sorted(ecfg.class_id_to_idx[c] for c in (2, 1163))


def test_synthetic_fallback_uses_scannet_configs():
    """Data-free mode with a scannet dataset name builds the REAL scannet
    configs (axis-aligned, scannet50 eval vocab) instead of SUN RGB-D ones,
    so the full scannet path can be smoked without licensed data."""
    import types

    from coda_neurips2023_tpu.datasets import build_dataset
    from coda_neurips2023_tpu.datasets.config import (
        Scannet50ImageConfig,
        ScannetAnonymousConfig,
        ScannetCmpImageConfig,
    )
    from coda_neurips2023_tpu.main import make_args_parser

    args = make_args_parser().parse_args(
        ["--dataset_name", "scannet_anonymous_aligned_image",
         "--num_points", "256", "--synthetic_num_scenes", "4",
         "--test_num_semcls", "60"]
    )
    datasets, cfg, real_cfg, cmp_cfg = build_dataset(args)
    assert isinstance(cfg, ScannetAnonymousConfig)
    assert isinstance(real_cfg, Scannet50ImageConfig)
    assert isinstance(cmp_cfg, ScannetCmpImageConfig)
    assert cfg.num_angle_bin == 1  # axis-aligned family
    s = datasets["train"][0]
    assert s["gt_angle_class_label"].max() == 0  # no rotated boxes
    assert s["point_clouds"].shape == (256, 3)


def test_synthetic_pseudo_label_cycle(tmp_path):
    """Data-free stage-2 cycle contract: discovery writes per-scan
    _novel_bbox.npy (models/discovery.write_pseudo_labels) and the NEXT
    epoch's __getitem__ merges them as class-0 boxes with halved extents
    (mirroring datasets/sunrgbd.py:141-166 / reference load_boxes)."""
    from coda_neurips2023_tpu.datasets.config import SunrgbdAnonymousConfig
    from coda_neurips2023_tpu.datasets.synthetic import SyntheticDetectionDataset
    from coda_neurips2023_tpu.models.discovery import write_pseudo_labels

    cfg = SunrgbdAnonymousConfig()
    ds = SyntheticDetectionDataset(
        cfg, num_scenes=2, num_points=256, with_images=True,
        pseudo_dir=str(tmp_path),
    )
    s0 = ds[0]
    n_real = int(s0["gt_ori_box_num"])
    assert s0["pseudo_box_path"].endswith("synthetic_000000_novel_bbox.npy")
    assert int(s0["gt_box_present"].sum()) == n_real

    # discovery writes 2 pseudo rows (10-dim: cx cy cz l w h angle cls
    # cate_prob objectness) for scan 0
    rows = np.zeros((1, 3, 10), np.float32)
    rows[0, 0] = [1.0, 1.0, 1.0, 0.8, 0.6, 0.4, 0.3, 12, 0.9, 0.8]
    rows[0, 1] = [-1.0, 0.5, 0.5, 0.4, 0.4, 0.4, 0.0, 30, 0.7, 0.6]
    novel_mask = np.array([[True, True, False]])
    write_pseudo_labels(
        rows, novel_mask, [s0["pseudo_box_path"]], np.array([n_real]),
        accumulate=True, max_num_obj=cfg.max_num_obj,
    )

    s0b = ds[0]
    assert int(s0b["gt_box_present"].sum()) == n_real + 2
    assert int(s0b["gt_ori_box_num"]) == n_real  # real count unchanged
    # merged rows: class 0, halved extents
    assert s0b["gt_box_sem_cls_label"][n_real] == 0
    np.testing.assert_allclose(
        s0b["gt_box_sizes"][n_real], [0.4, 0.3, 0.2], rtol=1e-6
    )
    # scan 1 untouched
    s1 = ds[1]
    assert int(s1["gt_box_present"].sum()) == int(s1["gt_ori_box_num"])


def test_build_dataset_synthetic_discovery_paths(tmp_path):
    """The discovery flag + checkpoint_dir give the synthetic TRAIN split
    real pseudo paths; eval splits stay pathless."""
    from coda_neurips2023_tpu.datasets import build_dataset
    from coda_neurips2023_tpu.main import make_args_parser

    args = make_args_parser().parse_args(
        ["--dataset_name", "synthetic", "--num_points", "256",
         "--synthetic_num_scenes", "4", "--if_input_image",
         "--online_nms_update_save_novel_label_clip_driven_with_cate_confidence",
         "--checkpoint_dir", str(tmp_path)]
    )
    datasets, *_ = build_dataset(args)
    assert datasets["train"][0]["pseudo_box_path"].startswith(str(tmp_path))
    assert datasets["test"][0]["pseudo_box_path"] == "_"
