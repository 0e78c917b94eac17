"""Dataset registry + split construction.

Mirrors the reference registry (/root/reference/datasets/__init__.py:12-21;
8 wired names) and build_dataset (:24-119), which makes 4 splits:
  train/test on the OV-anonymous config, `real_test` on the named eval config
  (46-class sunrgbd_image / 60-class scannet50_image), `real_cmp_test` on the
  OV-3DETR cmp vocabulary.

All SUN RGB-D variants share one parameterized implementation
(datasets/sunrgbd.py); the ScanNet family is analogous (datasets/scannet.py).
A synthetic generator (datasets/synthetic.py) backs tests/benchmarks when the
licensed data is not present.
"""

from __future__ import annotations

import functools

from coda_neurips2023_tpu.datasets.config import (
    Scannet50ImageConfig,
    ScannetAnonymousConfig,
    ScannetCmpImageConfig,
    SunrgbdAnonymousConfig,
    SunrgbdCmpImageConfig,
    SunrgbdImageConfig,
)
from coda_neurips2023_tpu.datasets.sunrgbd import SunrgbdDetectionDataset
from coda_neurips2023_tpu.datasets.synthetic import SyntheticDetectionDataset


def _sunrgbd_cfg(args, anonymous=True, num_semcls=None, cmp_vocab=False):
    """cmp_vocab=True builds the 20-class OV-3DETR comparison eval config
    (reference SunrgbdImageCmpDatasetConfig, sunrgbd_cmp_image.py:86-197)."""
    kw = dict(
        asset_dir=getattr(args, "asset_dir", None),
        use_v1=getattr(args, "if_use_v1", True),
        train_range=(args.train_range_min, args.train_range_max),
        test_range=(args.test_range_min, args.test_range_max),
        image_size=(args.image_size_width, args.image_size_height),
    )
    if cmp_vocab:
        return SunrgbdCmpImageConfig(**kw)
    cfg_cls = SunrgbdAnonymousConfig if anonymous else SunrgbdImageConfig
    if not anonymous:
        kw["num_semcls"] = num_semcls if num_semcls is not None else args.test_num_semcls
    cfg = cfg_cls(**kw)
    return cfg


def _scannet_cfg(args, anonymous=True, num_semcls=None, cmp_vocab=False):
    if cmp_vocab:
        return ScannetCmpImageConfig(
            asset_dir=getattr(args, "asset_dir", None),
            train_range=(args.train_range_min, args.train_range_max),
            test_range=(args.test_range_min, args.test_range_max),
        )
    # raw ScanNet-200 class-id lists from the shipped scripts
    # (--train_range_list/--test_range_list; reference scannet50_image.py:38-62)
    tlist = getattr(args, "train_range_list", -1)
    elist = getattr(args, "test_range_list", -1)
    has_lists = isinstance(tlist, (list, tuple)) and isinstance(elist, (list, tuple))
    if anonymous:
        return ScannetAnonymousConfig(
            asset_dir=getattr(args, "asset_dir", None),
            train_range=(args.train_range_min, args.train_range_max),
            test_range=(args.test_range_min, args.test_range_max),
            train_range_list=list(tlist) if has_lists else None,
            test_range_list=list(elist) if has_lists else None,
        )
    return Scannet50ImageConfig(
        asset_dir=getattr(args, "asset_dir", None),
        num_semcls=num_semcls if num_semcls is not None else args.test_num_semcls,
        train_range=(args.train_range_min, args.train_range_max),
        test_range=(args.test_range_min, args.test_range_max),
        train_range_list=list(tlist) if has_lists else None,
        test_range_list=list(elist) if has_lists else None,
        reset_scannet_num=getattr(args, "reset_scannet_num", 50),
    )


# wired dataset names (reference datasets/__init__.py:12-21).  The reference
# additionally IMPORTS SunrgbdImageCmpDetectionDataset /
# ScannetDetectionImageCmpDataset but never keys them in DATASET_FUNCTIONS --
# they only back the auto-built `real_cmp_test` split; here they are also
# accepted as first-class --dataset_name values (strict superset: the cmp
# vocab drives ALL four splits then).
DATASET_NAMES = (
    "scannet_anonymous",
    "scannet50_image",
    "scannet_anonymous_aligned_image",
    "scannet_anonymous_aligned_image_with_novel_cate_confi",
    "sunrgbd_image",
    "sunrgbd_anonymous_aligned_image",
    "sunrgbd_anonymous_aligned_image_with_novel_cate_confi",
    "sunrgbd_anonymous_aligned_image_object_aug",
    "sunrgbd_cmp_image",
    "scannet_cmp_image",
    "synthetic",
)


def build_dataset(args):
    """Returns (dataset_dict{train,test,real_test,real_cmp_test},
    dataset_config, real_test_config, real_cmp_config)."""
    name = args.dataset_name
    if name not in DATASET_NAMES:
        raise ValueError(f"unknown dataset {name}")

    if name == "synthetic" or args.dataset_root_dir is None:
        # data-free mode: synthetic scenes with the same contract; scannet
        # names get the REAL scannet configs (axis-aligned boxes, raw-id
        # vocab rebuild) so the full scannet path smokes without data
        if name.startswith("scannet"):
            cmp_cfg = _scannet_cfg(args, cmp_vocab=True)
            cfg = cmp_cfg if name == "scannet_cmp_image" else _scannet_cfg(args, anonymous=True)
            real_cfg = _scannet_cfg(args, anonymous=False)
        else:
            cmp_cfg = _sunrgbd_cfg(args, cmp_vocab=True)
            cfg = cmp_cfg if name == "sunrgbd_cmp_image" else _sunrgbd_cfg(args, anonymous=True)
            real_cfg = _sunrgbd_cfg(args, anonymous=False)
        mk = functools.partial(
            SyntheticDetectionDataset,
            num_points=getattr(args, "num_points", 20000),
            with_images=getattr(args, "if_input_image", False),
            empty_scene_rate=getattr(args, "synthetic_empty_scene_rate", 0.0),
        )
        n = getattr(args, "synthetic_num_scenes", 256) or 256
        n_eval = max(n // 4, 2)
        # stage-2 discovery in data-free mode writes/merges real per-scan
        # pseudo-label files under the checkpoint dir (train split only,
        # mirroring the reference's noveltrain_pseudo_labels dirs)
        pseudo_dir = None
        if (
            getattr(args, "online_nms_update_save_novel_label_clip_driven_with_cate_confidence", False)
            and getattr(args, "checkpoint_dir", None)
        ):
            import os

            pseudo_dir = os.path.join(
                args.checkpoint_dir,
                "synthetic_pseudo_labels_" + getattr(args, "pseudo_setting", "setting0"),
            )
            os.makedirs(pseudo_dir, exist_ok=True)
        datasets = {
            "train": mk(cfg, num_scenes=n, seed=args.seed, pseudo_dir=pseudo_dir),
            "test": mk(cfg, num_scenes=n_eval, seed=args.seed + 1),
            "real_test": mk(real_cfg, num_scenes=n_eval, seed=args.seed + 2),
            "real_cmp_test": mk(cmp_cfg, num_scenes=n_eval, seed=args.seed + 3),
        }
        return datasets, cfg, real_cfg, cmp_cfg

    if name.startswith("sunrgbd"):
        cmp_cfg = _sunrgbd_cfg(args, anonymous=False, cmp_vocab=True)
        cmp_primary = name == "sunrgbd_cmp_image"
        anon_cfg = cmp_cfg if cmp_primary else _sunrgbd_cfg(args, anonymous=True)
        real_cfg = _sunrgbd_cfg(args, anonymous=False)
        use_pseudo = "with_novel_cate_confi" in name
        common = dict(
            root_dir=args.dataset_root_dir,
            calib_dir=args.calib_dir,
            image_dir=args.image_dir,
            num_points=getattr(args, "num_points", 20000),
            use_color=args.use_color,
            if_input_image=args.if_input_image,
            confidence_type_in_datalayer=args.confidence_type_in_datalayer,
            pseudo_setting=args.pseudo_setting,
        )
        datasets = {
            "train": SunrgbdDetectionDataset(
                anon_cfg, "train", augment=True, anonymous=not cmp_primary,
                use_pseudo_labels=use_pseudo,
                if_image_augment=args.if_image_augment,
                object_aug_dir=(
                    getattr(args, "object_aug_dir", None)
                    if name.endswith("object_aug") else None
                ),
                **common,
            ),
            "test": SunrgbdDetectionDataset(
                anon_cfg, "val", augment=False, anonymous=not cmp_primary, **common
            ),
            "real_test": SunrgbdDetectionDataset(
                real_cfg, "val", augment=False, anonymous=False, **common
            ),
            "real_cmp_test": SunrgbdDetectionDataset(
                cmp_cfg, "val", augment=False, anonymous=False, **common
            ),
        }
        return datasets, anon_cfg, real_cfg, cmp_cfg

    # scannet family
    from coda_neurips2023_tpu.datasets.scannet import ScannetDetectionDataset

    cmp_cfg = _scannet_cfg(args, cmp_vocab=True)
    cmp_primary = name == "scannet_cmp_image"
    anon_cfg = cmp_cfg if cmp_primary else _scannet_cfg(args, anonymous=True)
    real_cfg = _scannet_cfg(args, anonymous=False)
    use_pseudo = "with_novel_cate_confi" in name
    common = dict(
        root_dir=args.dataset_root_dir,
        num_points=getattr(args, "num_points", 40000),
        use_color=args.use_color,
        if_input_image=args.if_input_image,
        confidence_type_in_datalayer=args.confidence_type_in_datalayer,
        pseudo_setting=args.pseudo_setting,
    )
    datasets = {
        "train": ScannetDetectionDataset(
            anon_cfg, "train", augment=True, anonymous=not cmp_primary,
            use_pseudo_labels=use_pseudo,
            if_image_augment=args.if_image_augment, **common,
        ),
        "test": ScannetDetectionDataset(
            anon_cfg, "val", augment=False, anonymous=not cmp_primary, **common
        ),
        "real_test": ScannetDetectionDataset(
            real_cfg, "val", augment=False, anonymous=False, **common
        ),
        "real_cmp_test": ScannetDetectionDataset(
            cmp_cfg, "val", augment=False, anonymous=False, **common
        ),
    }
    return datasets, anon_cfg, real_cfg, cmp_cfg
