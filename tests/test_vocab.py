"""Real vocabulary banks: LVIS-1201 superset, OV-3DETR cmp, ScanNet id maps.

Anchors: /root/reference/models/model_3detr.py:286-360 (superset/cmp bank
construction), datasets/sunrgbd_cmp_image.py:86-197 and
scannet_cmp_image.py:36-90 (cmp eval configs), scannet50_image.py:38-122.
"""

import numpy as np
import pytest

from coda_neurips2023_tpu.datasets.config import (
    CMP_RAW_IDS_SCANNET,
    CMP_RAW_IDS_SUNRGBD,
    DEFAULT_ASSET_DIR,
    Scannet50ImageConfig,
    ScannetCmpImageConfig,
    SunrgbdCmpImageConfig,
    SunrgbdImageConfig,
    load_cmp_names,
    load_superset_names,
)
from coda_neurips2023_tpu.models.text_bank import (
    build_text_banks,
    prompt,
    superset_prompt_list,
)

# shipped scannet stage-2 script lists (scripts/coda_scannet_stage2.sh)
SCANNET_TRAIN_LIST = [2, 4, 5, 7, 13, 15, 16, 22, 56, 1163]
SCANNET_TEST_LIST = [
    2, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 21, 22, 23, 24,
    26, 27, 28, 29, 31, 32, 33, 34, 35, 36, 38, 39, 40, 41, 42, 44, 45, 46,
    47, 48, 49, 50, 51, 52, 54, 55, 56, 57, 58, 59, 62, 63, 64, 65, 66, 67,
    68, 69, 70, 71,
]


def test_assets_ship_with_package():
    assert load_superset_names() is not None
    assert len(load_superset_names()) == 1203  # lvis_1204 minus the 'name' header
    assert len(load_cmp_names(scannet=False)) == 20
    assert len(load_cmp_names(scannet=True)) == 19


def test_sunrgbd_superset_is_1201_seen_first():
    cfg = SunrgbdImageConfig()
    sup = load_superset_names()
    keys = superset_prompt_list(cfg.vocab_names, sup, seen_idx=range(10))
    # reference asserts exactly 1201 for SUN RGB-D v1 (model_3detr.py:321)
    assert len(keys) == 1201
    # seen classes first, in vocabulary order
    assert keys[:10] == [prompt(n) for n in cfg.vocab_names[:10]]
    # reference-exact dedup order: replay the reference algorithm
    expected = []
    for p in [prompt(n) for n in cfg.vocab_names[:10]]:
        if p not in expected:
            expected.append(p)
    for p in [prompt(n) for n in sup]:
        if p not in expected:
            expected.append(p)
    assert keys == expected
    assert len(set(keys)) == len(keys)


def test_sunrgbd_banks_superset_and_cmp():
    cfg = SunrgbdImageConfig()
    banks = build_text_banks(
        cfg, train_range_max=10, test_range_max=46,
        superset_names=load_superset_names(),
        cmp_names=load_cmp_names(scannet=False),
        if_clip_more_prompts=True,
    )
    assert banks["superset"].shape == (1201, 512)
    assert banks["test"].shape == (46, 512)
    assert banks["cmp"].shape == (20, 512)
    assert not np.array_equal(banks["cmp"], banks["test"][:20])
    # superset seen rows are exactly the test-bank seen rows
    np.testing.assert_array_equal(banks["superset"][:10], banks["test"][:10])
    # rows are unit-normalized
    np.testing.assert_allclose(
        np.linalg.norm(banks["superset"], axis=1), 1.0, rtol=1e-5
    )


def test_scannet_superset_seen_rows_follow_seen_idx():
    cfg = Scannet50ImageConfig(
        train_range_list=SCANNET_TRAIN_LIST, test_range_list=SCANNET_TEST_LIST
    )
    assert len(cfg.vocab_names) == 60
    assert cfg.vocab_names[0] == "chair"  # raw id 2 is the smallest eval id
    banks = build_text_banks(
        cfg, train_range_max=10, test_range_max=60,
        superset_names=load_superset_names(),
        cmp_names=load_cmp_names(scannet=True),
        seen_idx=cfg.seen_vocab_idx,
        if_clip_more_prompts=True,
    )
    n_seen = len(cfg.seen_vocab_idx)
    assert n_seen == 10
    np.testing.assert_array_equal(
        banks["superset"][:n_seen], banks["test"][cfg.seen_vocab_idx]
    )
    assert banks["cmp"].shape == (19, 512)
    # reference asserts 1216/1203/... for scannet supersets; ours must be
    # n_seen + additions with prompt-level dedup
    assert banks["superset"].shape[0] == len(banks["superset_prompts"])
    assert len(set(banks["superset_prompts"])) == banks["superset"].shape[0]


def test_scannet50_eval_names_map_raw_ids():
    cfg = Scannet50ImageConfig(
        train_range_list=SCANNET_TRAIN_LIST, test_range_list=SCANNET_TEST_LIST
    )
    # raw id 2 = chair, 4 = table, 5 = door (scannet_200_class2id.npy)
    assert cfg.class2type[cfg.class_id_to_idx[2]] == "chair"
    assert cfg.class2type[cfg.class_id_to_idx[4]] == "table"
    assert cfg.class2type[cfg.class_id_to_idx[5]] == "door"
    assert cfg.num_semcls == 60
    assert len(cfg.seen_idx_list) == 10 and len(cfg.novel_idx_list) == 50


def test_cmp_configs_match_reference_id_maps():
    s = SunrgbdCmpImageConfig()
    assert s.num_semcls == 20
    assert s.test_class_to_dix == {cid: i for i, cid in enumerate(CMP_RAW_IDS_SUNRGBD)}
    # cmp index order == ov_3detr.npy name order == v1 id->name of the raw ids
    assert s.vocab_names[0] == "chair" and s.vocab_names[1] == "table"
    c = ScannetCmpImageConfig()
    assert c.num_semcls == 19
    assert c.vocab_names == load_cmp_names(scannet=True)
    # class_id_to_idx name order must agree with the scannet class2id table
    from coda_neurips2023_tpu.datasets.config import SCANNET_CLASS2ID, _load_type2class

    name2id = _load_type2class(None, SCANNET_CLASS2ID, 0)
    for i, cid in enumerate(CMP_RAW_IDS_SCANNET):
        assert name2id[c.vocab_names[i]] == cid


def test_sunrgbd_cmp_dataset_gt_remap():
    """GT filtering+remap for the cmp eval split (sunrgbd_cmp_image.py:485-507)."""
    from coda_neurips2023_tpu.datasets.sunrgbd import SunrgbdDetectionDataset

    ds = SunrgbdDetectionDataset.__new__(SunrgbdDetectionDataset)
    ds.dataset_config = SunrgbdCmpImageConfig()
    ds.anonymous = False
    ds.split_set = "val"
    ds.confidence_type_in_datalayer = "non-confidence"
    boxes = np.zeros((4, 8))
    boxes[:, 7] = [0, 3, 4, 218]  # chair, sofa_chair (not cmp), desk, stool-ish
    kept, seen_cls, _ = ds._filter_boxes(boxes)
    assert kept.shape[0] == 3  # class 3 (sofa_chair) is not a cmp class
    assert kept[:, 7].tolist() == [0, 3, 19]  # chair->0, desk->3 (4th name), 218->19


def test_scannet_filters_use_raw_ids():
    from coda_neurips2023_tpu.datasets.scannet import ScannetDetectionDataset
    from coda_neurips2023_tpu.datasets.config import ScannetAnonymousConfig

    cfg = ScannetAnonymousConfig(
        train_range_list=SCANNET_TRAIN_LIST, test_range_list=SCANNET_TEST_LIST
    )
    ds = ScannetDetectionDataset.__new__(ScannetDetectionDataset)
    ds.dataset_config = cfg
    ds.anonymous = True
    ds.split_set = "train"
    ds.confidence_type_in_datalayer = "non-confidence"
    boxes = np.zeros((3, 11))
    boxes[:, 7] = [2, 3, 1163]  # chair (seen), floor (not), id 1163 (seen)
    boxes[:, -1] = 1  # real
    kept, seen_cls, confi = ds._filter_boxes(boxes)
    assert kept.shape[0] == 2
    assert kept[:, 7].tolist() == [0.0, 0.0]  # anonymized
    # weak labels are train_range_list positions (reorder map)
    assert seen_cls.tolist() == [0.0, 9.0]

    # eval split: remap raw ids to contiguous eval indices
    ecfg = Scannet50ImageConfig(
        train_range_list=SCANNET_TRAIN_LIST, test_range_list=SCANNET_TEST_LIST
    )
    ds.dataset_config = ecfg
    ds.anonymous = False
    ds.split_set = "val"
    boxes = np.zeros((2, 11))
    boxes[:, 7] = [2, 999]  # chair, unknown
    boxes[:, -1] = 1
    kept, seen_cls, _ = ds._filter_boxes(boxes)
    assert kept.shape[0] == 1
    assert kept[0, 7] == ecfg.class_id_to_idx[2]


def test_stage_context_superset_wiring():
    """With --if_clip_superset the StageContext must classify against the
    1201-row superset bank (round-1 bug: superset==test==46)."""
    import types

    from tests.test_stages import stage_args, tiny_clip
    from coda_neurips2023_tpu.stages import StageContext

    cfg = SunrgbdImageConfig()
    args = stage_args(if_clip_superset=True, dataset_name="sunrgbd_anonymous_aligned_image")
    ctx = StageContext(args, cfg, clip_model=tiny_clip(), crop_size=16)
    assert ctx.text_banks["superset"].shape[0] == 1201
    assert ctx.text_banks["cmp"].shape[0] == 20
    assert ctx.train_text_features.shape[0] == 1201  # superset drives stage-2 losses
    # (content inequality between cmp and test banks is asserted in
    # test_sunrgbd_banks_superset_and_cmp -- the tiny test CLIP clamps token
    # ids so distinct names can collapse to identical embeddings here)
