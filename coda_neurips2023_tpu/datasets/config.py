"""Dataset configuration objects.

Re-implementations of the reference dataset-config classes (the anonymous
OV-training configs and the named eval configs):
  * SUN RGB-D: /root/reference/datasets/sunrgbd_anonymous_aligned_image_with_novel_cate_confi.py:86-300
    (num_angle_bin=12, rotated boxes, camera-frame corner parametrization)
  * ScanNet:   /root/reference/datasets/scannet50_image.py:45-161
    (axis-aligned: num_angle_bin=1, seen/novel index buckets from train/test
    ranges)

Class-name vocabularies are loaded from .npy asset files when an asset dir is
supplied (same file contracts as the reference: dict name->id for SUN RGB-D
v1/v2, list of names for ScanNet-200 and the cmp/LVIS vocabularies);
otherwise synthetic placeholder names keep everything runnable without the
licensed data drop.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from coda_neurips2023_tpu.ops import box_ops

# Asset filenames (contract identical to the reference's datasets/*.npy)
SUNRGBD_CLASSES_V1 = "all_classes_trainval_v1.npy"
SUNRGBD_CLASSES_V2 = "all_classes_trainval_v2_revised_del_val_less_than_5_classes.npy"
SCANNET_CLASSES = "scannet_200_classname_no_wall_floor.npy"
CMP_CLASSES_SUNRGBD = "ov_3detr.npy"
CMP_CLASSES_SCANNET = "ov_3detr_scannet.npy"
SUPERSET_CLASSES = "lvis_1204.npy"


def _load_type2class(asset_dir: Optional[str], filename: str, fallback_n: int):
    if asset_dir:
        path = os.path.join(asset_dir, filename)
        if os.path.exists(path):
            obj = np.load(path, allow_pickle=True)
            try:
                return dict(obj.item())
            except (ValueError, AttributeError):
                return {str(name): i for i, name in enumerate(list(obj))}
    return {f"class_{i:04d}": i for i in range(fallback_n)}


class DatasetConfigBase:
    """Shared angle-bin + corner parametrization API (the part of the
    reference config objects the model/criterion/AP stack depend on)."""

    num_semcls: int = 1
    num_angle_bin: int = 12
    max_num_obj: int = 64

    def angle2class(self, angle):
        return box_ops.angle2class(angle, self.num_angle_bin)

    def class2angle(self, cls, residual):
        return box_ops.class2angle(cls, residual, self.num_angle_bin)

    def class2anglebatch(self, cls, residual):
        return box_ops.class2angle(cls, residual, self.num_angle_bin)

    def box_parametrization_to_corners(self, center_unnorm, size, angle):
        center_upright = box_ops.flip_axis_to_camera(center_unnorm)
        return box_ops.get_3d_box_batch(size, angle, center_upright)

    def box_parametrization_to_corners_xyz(self, center_unnorm, size, angle):
        return box_ops.get_3d_box_batch_xyz(size, angle, center_unnorm)

    def my_compute_box_3d(self, center, size, heading_angle):
        return box_ops.my_compute_box_3d(center, size, heading_angle)


class SunrgbdAnonymousConfig(DatasetConfigBase):
    """OV-SUN RGB-D training config: class-agnostic ("anonymous") GT, 12 angle
    bins, train/test class ranges for the open-vocabulary protocol."""

    def __init__(
        self,
        asset_dir: Optional[str] = None,
        use_v1: bool = True,
        train_range=(0, 10),
        test_range=(0, 46),
        image_size=(730, 531),
    ):
        self.num_semcls = 1
        self.num_angle_bin = 12
        self.max_num_obj = 64
        self.type2class = _load_type2class(
            asset_dir, SUNRGBD_CLASSES_V1 if use_v1 else SUNRGBD_CLASSES_V2, test_range[1]
        )
        self.class2type = {v: k for k, v in self.type2class.items()}
        self.train_range = list(range(*train_range))
        self.test_range = list(range(*test_range))
        self.train_max = train_range[1]
        self.test_max = test_range[1]
        self.image_size = list(image_size)
        self.if_padding_image = True


class SunrgbdImageConfig(SunrgbdAnonymousConfig):
    """46-class `sunrgbd_image` real-test eval config
    (/root/reference/datasets/sunrgbd_image.py): named classes, frequency
    buckets mAP_fre[:4] / common[4:10] / base[:10] / novel[10:]."""

    def __init__(self, asset_dir=None, use_v1=True, num_semcls=46, **kw):
        super().__init__(asset_dir, use_v1, **kw)
        self.num_semcls = num_semcls


class ScannetAnonymousConfig(DatasetConfigBase):
    """OV-ScanNet training config: axis-aligned boxes (num_angle_bin=1)."""

    def __init__(
        self,
        asset_dir: Optional[str] = None,
        train_range=(0, 10),
        test_range=(0, 60),
        image_size=(1296, 968),
    ):
        self.num_semcls = 1
        self.num_angle_bin = 1
        self.max_num_obj = 64
        self.type2class = _load_type2class(asset_dir, SCANNET_CLASSES, test_range[1])
        self.class2type = {v: k for k, v in self.type2class.items()}
        self.train_range = list(range(*train_range))
        self.test_range = list(range(*test_range))
        self.train_max = train_range[1]
        self.test_max = test_range[1]
        self.image_size = list(image_size)
        self.if_padding_image = True


class Scannet50ImageConfig(ScannetAnonymousConfig):
    """60-class `scannet50_image` eval config with seen/novel idx buckets
    (/root/reference/datasets/scannet50_image.py:116-122).

    With `train_range_list`/`test_range_list` (raw ScanNet-200 class ids, the
    shipped scripts' --train_range_list/--test_range_list) the vocabulary is
    rebuilt exactly like the reference (scannet50_image.py:38-122): eval
    classes = the seen ids + the first `reset_scannet_num` UNSEEN test ids in
    test-list order, sorted; ids map to contiguous indices; seen/novel idx
    buckets follow that mapping.  Without lists, falls back to contiguous
    index ranges."""

    def __init__(self, asset_dir=None, num_semcls=60, train_range=(0, 10),
                 test_range=(0, 60), train_range_list=None, test_range_list=None,
                 reset_scannet_num=50, **kw):
        super().__init__(asset_dir, train_range, test_range, **kw)
        self.num_semcls = num_semcls
        if train_range_list and test_range_list:
            self.reset_scannet_num = reset_scannet_num
            self.num_semcls = len(train_range_list) + reset_scannet_num
            self.train_range_list = list(train_range_list)
            eval_ids = list(train_range_list)
            cnt = 0
            for cid in test_range_list:
                if cid in train_range_list:
                    continue
                eval_ids.append(cid)
                cnt += 1
                if cnt >= reset_scannet_num:
                    break
            self.test_range_list = sorted(eval_ids)
            self.class_id_to_idx = {cid: i for i, cid in enumerate(self.test_range_list)}
            # class names: keep only the selected ids (reference maps through
            # the scannet-200 name->id table, scannet50_image.py:73-108)
            self.class2type = {
                self.class_id_to_idx[cid]: self.class2type.get(cid, str(cid))
                for cid in self.test_range_list
            }
            self.seen_idx_list = [self.class_id_to_idx[c] for c in train_range_list]
            self.novel_idx_list = [
                self.class_id_to_idx[c]
                for c in self.test_range_list
                if c not in train_range_list
            ]
        else:
            self.seen_idx_list = list(range(*train_range))
            self.novel_idx_list = [
                i for i in range(*test_range) if i not in self.seen_idx_list
            ]
