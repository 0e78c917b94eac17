"""Stage-2 discovery cycle live parity at the EPOCH level (round-3 verdict
item 10): the reference's actual torch discovery+save path
(`…nms_iou_save_keep_clip_driven_with_cate_confidence`, invoked inside
forward on save epochs — /root/reference/models/model_3detr.py:1212-1541)
and our jitted discovery (models/discovery.py via
stages.run_discovery_and_write) run on identical tiny on-disk scenes with
identical converted weights across TWO pseudo-label accumulation rounds;
the written `*_novel_bbox.npy` files must agree row-for-row.  Driven by
scripts/stage2_live_parity.py (also the protocol for real released
checkpoints)."""

import importlib.util
import os
import sys

import pytest

torch = pytest.importorskip("torch")

from tests.ref_import import reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(), reason="reference tree absent"),
]


def _load_harness():
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "scripts", "stage2_live_parity.py")
    spec = importlib.util.spec_from_file_location("stage2_live_parity", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["stage2_live_parity"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_stage2_pseudo_label_cycle_parity():
    h = _load_harness()
    # tol 5e-3: the two CLIP image towers (torch vs flax, same fabricated
    # weights) drift at float level through 12 ViT layers; measured worst
    # row delta is ~4e-3 with zero label/count mismatches
    bad, lines = h.run_parity(scans=4, points=2048, tol=5e-3, rounds=2)
    assert bad == 0, "\n".join(lines)
