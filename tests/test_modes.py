"""Secondary CLI modes over the synthetic dataset (tiny model, CPU mesh)."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import os
import types

import numpy as np
import pytest

import jax

from coda_neurips2023_tpu import modes
from coda_neurips2023_tpu.datasets.config import SunrgbdAnonymousConfig, SunrgbdImageConfig
from coda_neurips2023_tpu.datasets.synthetic import SyntheticDetectionDataset
from coda_neurips2023_tpu.datasets.loader import make_loader
from coda_neurips2023_tpu.engine import create_train_state, make_eval_step
from coda_neurips2023_tpu.models.model_3detr import CoDA3DETR
from coda_neurips2023_tpu.optimizer import build_optimizer
from coda_neurips2023_tpu.stages import StageContext
from tests_stage_helpers import stage_args, tiny_clip


@pytest.fixture(scope="module")
def setup():
    cfg = SunrgbdAnonymousConfig()
    model = CoDA3DETR(
        dataset_config=cfg, enc_dim=32, dec_dim=64, enc_nlayers=1, dec_nlayers=2,
        enc_ffn_dim=32, dec_ffn_dim=32, preenc_npoints=64, nqueries=16,
    )
    ds = SyntheticDetectionDataset(cfg, num_scenes=2, num_points=256, with_images=True)
    loader = make_loader(ds, 2, num_workers=1)
    args = types.SimpleNamespace(
        base_lr=5e-4, warm_lr=1e-6, warm_lr_epochs=2, final_lr=1e-6,
        lr_scheduler="cosine", weight_decay=0.1, filter_biases_wd=False,
        clip_gradient=0.1, max_epoch=4,
    )
    tx, _ = build_optimizer(args, None, 4)
    batch = next(iter(loader))
    arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
    state = create_train_state(model, tx, jax.random.PRNGKey(0), arrays)
    sargs = stage_args()
    stage_ctx = StageContext(sargs, SunrgbdImageConfig(), clip_model=tiny_clip(), crop_size=16)
    return model, state, loader, stage_ctx


def test_show_boxes(setup, tmp_path):
    model, state, loader, _ = setup
    n = modes.show_boxes(model, state, loader, str(tmp_path))
    assert n == 2
    files = os.listdir(tmp_path)
    assert any(f.endswith("_pc.ply") for f in files)


def test_save_seen_feats(setup, tmp_path):
    model, state, loader, stage_ctx = setup
    n = modes.save_seen_feats(model, state, loader, stage_ctx, str(tmp_path))
    assert n > 0
    files = [f for f in os.listdir(tmp_path) if f.endswith("_seen_feat.npy")]
    assert len(files) == 2
    emb = np.load(os.path.join(tmp_path, files[0]))
    assert emb.shape[1] == 512 or emb.shape[1] == 16


def test_crop_boxes(setup, tmp_path):
    cv2 = pytest.importorskip("cv2")
    model, state, loader, stage_ctx = setup
    n = modes.crop_boxes(model, state, loader, stage_ctx, str(tmp_path), max_per_scene=2)
    assert n == 4
    assert len([f for f in os.listdir(tmp_path) if f.endswith(".png")]) == 4


def test_class_confusion(setup):
    model, state, loader, stage_ctx = setup
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    text = rng.standard_normal((5, 512)).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=1, keepdims=True))
    eval_step = make_eval_step(model, eval_text_features=text)
    confusion = modes.calculate_class_confusion(eval_step, state, loader, 5)
    assert confusion.shape == (5, 5)
    assert confusion.sum() >= 0


def test_show_boxes_after_nms(setup, tmp_path):
    """--if_after_nms writes only NMS-surviving predicted boxes."""
    model, state, loader, stage_ctx = setup
    batch = next(iter(loader))
    n = modes.show_boxes(model, state, [batch], str(tmp_path / "nms"),
                         objectness_thresh=0.0, after_nms=True)
    assert n > 0
    n2 = modes.show_boxes(model, state, [batch], str(tmp_path / "raw"),
                          objectness_thresh=0.0, after_nms=False)
    assert n2 == n
    # NMS must not write MORE box lines than the raw mode
    def obj_lines(d):
        total = 0
        for f in os.listdir(d):
            if f.endswith("_pred_boxes.obj"):
                total += sum(1 for l in open(os.path.join(d, f)) if l.startswith("v "))
        return total
    assert obj_lines(tmp_path / "nms") <= obj_lines(tmp_path / "raw")


def test_save_box_points_mode(setup, tmp_path):
    model, state, loader, stage_ctx = setup
    batch = next(iter(loader))
    n = modes.save_box_points(model, state, [batch], str(tmp_path),
                              objectness_thresh=0.0, min_points=1)
    files = os.listdir(tmp_path)
    assert n > 0
    assert any(f.endswith("_pred_box.npy") for f in files)
    assert any(f.endswith("_pred_pc.npy") for f in files)
    # box file holds the 8-vector (center,size,angle,objectness)
    import numpy as np

    box = np.load(tmp_path / sorted(f for f in files if f.endswith("_pred_box.npy"))[0])
    assert box.shape == (1, 8)
