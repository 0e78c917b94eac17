"""Component-level timing of the stage-1 phase-A pipeline on the real chip.

Decomposes the CLIP-distillation targets step (bs 8, 32 crops/sample) into:
train-mode forward, projection+rects, crop-resize matmuls, CLIP tower,
scatter/weak-labels -- to direct optimization work. Not part of the suite.
"""

import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _drain(out):
    leaf = jax.tree.leaves(out)[-1]
    np.asarray(leaf)


def timeit(fn, *args, iters=8, warmup=2):
    out = fn(*args)
    _drain(out)
    for _ in range(warmup):
        _drain(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from coda_neurips2023_tpu.datasets.config import SunrgbdAnonymousConfig
    from coda_neurips2023_tpu.datasets.synthetic import (
        SyntheticDetectionDataset,
        collate,
    )
    from coda_neurips2023_tpu.models.clip import CLIP
    from coda_neurips2023_tpu.models.distillation import (
        corners_to_image_rects,
        crop_square_resize_white,
        preprocess_crops,
        unaugment_corners,
    )
    from coda_neurips2023_tpu.models.model_3detr import CoDA3DETR

    B, N, NSEL, S = 8, 20000, 32, 224
    cfg = SunrgbdAnonymousConfig()
    model = CoDA3DETR(dataset_config=cfg)
    ds = SyntheticDetectionDataset(
        cfg, num_scenes=B, num_points=N, with_images=True, image_hw=(531, 730)
    )
    batch = collate([ds[i] for i in range(B)])
    batch = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)}

    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), {k: v[:1] for k, v in batch.items()}
    )
    rng = jax.random.PRNGKey(1)

    fwd = jax.jit(
        lambda v, b, r: model.apply(
            v, b, train=True, rngs={"dropout": r}, mutable=["batch_stats"]
        )[0]
    )
    outputs = fwd(variables, batch, rng)
    t_fwd = timeit(lambda: fwd(variables, batch, rng)["box_corners"])
    print(f"train-mode forward:       {t_fwd:7.1f} ms")

    last = {k: v[-1] for k, v in outputs.items() if hasattr(v, "ndim") and v.ndim > 0}
    corners_xyz = jax.lax.stop_gradient(last["box_corners_xyz"])

    # projection + rects
    def rects_fn(c):
        un = unaugment_corners(
            c, batch["scale_array"], batch["rot_array"], batch["flip_array"],
            batch.get("zx_flip_array"),
        )
        return corners_to_image_rects(
            un, batch["K"], batch["Rtilt"], batch["ori_width"],
            batch["ori_height"], batch["x_offset"], batch["y_offset"],
            batch["image_flip_array"], batch["flip_length"],
        )
    rects_jit = jax.jit(rects_fn)
    t_rects = timeit(rects_jit, corners_xyz)
    print(f"unaugment + project:      {t_rects:7.1f} ms")

    rects, _depth = rects_jit(corners_xyz)
    sel = jax.vmap(lambda k: jax.random.permutation(k, rects.shape[1])[:NSEL])(
        jax.random.split(rng, B)
    )
    sel_rects = jnp.take_along_axis(rects, sel[..., None], axis=1)

    def crops_fn(images, sr):
        crops = jax.vmap(
            lambda img, rcts: jax.vmap(
                lambda r: crop_square_resize_white(img, r, S)
            )(rcts)
        )(images, sr)
        return preprocess_crops(crops.reshape(B * NSEL, S, S, 3))

    images = batch["input_image"].astype(jnp.float32)
    crops_jit = jax.jit(crops_fn)
    # time via a scalar reduction: transferring the (256,224,224,3) crop
    # tensor through the tunnel would dominate the measurement
    crops_scalar = jax.jit(lambda im, sr: crops_fn(im, sr).sum())
    t_crops = timeit(crops_scalar, images, sel_rects)
    print(f"crop-resize x{B*NSEL}:        {t_crops:7.1f} ms")

    crops = crops_jit(images, sel_rects)

    clip_model = CLIP()
    clip_vars = jax.jit(
        lambda r: clip_model.init(
            r,
            jnp.zeros((1, S, S, 3), jnp.float32),
            jnp.zeros((1, clip_model.context_length), jnp.int32),
        )
    )(jax.random.PRNGKey(0))
    clip_fn = jax.jit(
        lambda v, im: clip_model.apply(v, im, method=clip_model.encode_image)
    )
    t_clip = timeit(clip_fn, clip_vars, crops)
    print(f"CLIP ViT-B/16 x{B*NSEL}:      {t_clip:7.1f} ms")


if __name__ == "__main__":
    main()
