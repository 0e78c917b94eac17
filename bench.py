"""Headline benchmark: SUN RGB-D eval throughput (scenes/sec/chip).

Protocol (BASELINE.md): the reference evaluates `sunrgbd_image` with batch 48
per GPU (test_release_models.sh); the distillation head classifies via the
text-correlation embedding (no CLIP forward at eval, model_3detr.py:1742).
We time the full jitted detector forward + open-vocab scoring on
SUN RGB-D-shaped synthetic scenes (20k points) on one chip.

The reference repo publishes no wall-clock numbers (BASELINE.md), so
`vs_baseline` is reported against a fixed reference constant measured once
from the reference's own instrumentation points when the datasets/checkpoints
are available; until then it is the ratio to REF_SCENES_PER_SEC_V100 (a
placeholder pegged to this bench's first recorded round-1 value so the
series is self-consistent across rounds).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

# Round-1 anchor for cross-round comparability (see module docstring).
REF_SCENES_PER_SEC_V100 = 100.0

BATCH = 32  # reference stage-2 eval batch (scripts/coda_sunrgbd_stage2.sh)
NUM_POINTS = 20000
EVAL_CLASSES = 46
WARMUP = 2
ITERS = 8


def main(probe_ms=None):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship, _synthetic_batch
    from coda_neurips2023_tpu.engine import TrainState, make_eval_step
    from coda_neurips2023_tpu.models.model_3detr import get_class_scores

    model, cfg = _flagship(tiny=False)
    batch = _synthetic_batch(cfg, batch_size=BATCH, num_points=NUM_POINTS)
    inputs = {
        "point_clouds": jnp.asarray(batch["point_clouds"]),
        "point_cloud_dims_min": jnp.asarray(batch["point_cloud_dims_min"]),
        "point_cloud_dims_max": jnp.asarray(batch["point_cloud_dims_max"]),
    }
    # init on a batch-1 slice (params are batch-polymorphic; eager init at the
    # full eval batch would materialize every intermediate)
    init_inputs = {k: v[:1] for k, v in inputs.items()}
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), init_inputs
    )
    rng = np.random.default_rng(0)
    text = rng.standard_normal((EVAL_CLASSES, 512)).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=1, keepdims=True))

    @jax.jit
    def eval_forward(variables, inputs):
        outs = model.apply(variables, inputs, train=False)
        scores = get_class_scores(
            outs["text_correlation_embedding"][-1], text, jnp.float32(100.0)
        )
        return outs["box_corners"][-1], scores, outs["objectness_prob"][-1]

    # compile
    out = eval_forward(variables, inputs)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        jax.block_until_ready(eval_forward(variables, inputs))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = eval_forward(variables, inputs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS

    # achieved-vs-peak roofline from the compiled executable's own cost
    # analysis (utils/flops.py); the eval path is gather/VPU-bound by the
    # reference's protocol, so the HBM-utilization figure is the honest
    # headroom statement and a low MXU MFU is expected
    from coda_neurips2023_tpu.utils.flops import compiled_costs, roofline

    rf = roofline(compiled_costs(eval_forward, variables, inputs), dt)

    scenes_per_sec = BATCH / dt
    record = {
        "metric": "sunrgbd_eval_scenes_per_sec_per_chip",
        "value": round(scenes_per_sec, 2),
        "unit": "scenes/s",
        "vs_baseline": round(scenes_per_sec / REF_SCENES_PER_SEC_V100, 3),
        "baseline_note": (
            "vs_baseline divides by REF_SCENES_PER_SEC_V100=100.0, a "
            "PLACEHOLDER pegged to this bench's round-1 value (the reference "
            "repo archives no throughput; its engine.py:210-217 only prints "
            "iter times); it is a cross-round series anchor, not a measured "
            "V100 number"
        ),
    }
    record.update(rf)  # tflops_per_s / mfu / hbm_gb_per_s / hbm_util
    if probe_ms is not None:
        # tunnel-health context: tiny-jit round-trip latency measured just
        # before the bench (healthy ~1-10 ms; degraded sessions up to ~150 s
        # observed -- see BASELINE.md round-4 variance note)
        record["probe_ms"] = round(probe_ms, 2)
    print(json.dumps(record))


if __name__ == "__main__":
    from coda_neurips2023_tpu.utils.probe import (
        enable_persistent_compile_cache,
        exit_unless_backend_alive,
    )

    enable_persistent_compile_cache()

    _probe_ms = exit_unless_backend_alive(
        "sunrgbd_eval_scenes_per_sec_per_chip", "scenes/s"
    )
    main(probe_ms=_probe_ms)
