"""CLIP image-tower A/B: stock flax attention vs fused Pallas attention,
fp32 vs pure-bf16 — all four in ONE process, back-to-back (the axon tunnel
varies ±10-15% across sessions; same-session A/B only).

The tower is the round-2 roofline gap: ViT-B/16 x 256 crops = 99 ms vs a
~24 ms bf16 roofline (BASELINE.md).  This bench isolates the tower from the
stage-1 step so each (attention, dtype) cell compiles in ~60-90 s instead of
recompiling the full fused stage step.

Timing drain: np.asarray(jnp.sum(out)) — a scalar leaf, so neither the host
transfer of the (256, 512) embeddings nor XLA DCE pollutes the number.

Usage: timeout 1150 python scripts/bench_clip_tower.py [--crops 256]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    cli = argparse.ArgumentParser()
    cli.add_argument("--crops", type=int, default=256)
    cli.add_argument("--iters", type=int, default=10)
    cli_args = cli.parse_args()

    import jax
    import jax.numpy as jnp

    from coda_neurips2023_tpu.models import clip as clip_mod

    print(f"backend: {jax.default_backend()}", flush=True)
    crops = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (cli_args.crops, 224, 224, 3), np.float32
        )
    )

    results = {}
    for dtype_name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = clip_mod.CLIP(dtype=dtype)
        vars0 = model.init(
            jax.random.PRNGKey(0),
            crops[:1],
            jnp.zeros((1, 77), jnp.int32),
        )
        if dtype == jnp.bfloat16:
            # pure-bf16 mode: params live in bf16 (stages.py clip_dtype=bf16)
            vars0 = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32
                else a,
                vars0,
            )
        for attn_name in ("stock", "fused"):
            clip_mod._FUSED_ATTN = "1" if attn_name == "fused" else "0"

            def fwd(v, x, _model=model):
                return jnp.sum(
                    _model.apply(v, x, method=_model.encode_image)
                )

            jfwd = jax.jit(fwd)
            t0 = time.perf_counter()
            out = jfwd(vars0, crops)
            np.asarray(out)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(cli_args.iters):
                out = jfwd(vars0, crops)
            np.asarray(out)
            dt = (time.perf_counter() - t0) / cli_args.iters * 1000
            results[(dtype_name, attn_name)] = dt
            print(
                f"[{dtype_name}/{attn_name}] {dt:.1f} ms "
                f"({cli_args.crops} crops; compile {compile_s:.0f} s)",
                flush=True,
            )

    best = min(results, key=results.get)
    print(f"best: {best[0]}/{best[1]} = {results[best]:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
