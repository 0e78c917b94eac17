"""Micro-bench: where does the fused-attention wrapper cost go?

Times, at the CLIP ViT shape (B=256 crops, S=197, H=12, D=64), back-to-back:
  a) stock flax dot_product_attention  (the XLA baseline inside the tower)
  b) fused_attention_fn                (wrapper: transpose+pad -> kernel -> un)
  c) vit_attention                     (kernel only, pre-shaped (B,H,256,D))
  d) transpose+pad alone               (the wrapper minus the kernel)

Usage: timeout 1150 python scripts/bench_attn_micro.py [--dtype bf16]
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
    cli.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    cli.add_argument("--iters", type=int, default=20)
    cli.add_argument("--kernel_only", action="store_true")
    a = cli.parse_args()

    import jax
    import jax.numpy as jnp

    from coda_neurips2023_tpu.ops import pallas_vit_attention as pva

    dtype = jnp.bfloat16 if a.dtype == "bf16" else jnp.float32
    b, s, h, d = 256, 197, 12, 64

    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, s, h, d)), dtype) for _ in range(3)
    )
    qp, kp, vp = (
        jnp.asarray(rng.standard_normal((b, h, s, d)), dtype) for _ in range(3)
    )

    import flax.linen as nn

    cases = {
        "stock flax attn": jax.jit(lambda q, k, v: jnp.sum(
            nn.dot_product_attention(q, k, v).astype(jnp.float32))),
        "fused wrapper": jax.jit(lambda q, k, v: jnp.sum(
            pva.fused_attention_fn(q, k, v).astype(jnp.float32))),
        "transpose only": jax.jit(lambda q, k, v: sum(
            jnp.sum(jnp.swapaxes(x, 1, 2).astype(jnp.float32))
            for x in (q, k, v))),
    }
    if a.kernel_only:
        cases = {}
    for name, fn in cases.items():
        out = fn(q, k, v); np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(a.iters):
            out = fn(q, k, v)
        np.asarray(out)
        print(f"{name:22s}: {(time.perf_counter()-t0)/a.iters*1000:7.2f} ms",
              flush=True)

    kern = jax.jit(lambda q, k, v: jnp.sum(
        pva.vit_attention(q, k, v).astype(jnp.float32)))
    out = kern(qp, kp, vp); np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(a.iters):
        out = kern(qp, kp, vp)
    np.asarray(out)
    print(f"{'kernel only':22s}: {(time.perf_counter()-t0)/a.iters*1000:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
