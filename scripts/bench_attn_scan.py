"""Attention A/B in a 12-layer scan (pipelined, like the real tower) at the
CLIP ViT-B/16 shape: stock flax vs the Pallas vit_attention kernel vs the
kernel fed by a packed qkv tensor (slices in XLA = the shipped QKV-concat
path's hidden cost).

Round-3/4 per-layer micro numbers (4.8 vs 4.2 ms/layer) were dispatch-bound
(one jit per layer through the axon tunnel); in-scan the same stock path
measures ~1.5 ms/layer, so kernel decisions must be re-made at scan level.

Usage: timeout 1150 python scripts/bench_attn_scan.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def timeit(jfn, *args, iters=10):
    out = jfn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from coda_neurips2023_tpu.ops.pallas_vit_attention import vit_attention

    b, s, h, d = 256, 197, 12, 64
    L = 12
    rng = np.random.default_rng(0)
    x_bshd = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    x_bhsd = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    qkv = jnp.asarray(rng.standard_normal((b, h, s, 3 * d)), jnp.bfloat16)

    def scan12(f, x0):
        def layer(y, _):
            return f(y), None

        y, _ = jax.lax.scan(layer, x0, None, length=L)
        return jnp.sum(y)

    t_stock = timeit(jax.jit(lambda x: scan12(
        lambda y: nn.dot_product_attention(y, y, y), x)), x_bshd)
    print(f"stock flax (bshd) x12      : {t_stock:7.2f} ms", flush=True)

    t_kern = timeit(jax.jit(lambda x: scan12(
        lambda y: vit_attention(y, y, y), x)), x_bhsd)
    print(f"pallas kernel (bhsd) x12   : {t_kern:7.2f} ms", flush=True)

    def packed(y):
        q, k, v = y[..., :d], y[..., d:2 * d], y[..., 2 * d:]
        o = vit_attention(q, k, v)
        return jnp.concatenate([o, o, o], axis=-1)  # keep carry shape

    t_packed = timeit(jax.jit(lambda x: scan12(packed, x)), qkv)
    print(f"kernel + XLA qkv slices x12: {t_packed:7.2f} ms", flush=True)

    # leading-dim split: (3, B, H, S, D) -- axis-0 indexing is tile-layout
    # free (no 64-offset lane slicing).  The real tower can produce this
    # layout straight off the QKV projection einsum ('bsw,wthd->tbhsd').
    qkv_t = jnp.asarray(rng.standard_normal((3, b, h, s, d)), jnp.bfloat16)

    def lead(y):
        o = vit_attention(y[0], y[1], y[2])
        return jnp.stack([o, o, o])  # keep carry shape

    t_lead = timeit(jax.jit(lambda x: scan12(lead, x)), qkv_t)
    print(f"kernel + lead-dim split x12: {t_lead:7.2f} ms", flush=True)

    qkv_ts = jnp.asarray(rng.standard_normal((3, b, s, h, d)), jnp.bfloat16)

    def lead_stock(y):
        o = nn.dot_product_attention(y[0], y[1], y[2])
        return jnp.stack([o, o, o])

    t_ls = timeit(jax.jit(lambda x: scan12(lead_stock, x)), qkv_ts)
    print(f"stock + lead-dim split x12 : {t_ls:7.2f} ms", flush=True)

    for bb in (2, 4, 8):
        os.environ["CODA_VIT_ATTN_BLOCK_B"] = str(bb)
        import importlib
        import coda_neurips2023_tpu.ops.pallas_vit_attention as pva
        importlib.reload(pva)
        try:
            t_bb = timeit(jax.jit(lambda x: scan12(
                lambda y: pva.vit_attention(y, y, y), x)), x_bhsd)
            print(f"pallas kernel BB={bb} x12    : {t_bb:7.2f} ms", flush=True)
        except Exception as e:  # compile OOM at large BB is informative
            print(f"pallas kernel BB={bb} x12    : FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)
    os.environ.pop("CODA_VIT_ATTN_BLOCK_B", None)


if __name__ == "__main__":
    main()
