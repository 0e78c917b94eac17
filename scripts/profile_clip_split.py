"""Where do the CLIP tower's 81 ms go? Component-isolated timings at the
exact ViT-B/16 shapes (B=256 crops, S=197, W=768), back-to-back in one
process so the split is session-consistent.

Measures (bf16 unless --dtype fp32):
  matmuls : 12x [qkv(768->2304) + out(768->768) + fc(768->3072) + gelu +
            proj(3072->768)] on (B*S, W) flattened rows -- the pure MXU work
  attn    : 12x flax dot_product_attention at (B, S, H, D)
  ln      : 25x LayerNorm over (B*S, W)
  resid   : 24x elementwise adds (B, S, W)
  patch   : conv1 patch embed (B, 224, 224, 3) -> (B, 196, 768)
  tower   : the real encode_image for reference

The sum of the parts vs the tower number localizes fusion/overhead losses.
Not part of the test suite. Usage: timeout 1150 python scripts/profile_clip_split.py
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def timeit(jfn, *args, iters=10):
    out = jfn(*args)
    np.asarray(jax.tree.leaves(out)[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    np.asarray(jax.tree.leaves(out)[-1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cli = argparse.ArgumentParser()
    cli.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    cli.add_argument("--crops", type=int, default=256)
    a = cli.parse_args()

    global jax
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    dtype = jnp.bfloat16 if a.dtype == "bf16" else jnp.float32
    b, s, w, h, d = a.crops, 197, 768, 12, 64
    L = 12
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.standard_normal((b, s, w)), dtype)
    wqkv = jnp.asarray(rng.standard_normal((w, 3 * w)) * 0.02, dtype)
    wout = jnp.asarray(rng.standard_normal((w, w)) * 0.02, dtype)
    wfc = jnp.asarray(rng.standard_normal((w, 4 * w)) * 0.02, dtype)
    wproj = jnp.asarray(rng.standard_normal((4 * w, w)) * 0.02, dtype)

    def matmuls(x):
        def body(y, _):
            y = y @ wqkv[:, :w]  # qkv proj contributes 3w cols; split below
            y = y + (x.reshape(-1, w) @ wout)
            f = jax.nn.sigmoid(1.702 * (y @ wfc).astype(jnp.float32)).astype(dtype) * (y @ wfc)
            y = f @ wproj
            return y, None

        # qkv is one (w, 3w) matmul in the real tower: time it faithfully
        def layer(y, _):
            qkv = y @ wqkv  # (BS, 3w)
            y2 = qkv[:, :w] @ wout
            g = y2 @ wfc
            g = g * jax.nn.sigmoid(1.702 * g)
            y3 = g @ wproj
            return y3, None

        y, _ = jax.lax.scan(layer, x.reshape(-1, w), None, length=L)
        return jnp.sum(y)

    t_mm = timeit(jax.jit(matmuls), x)

    q = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype)

    def attn(q):
        def layer(y, _):
            o = nn.dot_product_attention(y, y, y)
            return o, None

        y, _ = jax.lax.scan(layer, q, None, length=L)
        return jnp.sum(y)

    t_attn = timeit(jax.jit(attn), q)

    ln = nn.LayerNorm(epsilon=1e-5, dtype=dtype)
    lnv = ln.init(jax.random.PRNGKey(0), x)

    def lns(x):
        def layer(y, _):
            return ln.apply(lnv, y), None

        y, _ = jax.lax.scan(layer, x, None, length=25)
        return jnp.sum(y)

    t_ln = timeit(jax.jit(lns), x)

    def resid(x):
        def layer(y, _):
            return y + x, None

        y, _ = jax.lax.scan(layer, x, None, length=24)
        return jnp.sum(y)

    t_res = timeit(jax.jit(resid), x)

    img = jnp.asarray(rng.standard_normal((b, 224, 224, 3)), jnp.float32)
    conv = nn.Conv(w, kernel_size=(16, 16), strides=(16, 16), use_bias=False,
                   dtype=dtype)
    cv = conv.init(jax.random.PRNGKey(0), img[:1])
    t_patch = timeit(jax.jit(lambda i: jnp.sum(conv.apply(cv, i))), img)

    from coda_neurips2023_tpu.models import clip as clip_mod

    model = clip_mod.CLIP(dtype=dtype)
    vars0 = model.init(jax.random.PRNGKey(0), img[:1],
                       jnp.zeros((1, 77), jnp.int32))
    if dtype == jnp.bfloat16:
        vars0 = jax.tree.map(
            lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t,
            vars0,
        )
    t_tower = timeit(
        jax.jit(lambda v, i: jnp.sum(model.apply(v, i, method=model.encode_image))),
        vars0, img,
    )

    flops_mm = 2 * b * s * w * (3 * w + w + 4 * w + 4 * w) * L
    print(f"dtype {a.dtype}, crops {b}")
    print(f"matmuls x12          : {t_mm:7.2f} ms  "
          f"({flops_mm / t_mm / 1e9:6.1f} TFLOP/s)")
    print(f"attention x12 (stock): {t_attn:7.2f} ms")
    print(f"layernorm x25        : {t_ln:7.2f} ms")
    print(f"residual adds x24    : {t_res:7.2f} ms")
    print(f"patch conv           : {t_patch:7.2f} ms")
    parts = t_mm + t_attn + t_ln + t_res + t_patch
    print(f"sum of parts         : {parts:7.2f} ms")
    print(f"real tower           : {t_tower:7.2f} ms "
          f"(overhead vs parts {t_tower - parts:+.2f} ms)")


if __name__ == "__main__":
    main()
