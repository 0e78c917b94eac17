"""Backward-pass component timing: the train step is fwd 76 ms + criterion
11 ms + bwd/opt ~49 ms (scripts/profile_train.py).  The suspects in the
backward are the gather VJPs (XLA scatter-add into the 20k-point cloud).
Times grad-of-group_points / gather_points at the SA shapes, plus the
pre-encoder and encoder fwd+bwd in isolation.  Not part of the suite.
"""

import os
import sys
import time

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
    from coda_neurips2023_tpu.ops.grouping import ball_query, group_points
    from coda_neurips2023_tpu.ops.sampling import furthest_point_sample, gather_points

    B, N, M, K = 8, 20000, 2048, 64
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32) * 2)
    feats = jnp.asarray(rng.standard_normal((B, N, 6)).astype(np.float32))

    inds = jax.jit(lambda x: furthest_point_sample(x, M))(xyz)
    centers = jax.jit(gather_points)(xyz, inds)
    idx = jax.jit(lambda x, c: ball_query(0.2, K, x, c))(xyz, centers)

    # fwd group
    g_fwd = jax.jit(lambda f: group_points(f, idx).sum())
    print(f"group fwd  (B8 N20k M2048 K64 C6):  {timeit(g_fwd, feats):7.1f} ms")

    # bwd group = scatter-add of (B, M, K, C) into (B, N, C)
    g_bwd = jax.jit(jax.grad(lambda f: (group_points(f, idx) ** 2).sum()))
    print(f"group fwd+bwd:                      {timeit(g_bwd, feats):7.1f} ms")

    # bwd gather (FPS gather): (B, M, C) into (B, N, C)
    ga_bwd = jax.jit(jax.grad(lambda f: (gather_points(f, inds) ** 2).sum()))
    print(f"gather fwd+bwd:                     {timeit(ga_bwd, feats):7.1f} ms")

    # pre-encoder + encoder in isolation, fwd vs fwd+bwd
    from coda_neurips2023_tpu.datasets.config import SunrgbdAnonymousConfig
    from coda_neurips2023_tpu.models.model_3detr import CoDA3DETR

    cfg = SunrgbdAnonymousConfig()
    model = CoDA3DETR(dataset_config=cfg)
    inputs = {
        "point_clouds": jnp.concatenate([xyz, jnp.zeros((B, N, 0))], axis=-1),
        "point_cloud_dims_min": xyz.min(axis=1),
        "point_cloud_dims_max": xyz.max(axis=1),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), {k: v[:1] for k, v in inputs.items()}
    )

    # sum over ALL leaves -- summing only enc_xyz lets XLA DCE the whole
    # encoder (enc_xyz = gathered FPS points for the vanilla encoder)
    enc = jax.jit(
        lambda v, i: sum(
            x.sum()
            for x in jax.tree.leaves(
                model.apply(v, i, train=False, encoder_only=True)
            )
            if jnp.issubdtype(x.dtype, jnp.floating)
        )
    )
    print(f"pre-enc+encoder fwd:                {timeit(enc, variables, inputs):7.1f} ms")

    def enc_loss(p, i):
        out = model.apply({**variables, "params": p}, i, train=False, encoder_only=True)
        return sum(
            x.sum()
            for x in jax.tree.leaves(out)
            if jnp.issubdtype(x.dtype, jnp.floating)
        )

    # drain a GRAD leaf: returning only the value lets XLA DCE the backward
    enc_bwd = jax.jit(jax.grad(enc_loss))
    t = timeit(lambda: enc_bwd(variables["params"], inputs))
    print(f"pre-enc+encoder fwd+bwd(params):    {t:7.1f} ms")


if __name__ == "__main__":
    main()
