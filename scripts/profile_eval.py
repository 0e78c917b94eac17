"""Component-level timing of the eval forward on the real chip.

Times sub-jits of the flagship model at the bench shape (bs 32, 20k points):
FPS, ball query+group, pre-encoder MLP, encoder, query selection, decoder,
heads -- to direct optimization work. Not part of the test suite.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _drain(out):
    """Force completion via a host transfer of one SMALL leaf --
    jax.block_until_ready can no-op through the axon tunnel for small
    executables, but transferring a BIG leaf measures the tunnel, not the
    kernel (a 50 MB group output inflates its timing ~6x; see BASELINE.md
    methodology note).  Every timed fn below therefore reduces its output
    to a scalar inside the jit."""
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
    from __graft_entry__ import _flagship, _synthetic_batch
    from coda_neurips2023_tpu.ops.grouping import ball_query, group_points
    from coda_neurips2023_tpu.ops.sampling import furthest_point_sample, gather_points

    B, N = 32, 20000
    model, cfg = _flagship(tiny=False)
    batch = _synthetic_batch(cfg, batch_size=B, num_points=N)
    inputs = {
        "point_clouds": jnp.asarray(batch["point_clouds"]),
        "point_cloud_dims_min": jnp.asarray(batch["point_cloud_dims_min"]),
        "point_cloud_dims_max": jnp.asarray(batch["point_cloud_dims_max"]),
    }
    init_inputs = {k: v[:1] for k, v in inputs.items()}
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), init_inputs
    )

    xyz = inputs["point_clouds"][..., :3]

    fps = jax.jit(lambda x: furthest_point_sample(x, 2048))
    fps_s = jax.jit(lambda x: furthest_point_sample(x, 2048).sum())
    t_fps = timeit(fps_s, xyz)
    inds = fps(xyz)
    centers = jax.jit(gather_points)(xyz, inds)

    bq = jax.jit(lambda x, c: ball_query(0.2, 64, x, c))
    bq_s = jax.jit(lambda x, c: ball_query(0.2, 64, x, c).sum())
    t_bq = timeit(bq_s, xyz, centers)
    idx = bq(xyz, centers)

    grp_s = jax.jit(lambda f, i: group_points(f, i).sum())  # channels-last
    t_grp = timeit(grp_s, xyz, idx)

    q_fps = jax.jit(lambda c: furthest_point_sample(c, 128).sum())
    t_qfps = timeit(q_fps, centers)

    enc_only = jax.jit(
        lambda v, i: sum(
            x.sum()
            for x in jax.tree.leaves(model.apply(v, i, train=False, encoder_only=True))
            if jnp.issubdtype(x.dtype, jnp.floating)
        )
    )
    t_enc = timeit(enc_only, variables, inputs)

    full = jax.jit(lambda v, i: model.apply(v, i, train=False)["box_corners"].sum())
    t_full = timeit(full, variables, inputs)

    print(f"bs {B}, N {N}")
    print(f"FPS 20000->2048          : {t_fps:7.1f} ms")
    print(f"ball query r.2 k64       : {t_bq:7.1f} ms")
    print(f"group_points xyz         : {t_grp:7.1f} ms")
    print(f"query FPS 2048->128      : {t_qfps:7.1f} ms")
    print(f"encoder path (pre+enc+proj): {t_enc:7.1f} ms")
    print(f"FULL eval forward        : {t_full:7.1f} ms")
    print(f"  decoder+heads (full-enc): {t_full - t_enc:7.1f} ms")


if __name__ == "__main__":
    main()
