"""On-chip ball-query A/B: adaptive extraction vs v3 windowed insert + TM/W sweep.

One command for the moment the axon relay is alive (probe first:
`timeout 150 python scripts/probe_tpu.py`):

    timeout 1150 python scripts/bench_bq_sweep.py

Times ONLY the ball-query kernels at the hot eval shape (B=32, N=20000,
M=2048, r=0.2 first SA radius of the flagship config, k=64) on realistic
point clouds (the synthetic dataset's scene generator, same clustering as the
bench).  Sweeps the v3 (TM, W) tile/window sizes by re-importing the module
with CODA_BQ3_TM/W set; each variant is checked bit-identical to the v1
adaptive kernel before timing (semantics: ball_query_gpu.cu:12-48
first-hit-fill).  Prints a ranked table + the winning env settings.

NOTE each (TM, W) re-traces and re-compiles the pallas_call (~10-20 s each
through the tunnel); the whole sweep is a single process so compiles share
the in-process cache across iters but not variants.
"""

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, N, M, K = 32, 20000, 2048, 64
RADIUS = 0.2
ITERS, WARMUP = 12, 3
# override with CODA_BQ_SWEEP="32x16,64x16" for a focused re-check
SWEEP = [(8, 8), (16, 8), (16, 16), (32, 8), (32, 16), (8, 16)]
if os.environ.get("CODA_BQ_SWEEP"):
    SWEEP = [
        tuple(int(v) for v in item.split("x"))
        for item in os.environ["CODA_BQ_SWEEP"].split(",")
    ]


def _drain(x):
    # honest scalar drain (see profile_eval.py / BASELINE.md methodology)
    np.asarray(x[0, 0, 0])


def timeit(fn, *args):
    out = fn(*args)
    _drain(out)
    for _ in range(WARMUP):
        _drain(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    import jax.numpy as jnp

    from __graft_entry__ import _flagship, _synthetic_batch
    from coda_neurips2023_tpu.ops.sampling import furthest_point_sample, gather_points

    model, cfg = _flagship(tiny=False)
    batch = _synthetic_batch(cfg, batch_size=B, num_points=N)
    xyz = jnp.asarray(batch["point_clouds"][..., :3])
    idx = furthest_point_sample(xyz, M)
    new_xyz = gather_points(xyz, idx)  # channels-last: (B, M, 3)

    import coda_neurips2023_tpu.ops.pallas_ball_query as bq

    ref = np.asarray(bq.ball_query_pallas(RADIUS, K, xyz, new_xyz))
    t_v1 = timeit(lambda a, b: bq.ball_query_pallas(RADIUS, K, a, b), xyz, new_xyz)
    rows = [("adaptive(v1)", t_v1)]
    print(f"adaptive(v1): {t_v1:7.2f} ms  (current default)")

    for tm, w in SWEEP:
        os.environ["CODA_BQ3_TM"] = str(tm)
        os.environ["CODA_BQ3_W"] = str(w)
        importlib.reload(bq)
        try:
            got = np.asarray(bq.ball_query_pallas_v3(RADIUS, K, xyz, new_xyz))
            if not np.array_equal(got, ref):
                print(f"v3 TM={tm:2d} W={w:2d}: MISMATCH vs v1 -- skipped")
                continue
            t = timeit(
                lambda a, b: bq.ball_query_pallas_v3(RADIUS, K, a, b), xyz, new_xyz
            )
        except Exception as e:  # Mosaic compile pathologies are per-shape
            print(f"v3 TM={tm:2d} W={w:2d}: FAILED ({type(e).__name__}: {e})"[:200])
            continue
        rows.append((f"v3 TM={tm} W={w}", t))
        print(f"v3 TM={tm:2d} W={w:2d}: {t:7.2f} ms")

    rows.sort(key=lambda r: r[1])
    best, t_best = rows[0]
    print("\nranking:")
    for name, t in rows:
        print(f"  {name:20s} {t:7.2f} ms  ({t_v1 / t:4.2f}x vs adaptive)")
    if best.startswith("v3"):
        tm, w = best.split("TM=")[1].split(" W=")
        print(
            f"\nwinner: {best} -- enable with CODA_BQ_ALGO=window "
            f"CODA_BQ3_TM={tm} CODA_BQ3_W={w}"
        )
    else:
        print("\nwinner: adaptive(v1) -- keep the default")


if __name__ == "__main__":
    main()
