"""On-chip A/B: sort-assisted ball query vs the v3 windowed-insert default.

    timeout 1150 python scripts/bench_bq_sorted.py

Hot eval shape (B=32, N=20000, M=2048, r=0.2, k=64) on the synthetic scene
generator (same data as bench.py) AND on uniform clouds (the two extremes the
earlier sweeps used).  For each dataset: report the fallback status (whether
any candidate window overflows the static width -- if so the sorted wrapper
silently times as v3 and the number is meaningless), check bit-identity vs
the v1 adaptive kernel, then time end-to-end (the sorted wrapper INCLUDES its
XLA-side block argsorts/gathers -- that preprocessing is part of the op's
real cost).  CODA_BQS_WS/CODA_BQS_TM sweeps via env re-import.
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
SWEEP = [(640, 128), (512, 128), (896, 128), (640, 64)]  # (WS, TM)
if os.environ.get("CODA_BQS_SWEEP"):
    SWEEP = [
        tuple(int(v) for v in item.split("x"))
        for item in os.environ["CODA_BQS_SWEEP"].split(",")
    ]


def _drain(x):
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
    xyz_syn = jnp.asarray(batch["point_clouds"][..., :3])
    rng = np.random.default_rng(0)
    xyz_uni = jnp.asarray(
        (rng.random((B, N, 3)) * np.array([6.0, 6.0, 3.0]) - 3.0).astype(np.float32)
    )

    import coda_neurips2023_tpu.ops.pallas_ball_query as bq
    import coda_neurips2023_tpu.ops.pallas_ball_query_sorted as bqs

    for label, xyz in [("synthetic", xyz_syn), ("uniform", xyz_uni)]:
        idx = furthest_point_sample(xyz, M)
        new_xyz = gather_points(xyz, idx)
        ref = np.asarray(bq.ball_query_pallas(RADIUS, K, xyz, new_xyz))
        t_v3 = timeit(
            lambda a, b: bq.ball_query_pallas_v3(RADIUS, K, a, b), xyz, new_xyz
        )
        print(f"[{label}] v3 windowed (default): {t_v3:7.2f} ms", flush=True)

        for ws, tm in SWEEP:
            os.environ["CODA_BQS_WS"] = str(ws)
            os.environ["CODA_BQS_TM"] = str(tm)
            importlib.reload(bqs)
            try:
                span, ovf = bqs.window_spans(RADIUS, xyz, new_xyz)
                span_max = int(np.asarray(jnp.max(span)))
                fallback = bool(np.asarray(ovf))
                got = np.asarray(
                    bqs.ball_query_pallas_sorted(RADIUS, K, xyz, new_xyz)
                )
                if not np.array_equal(got, ref):
                    print(
                        f"[{label}] sorted WS={ws} TM={tm}: MISMATCH vs v1 -- skipped"
                    )
                    continue
                t = timeit(
                    lambda a, b: bqs.ball_query_pallas_sorted(RADIUS, K, a, b),
                    xyz,
                    new_xyz,
                )
            except Exception as e:
                print(
                    f"[{label}] sorted WS={ws} TM={tm}: FAILED "
                    f"({type(e).__name__}: {e})"[:220]
                )
                continue
            note = " (FALLBACK->v3: window overflow)" if fallback else ""
            print(
                f"[{label}] sorted WS={ws:4d} TM={tm:3d}: {t:7.2f} ms  "
                f"max span {span_max:4d}  ({t_v3 / t:4.2f}x vs v3){note}",
                flush=True,
            )


if __name__ == "__main__":
    main()
