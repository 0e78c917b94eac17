"""Multi-host (process_count > 1) correctness, exercised for real: two CPU
processes form a jax.distributed cluster (gloo collectives, 2 virtual devices
each) and run evaluate() + train_one_epoch() + the parallel/dist helpers over
a 4-device global mesh; a single-process oracle runs the SAME problem on the
same 4-device topology in this test process.

Gates (reference semantics being pinned):
  * eval AP metrics identical across ranks AND identical to the oracle --
    the reference all-gathers outputs+targets before the AP meter so every
    rank computes the same metrics (/root/reference/engine.py:2634-2636,
    utils/dist.py:164-186); eval-mode forward has no cross-batch reduction,
    so single-vs-multi-process must agree to the last float;
  * padded tail batch metered correctly under the gather (the boolean
    pad-mask select, not a suffix slice);
  * train loss identical across ranks (the loss is global under the
    batch-sharded jit == DDP allreduce, engine.py:152-153) and equal to the
    oracle's within float-reduction tolerance;
  * reduce_dict / all_gather_dict / barrier work off-jit (utils/dist.py
    parity helpers).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPROCS = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def rank_results(tmp_path_factory):
    out_dir = tmp_path_factory.mktemp("mh")
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        # the workers set their own JAX/XLA env; strip the pytest process's
        # (conftest forces an 8-device single-process config)
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for rank in range(NPROCS):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(REPO, "tests", "multihost_worker.py"),
                    str(rank), str(NPROCS), str(port),
                    str(out_dir / f"rank{rank}.json"),
                ],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
    results = []
    for rank in range(NPROCS):
        with open(out_dir / f"rank{rank}.json") as f:
            results.append(json.load(f))
    return results


def test_ranks_agree(rank_results):
    r0, r1 = rank_results
    assert r0["scan_cnt"] == r1["scan_cnt"]
    assert set(r0["eval_metrics"]) == set(r1["eval_metrics"])
    for k in r0["eval_metrics"]:
        assert r0["eval_metrics"][k] == pytest.approx(r1["eval_metrics"][k], abs=1e-12), k
    assert r0["final_loss"] == pytest.approx(r1["final_loss"], abs=1e-12)


def test_matches_single_process_oracle(rank_results):
    from tests.multihost_common import N_EVAL_SCENES, build_problem, run_problem

    oracle = run_problem(build_problem(), rank=0, nprocs=1)
    r0 = rank_results[0]
    # every rank metered ALL global scans (gathered), like the reference
    assert r0["scan_cnt"] == oracle["scan_cnt"] == N_EVAL_SCENES
    assert set(r0["eval_metrics"]) == set(oracle["eval_metrics"])
    for k, v in oracle["eval_metrics"].items():
        # eval has no cross-batch reduction: same mesh topology -> same floats
        assert r0["eval_metrics"][k] == pytest.approx(v, abs=1e-6), k
    # train DOES reduce across the batch (sync-BN stats, global loss mean):
    # 2-proc assembly may re-associate float sums
    assert r0["final_loss"] == pytest.approx(oracle["final_loss"], rel=1e-5)
    assert r0["final_lr"] == pytest.approx(oracle["final_lr"], rel=1e-6)


def test_dist_helpers(rank_results):
    r0 = rank_results[0]
    # reduce_dict average over ranks 0,1: a = mean(0,1) = 0.5, b = 2.0
    assert r0["reduce_dict_a"] == pytest.approx(0.5)
    assert r0["reduce_dict_b"] == pytest.approx(2.0)
    x = np.asarray(r0["all_gather_x"])  # (4, 3): rank0 rows then rank1 rows
    assert x.shape == (4, 3)
    assert np.array_equal(x[:2], np.zeros((2, 3))) and np.array_equal(
        x[2:], np.ones((2, 3))
    )
