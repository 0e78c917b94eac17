"""Worker process for the 2-process CPU multi-host tests (run by
tests/test_multihost.py, NOT a test module itself).

Each of the 2 processes owns 2 virtual CPU devices
(xla_force_host_platform_device_count) -> a 4-device global "dp" mesh, the
same topology the single-process oracle uses.  The worker exercises exactly
the multi-host code paths the reference exercises per-rank under DDP:

  * evaluate() with a padded tail batch: per-process loader shards in,
    process_allgather of outputs+targets before the AP meter
    (/root/reference/engine.py:2634-2636, utils/dist.py:164-186);
  * train_one_epoch(): global batch assembled from per-process rows
    (make_array_from_process_local_data in parallel/mesh.shard_batch), loss
    implicitly global under the batch-sharded jit (== DDP allreduce);
  * parallel/dist.py helpers (reduce_dict, all_gather_dict, barrier).

Writes a JSON result file per rank; the pytest side compares ranks against
each other and against a single-process 4-device oracle.
"""

import json
import os
import sys


def main():
    rank = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=2"

    import jax

    # the ambient sitecustomize pins the axon TPU platform; the env var alone
    # is not enough (same workaround as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nprocs, process_id=rank
    )
    assert jax.process_count() == nprocs, jax.process_count()

    import numpy as np

    from tests.multihost_common import LOCAL_DEVICES, build_problem, run_problem

    assert jax.local_device_count() == LOCAL_DEVICES
    problem = build_problem()
    result = run_problem(problem, rank=rank, nprocs=nprocs)

    # dist helpers (parallel/dist.py): reduce_dict mean + all_gather_dict
    from coda_neurips2023_tpu.parallel import dist

    assert dist.is_distributed() and dist.get_world_size() == nprocs
    assert dist.is_primary() == (rank == 0)
    red = dist.reduce_dict({"a": float(rank), "b": 2.0}, average=True)
    gat = dist.all_gather_dict({"x": np.full((2, 3), rank, np.float32)})
    result["reduce_dict_a"] = float(red["a"])
    result["reduce_dict_b"] = float(red["b"])
    result["all_gather_x"] = np.asarray(gat["x"]).tolist()
    dist.barrier()

    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"[rank {rank}] ok -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
