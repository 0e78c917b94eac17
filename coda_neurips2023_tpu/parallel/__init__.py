from coda_neurips2023_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
)
from coda_neurips2023_tpu.parallel import dist
