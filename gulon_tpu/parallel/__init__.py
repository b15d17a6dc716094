from gulon_tpu.parallel.mesh import (
    ROWS,
    SUB,
    distributed_init,
    make_mesh,
    replicate,
    shard_rows,
)
from gulon_tpu.parallel.ops import (
    sharded_adc_scan,
    sharded_exact_scan,
    sharded_fit_kmeans,
)
from gulon_tpu.parallel.index import (
    ShardedExactIndex,
    ShardedFlatIndex,
    ShardedIVFIndex,
    shard_index,
)

__all__ = [
    "ROWS",
    "SUB",
    "distributed_init",
    "make_mesh",
    "replicate",
    "shard_rows",
    "sharded_adc_scan",
    "sharded_exact_scan",
    "sharded_fit_kmeans",
    "ShardedExactIndex",
    "ShardedFlatIndex",
    "ShardedIVFIndex",
    "shard_index",
]
