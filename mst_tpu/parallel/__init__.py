"""Meshes, shardings, collectives."""

from mst_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from mst_tpu.parallel.sharding import (  # noqa: F401
    param_partition_specs,
    param_shardings,
)
