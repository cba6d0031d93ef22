"""Multi-host data parallelism: process init, global batches, local pulls.

The reference's only distributed awareness is latent Lightning-DDP
(`mst/models/base_model.py:170,177` `sync_dist` flags; the Trainer is
single-GPU, `scripts/main_train.py:110-123`). The TPU-native build makes DP
first-class (SURVEY §2.5/§5.8):

- `initialize()` wires `jax.distributed` — argless auto-detection on TPU
  pods, explicit coordinator/process ids for CPU test clusters (gloo
  collectives);
- `make_global_batch()` turns each host's DISJOINT local batch (the
  DataModule shards sample indices per host) into global jax.Arrays via
  `jax.make_array_from_process_local_data`, sharded over the mesh's data
  axis — XLA then runs one SPMD program and reduces gradients over ICI/DCN;
- `host_local_array()` pulls only the process's addressable shards of a
  global array (a global `np.asarray` raises on multi-host);
  `gather_across_hosts` (utils/metrics.py) reconstitutes global metric
  buffers from those local pulls, so every host computes identical epoch
  metrics — early stopping and best-checkpoint selection agree everywhere.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (idempotent).

    On TPU pods all arguments are auto-detected from the runtime
    environment; CPU clusters (tests) pass them explicitly and get gloo
    cross-process collectives.
    """
    # NOTE: must not touch the backend here (jax.process_count() would
    # initialise XLA and make jax.distributed.initialize impossible).
    if jax.distributed.is_initialized():
        return
    if num_processes is not None:
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # flag absent or backend already locked in — TPU path
        jax.distributed.initialize(coordinator, num_processes=num_processes,
                                   process_id=process_id)
    else:
        jax.distributed.initialize()


def host_local_array(x) -> np.ndarray:
    """np.asarray that works on multi-host-sharded global arrays by
    concatenating this process's addressable shards along axis 0
    (shard-index order)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        shards = sorted(x.addressable_shards, key=lambda s: s.index)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(x)


def make_global_batch(batch: dict, mesh: Mesh, batch_axis: str = "data") -> dict:
    """Per-host local batch dict -> global batch-axis-sharded jax.Arrays.

    Every host contributes its (disjoint) local samples; the global leading
    dim is local_batch * process_count. Non-array values pass through.
    Single-process falls back to `shard_batch` (which also handles
    non-dividing eval remainders by replication).
    """
    if jax.process_count() == 1:
        from mst_tpu.parallel.mesh import shard_batch

        return shard_batch(batch, mesh, batch_axis)
    n_proc = jax.process_count()
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
            local = np.asarray(v)
            spec = P(batch_axis, *[None] * (local.ndim - 1))
            global_shape = (local.shape[0] * n_proc, *local.shape[1:])
            out[k] = jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec), local, global_shape
            )
        else:
            out[k] = v
    return out
