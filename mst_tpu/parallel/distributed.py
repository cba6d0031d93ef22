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
            spec = P(batch_axis, *[None] * (v.ndim - 1))
            sharding = NamedSharding(mesh, spec)
            global_shape = (v.shape[0] * n_proc, *v.shape[1:])
            if isinstance(v, jax.Array) and v.is_fully_addressable:
                # Already device-resident (the augmented batch): split it
                # across this host's devices on-device — np.asarray here
                # would force a device->host sync + full re-upload of the
                # volume batch EVERY step (the tunneled-link cost mesh.py
                # documents for single-host).
                out[k] = _global_from_device_local(v, sharding, global_shape)
            else:
                out[k] = jax.make_array_from_process_local_data(
                    sharding, np.asarray(v), global_shape
                )
        else:
            out[k] = v
    return out


def _global_from_device_local(v: jax.Array, sharding: NamedSharding,
                              global_shape) -> jax.Array:
    """Build a global array from a host-local, device-resident array by
    device-to-device placement of each addressable shard (no host copy)."""
    idx_map = sharding.addressable_devices_indices_map(global_shape)
    starts = [(idx[0].start or 0) for idx in idx_map.values()]
    row0 = min(starts)  # this host's offset into the global batch axis
    pieces, devices = [], []
    for dev, idx in idx_map.items():
        lo = (idx[0].start or 0) - row0
        hi = (idx[0].stop if idx[0].stop is not None else global_shape[0]) - row0
        pieces.append(jax.device_put(v[lo:hi], dev))
        devices.append(dev)
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, pieces)
