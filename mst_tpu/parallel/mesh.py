"""Device mesh construction + sharding helpers.

The reference has no distributed runtime (single-GPU Lightning,
`scripts/main_train.py:110-123`; the only DDP awareness is `sync_dist`
logging flags, `mst/models/base_model.py:170,177`). The TPU-native scaling
story (SURVEY §2.5, §5.8) is built here instead:

- `make_mesh` lays out the available devices on named axes
  (`data` for batch/volume parallelism, `slice` for slice-axis sharding of
  a single volume — the natural sequence-parallel axis for D >> 32 CT
  stacks, `tensor` for megatron-style sharding of the ViT-giant MLP/heads).
- `batch_sharding` / `replicate` produce NamedShardings; XLA inserts the
  matching ICI collectives (psum for gradient reduction under `jit`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: Optional[Sequence[Tuple[str, int]]] = None,
    devices=None,
) -> Mesh:
    """Build a mesh. Default: all devices on a single 'data' axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (("data", devices.size),)
    names = tuple(n for n, _ in axis_sizes)
    sizes = tuple(int(s) for _, s in axis_sizes)
    assert int(np.prod(sizes)) == devices.size, (
        f"mesh {dict(axis_sizes)} does not cover {devices.size} devices"
    )
    return Mesh(devices.reshape(sizes), names)


def batch_sharding(mesh: Mesh, batch_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over `batch_axis`, replicate the rest."""
    return NamedSharding(mesh, P(batch_axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, batch_axis: str = "data") -> dict:
    """device_put array leaves with a leading-dim sharding; pass through
    host-side metadata (lists/strings) untouched."""
    axis_size = mesh.shape[batch_axis]
    single_device = int(np.prod(list(mesh.shape.values()))) == 1
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
            # Leave device-resident arrays alone on a single-device mesh:
            # re-device_put of an already-committed array forces a copy
            # (through the host on tunneled platforms — measured 3.3 s/step
            # vs 90 ms when the augmented batch was re-staged).
            if single_device and isinstance(v, jax.Array):
                out[k] = v
                continue
            # Replicate when the batch does not divide the data axis (tiny
            # eval remainders); otherwise shard the leading dim.
            spec = (
                P(batch_axis, *[None] * (v.ndim - 1))
                if v.shape[0] % axis_size == 0
                else P()
            )
            out[k] = jax.device_put(v, NamedSharding(mesh, spec))
        else:
            out[k] = v
    return out
