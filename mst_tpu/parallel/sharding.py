"""Parameter partition rules (tensor parallelism for big ViTs).

The reference never shards parameters (ViT-S fits everywhere; FSDP hooks
are vestigial, reference `vision_transformer.py:37-41,153-160`). For the
ViT-giant2 configs (1536-dim, 40 blocks) a megatron-style layout over a
`tensor` mesh axis keeps every matmul MXU-shaped:

- qkv / fc1 / w12 kernels: shard the OUTPUT features  -> P(None, "tensor")
- proj / fc2 / w3 kernels: shard the INPUT features   -> P("tensor", None)
- biases of column-parallel layers shard on "tensor"; everything else
  (norms, embeddings, heads) is replicated.

XLA then inserts the canonical all-reduce after attention-proj and fc2.
Rules are matched on flattened param paths, so they apply to any model
that embeds the ViT (MST classifiers included).
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN = re.compile(r"(qkv|fc1|w12|linear1|in_proj)'?\]?\['(kernel|bias)")
_ROW = re.compile(r"(proj|fc2|w3|linear2|out_proj)'?\]?\['kernel")


def _spec_for(path: str, leaf, tensor_axis: str):
    ndim = getattr(leaf, "ndim", 0)
    if _COLUMN.search(path):
        if ndim == 2:
            return P(None, tensor_axis)
        if ndim == 1:
            return P(tensor_axis)
    if _ROW.search(path) and ndim == 2:
        return P(tensor_axis, None)
    return P()


def param_partition_specs(params: Any, tensor_axis: str = "tensor") -> Any:
    """PartitionSpec pytree for a param tree (megatron rules above)."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = [
        _spec_for(jax.tree_util.keystr(k), v, tensor_axis) for k, v in flat[0]
    ]
    return jax.tree_util.tree_unflatten(flat[1], specs)


def param_shardings(params: Any, mesh: Mesh, tensor_axis: str = "tensor") -> Any:
    if tensor_axis not in mesh.axis_names:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    specs = param_partition_specs(params, tensor_axis)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
