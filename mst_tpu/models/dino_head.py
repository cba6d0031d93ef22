"""DINO projection head (capability twin of reference
`mst/models/extern/dinov2/layers/dino_head.py`).

A 3-layer MLP bottleneck followed by a weight-normalised linear prototype
layer — the self-supervised-training head of DINO/DINOv2. The reference
vendors it but MST never calls it (`dino_head.py` is unused by the
classifier); it is provided here so the framework covers the full layer
inventory and could train DINO-style objectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class DINOHead(nn.Module):
    out_dim: int
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(max(self.n_layers - 1, 0)):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"mlp_{i}")(x)
            x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.bottleneck_dim, dtype=self.dtype,
                     name=f"mlp_{max(self.n_layers - 1, 0)}")(x)
        # L2-normalise then project with a weight-normalised prototype bank.
        eps = 1e-6
        x = x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
        w = self.param(
            "last_layer", nn.initializers.truncated_normal(0.02),
            (self.bottleneck_dim, self.out_dim),
        )
        w = w / jnp.clip(jnp.linalg.norm(w, axis=0, keepdims=True), eps)
        return jnp.dot(x.astype(jnp.float32), w.astype(jnp.float32))
