"""DINOv2-style Vision Transformer (flax.linen), TPU-native.

Capability twin of the reference's vendored DinoVisionTransformer
(`mst/models/extern/dinov2/vision_transformer.py`): patch-embed -> CLS
(+ optional register tokens, :112-114,222-231) -> interpolated pos-embed
(:179-211) -> depth x pre-norm Block -> LayerNorm -> CLS feature (:324-329),
plus `get_intermediate_layers`-style outputs.

TPU-first differences (by design, not omission):
- whole `B*D` slice batch flows through one jit-compiled program; attention
  runs on the Pallas flash kernel;
- attention maps are returned functionally (flax `intermediates`) instead of
  the reference's forward-patching hooks (`mst/models/dino.py:224-254`);
- stochastic depth is rng-keyed (`drop_path` collection), not global RNG
  state;
- no FSDP `block_chunks` vestige (reference :37-41,153-160): sharding is
  expressed externally with `jax.sharding` instead of module nesting.
"""

from __future__ import annotations

import math
from dataclasses import field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mst_tpu.models.layers import Block, PatchEmbed
from mst_tpu.ops.rotary import rope_2d_angles


def _cubic_weights(out_size: int, in_size: int, scale: float) -> "np.ndarray":
    """Dense [out, in] interpolation matrix replicating torch's bicubic
    (`F.interpolate(mode='bicubic', align_corners=False, antialias=False)`,
    cubic convolution with a = -0.75, edge-clamped)."""
    import numpy as np

    a = -0.75

    def k(t):
        t = np.abs(t)
        return np.where(
            t <= 1,
            (a + 2) * t**3 - (a + 3) * t**2 + 1,
            np.where(t < 2, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0),
        )

    w = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        src = (i + 0.5) / scale - 0.5
        i0 = int(np.floor(src))
        t = src - i0
        offs = np.array([-1, 0, 1, 2])
        weights = k(t - offs)
        for o, wt in zip(offs, weights):
            w[i, int(np.clip(i0 + o, 0, in_size - 1))] += wt
    return w.astype(np.float32)


def interpolate_pos_embed(
    pos_embed: jax.Array,
    grid_hw: tuple[int, int],
    src_grid: tuple[int, int],
    interpolate_offset: float = 0.1,
) -> jax.Array:
    """Bicubic-resample patch position embeddings to a new grid.

    pos_embed: [1, 1 + src_h*src_w, dim] (CLS first). Replicates the
    reference's `interpolate_pos_encoding` exactly
    (`vision_transformer.py:179-211`), including the historical
    `interpolate_offset=0.1` scale-factor kludge, so converted torch
    weights produce bit-comparable features at any input size.
    """
    cls_pe, patch_pe = pos_embed[:, :1], pos_embed[:, 1:]
    sh, sw = src_grid
    h, w = grid_hw
    if (h, w) == (sh, sw):
        return pos_embed
    import numpy as np  # trace-time constants

    if interpolate_offset:
        sy = float(h + interpolate_offset) / sh
        sx = float(w + interpolate_offset) / sw
    else:
        sy, sx = h / sh, w / sw
    wy = jnp.asarray(_cubic_weights(h, sh, sy))
    wx = jnp.asarray(_cubic_weights(w, sw, sx))
    dim = patch_pe.shape[-1]
    grid = patch_pe.reshape(sh, sw, dim).astype(jnp.float32)
    grid = jnp.einsum("hH,HWd,wW->hwd", wy, grid, wx)
    grid = grid.reshape(1, h * w, dim).astype(pos_embed.dtype)
    del np
    return jnp.concatenate([cls_pe, grid], axis=1)


class VisionTransformer(nn.Module):
    """ViT encoder returning CLS + patch tokens.

    `num_register_tokens` > 0 inserts DINOv2-register tokens after CLS
    (token order [CLS, reg..., patches], reference
    `vision_transformer.py:222-231`).
    """

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 14
    mlp_ratio: float = 4.0
    num_register_tokens: int = 0
    ffn_layer: str = "mlp"
    ffn_hidden: Optional[int] = None  # exact FFN width (HF DINOv3 gated MLP)
    layerscale_init: Optional[float] = 1e-5
    drop_path_rate: float = 0.0
    use_pos_embed: bool = True  # False for DINOv3 (RoPE-only, no learned PE)
    pos_embed_grid: int = 37  # pretrained DINOv2 canonical grid (518/14)
    use_rope_2d: bool = False  # DINOv3-style axial RoPE over patch coords
    rope_theta: float = 100.0
    rope_normalized: bool = False  # HF DINOv3 [-1,1] patch-center coords
    norm_eps: float = 1e-6  # DINOv2 LN eps; HF DINOv3 uses 1e-5
    gelu_approximate: bool = True  # tanh-GELU (2x cheaper, <=4.3e-4 abs dev)
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True
    # Per-block gradient rematerialisation (jax.checkpoint via nn.remat):
    # the backward recomputes each block's interior instead of storing its
    # activations, cutting train activation memory from O(depth * tokens *
    # ~8E) to O(depth * tokens * E) block inputs — what lets ViT-L/giant2
    # train UNFROZEN inside one chip's HBM at ~fwd/3 extra FLOPs. Applies
    # only to blocks that don't sow attention weights (saliency paths keep
    # the plain block).
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, H, W, 3] NHWC
        *,
        deterministic: bool = True,
        return_weights: str = "none",  # "none" | "last" | "all"
        return_layers: Optional[Sequence[int]] = None,
    ):
        B, H, W, _ = x.shape
        gh, gw = H // self.patch_size, W // self.patch_size
        n_patches = gh * gw

        tokens = PatchEmbed(
            self.patch_size, self.embed_dim, dtype=self.dtype, name="patch_embed"
        )(x)

        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, self.embed_dim),
        )
        if self.use_pos_embed:
            pos_embed = self.param(
                "pos_embed", nn.initializers.truncated_normal(0.02),
                (1, 1 + self.pos_embed_grid**2, self.embed_dim),
            )
            pe = interpolate_pos_embed(
                pos_embed, (gh, gw), (self.pos_embed_grid, self.pos_embed_grid)
            ).astype(self.dtype)
            tokens = tokens + pe[:, 1:]
            cls = jnp.broadcast_to(
                cls_token.astype(self.dtype) + pe[:, :1],
                (B, 1, self.embed_dim)
            )
        else:  # DINOv3: position comes from RoPE only (HF DINOv3ViTModel)
            cls = jnp.broadcast_to(
                cls_token.astype(self.dtype), (B, 1, self.embed_dim)
            )
        parts = [cls]
        if self.num_register_tokens:
            reg = self.param(
                "register_tokens", nn.initializers.truncated_normal(0.02),
                (1, self.num_register_tokens, self.embed_dim),
            )
            parts.append(
                jnp.broadcast_to(
                    reg.astype(self.dtype),
                    (B, self.num_register_tokens, self.embed_dim),
                )
            )
        parts.append(tokens)
        h = jnp.concatenate(parts, axis=1)  # [B, 1+R+N, dim]

        dpr = [
            self.drop_path_rate * i / max(self.depth - 1, 1)
            for i in range(self.depth)
        ]
        rope = None
        if self.use_rope_2d:
            rope = rope_2d_angles(
                (gh, gw), self.embed_dim // self.num_heads,
                num_prefix=1 + self.num_register_tokens,
                theta=self.rope_theta,
                normalized=self.rope_normalized,
            )
        intermediates = []
        for i in range(self.depth):
            want_weights = return_weights == "all" or (
                return_weights == "last" and i == self.depth - 1
            )
            blk_cfg = dict(
                mlp_ratio=self.mlp_ratio,
                layerscale_init=self.layerscale_init, drop_path_rate=dpr[i],
                ffn_layer=self.ffn_layer, ffn_hidden=self.ffn_hidden,
                norm_eps=self.norm_eps,
                gelu_approximate=self.gelu_approximate, dtype=self.dtype,
                use_flash=self.use_flash, name=f"blocks_{i}",
            )
            if self.remat and not want_weights and not deterministic:
                # remat pays off only when a backward will run; eval
                # forwards keep the plain block (no prevent_cse barriers)
                # static_argnums counts self as 0: deterministic=2,
                # return_weights=3 (both drive Python control flow inside
                # Block); the param tree is identical to the plain block
                blk = nn.remat(Block, static_argnums=(2, 3))(
                    self.embed_dim, self.num_heads, **blk_cfg)
                h = blk(h, deterministic, False, rope)
            else:
                h = Block(self.embed_dim, self.num_heads, **blk_cfg)(
                    h, deterministic=deterministic,
                    return_weights=want_weights, rope_angles=rope)
            if return_layers is not None and i in return_layers:
                intermediates.append(h)

        h = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                         name="norm")(h)
        n_prefix = 1 + self.num_register_tokens
        out = {
            "cls_token": h[:, 0],
            "register_tokens": h[:, 1:n_prefix],
            "patch_tokens": h[:, n_prefix:],
            "grid_hw": (gh, gw),
            "num_prefix_tokens": n_prefix,
        }
        if return_layers is not None:
            out["intermediate_layers"] = intermediates
        del n_patches
        return out


# Factories mirroring reference `vision_transformer.py:340-396`.
_VIT_CONFIGS = {
    "tiny": dict(embed_dim=32, depth=2, num_heads=2),  # tests only
    # tests only: the narrowest lane-aligned width (embed_dim % 128 == 0)
    # that passes the fused-path gate (vit_fast.fused_config_supported) —
    # lets the virtual-mesh dryrun and CPU tests exercise the fused/int8
    # serving path cheaply where 32-wide "tiny" routes to flax
    "tiny128": dict(embed_dim=128, depth=2, num_heads=2),
    "small": dict(embed_dim=384, depth=12, num_heads=6),
    "base": dict(embed_dim=768, depth=12, num_heads=12),
    "large": dict(embed_dim=1024, depth=24, num_heads=16),
    "giant2": dict(embed_dim=1536, depth=40, num_heads=24, ffn_layer="swiglu"),
}


def build_vit(
    size: str = "small",
    patch_size: int = 14,
    num_register_tokens: int = 0,
    dtype: jnp.dtype = jnp.float32,
    use_flash: bool = True,
    **overrides,
) -> VisionTransformer:
    cfg = dict(_VIT_CONFIGS[size])
    cfg.update(overrides)
    return VisionTransformer(
        patch_size=patch_size,
        num_register_tokens=num_register_tokens,
        dtype=dtype,
        use_flash=use_flash,
        **cfg,
    )


def vit_small(**kw):
    return build_vit("small", **kw)


def vit_base(**kw):
    return build_vit("base", **kw)


def vit_large(**kw):
    return build_vit("large", **kw)


def vit_giant2(**kw):
    return build_vit("giant2", **kw)
