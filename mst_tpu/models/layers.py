"""Transformer building blocks (flax.linen), TPU-first.

Re-designs the reference's vendored DINOv2 layer zoo
(`mst/models/extern/dinov2/layers/`: attention.py, block.py, mlp.py,
swiglu_ffn.py, layer_scale.py, drop_path.py, patch_embed.py) as functional
flax modules:

- `Attention` uses the Pallas flash kernel on the no-aux path (replacing
  xFormers `memory_efficient_attention`, reference `layers/attention.py:72-89`)
  and an explicit XLA softmax path when attention probabilities are
  requested — probs are exported through flax's `intermediates` collection
  (`sow`), the functional replacement for the reference's forward-patching
  hooks (`mst/models/dino.py:224-254`).
- `DropPath` is rng-keyed stochastic depth (reference `layers/drop_path.py`).
- `LayerScale` (reference `layers/layer_scale.py`), `Mlp` (`layers/mlp.py`),
  `SwiGLU` (`layers/swiglu_ffn.py` — hidden rounded to a multiple of 8,
  fused by XLA on TPU), `PatchEmbed` (`layers/patch_embed.py` — conv
  patchify, lowered to an MXU matmul by XLA).

All blocks take `dtype` (compute dtype, bf16 in production) with fp32
parameters.
"""

from __future__ import annotations

from typing import Callable, Optional

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn

from mst_tpu.ops.attention import (
    attention_reference,
    flash_attention,
    make_key_padding_bias,
)
from mst_tpu.ops.rotary import apply_rope

Dtype = jnp.dtype


class Mlp(nn.Module):
    """2-layer MLP (reference `layers/mlp.py`).

    Default activation is tanh-GELU: on the TPU VPU it costs half of
    exact-erf GELU (6.2 vs 12.8 ms across a ViT-S MLP stack at MST shapes)
    and deviates by <=4.3e-4 absolute. Pass
    `act=functools.partial(nn.gelu, approximate=False)` (or
    `gelu_approximate=False` on the ViT) for bit-level torch parity."""

    hidden_features: int
    out_features: int
    act: Callable = functools.partial(nn.gelu, approximate=True)
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return x


class SwiGLU(nn.Module):
    """SwiGLU FFN with hidden rounded to a multiple of 8
    (reference `layers/swiglu_ffn.py:66`). `hidden_override` pins the gate
    width exactly (HF DINOv3 GatedMLP checkpoints carry an explicit
    `intermediate_size` instead of the 2/3-of-mlp_ratio rule)."""

    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.float32
    hidden_override: Optional[int] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        hidden = (self.hidden_override if self.hidden_override is not None
                  else (int(self.hidden_features * 2 / 3) + 7) // 8 * 8)
        x12 = nn.Dense(2 * hidden, dtype=self.dtype, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(self.out_features, dtype=self.dtype, name="w3")(
            nn.silu(x1) * x2
        )


class LayerScale(nn.Module):
    """Learned per-channel residual scaling (reference `layers/layer_scale.py`)."""

    dim: int
    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,)
        )
        return x * gamma.astype(x.dtype)


def drop_path(
    x: jax.Array, rate: float, rng: Optional[jax.Array], deterministic: bool
) -> jax.Array:
    """Per-sample stochastic depth (reference `layers/drop_path.py:10-24`)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class Attention(nn.Module):
    """Multi-head self-attention with fused qkv.

    `return_weights=False`: Pallas flash attention (the ViT hot path).
    `return_weights=True`: explicit softmax; probabilities `[B,H,S,S]` are
    sowed into the `intermediates` collection under "attn_probs".
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    proj_bias: bool = True
    dtype: Dtype = jnp.float32
    use_flash: bool = True

    @nn.compact
    def __call__(self, x, *, bias: Optional[jax.Array] = None,
                 return_weights: bool = False,
                 rope_angles: Optional[jax.Array] = None):
        B, S, _ = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(
            3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv"
        )(x)
        qkv = qkv.reshape(B, S, 3, self.num_heads, head_dim)
        q, k, v = (
            jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)
        )  # each [B, H, S, hd]
        if rope_angles is not None:  # DINOv3-style 2D RoPE on patch tokens
            q, k = apply_rope(q, rope_angles), apply_rope(k, rope_angles)
        if return_weights or bias is not None or not self.use_flash:
            out, probs = attention_reference(q, k, v, bias=bias, return_weights=True)
            if return_weights:
                self.sow("intermediates", "attn_probs", probs)
        else:
            out = flash_attention(q, k, v)
        out = jnp.moveaxis(out, 1, 2).reshape(B, S, self.dim)
        return nn.Dense(
            self.dim, use_bias=self.proj_bias, dtype=self.dtype, name="proj"
        )(out)


class Block(nn.Module):
    """Pre-norm ViT block with LayerScale + DropPath
    (reference `layers/block.py:43-114`)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layerscale_init: Optional[float] = 1e-5
    drop_path_rate: float = 0.0
    ffn_layer: str = "mlp"  # "mlp" | "swiglu"
    ffn_hidden: Optional[int] = None  # exact FFN width (else from mlp_ratio)
    norm_eps: float = 1e-6  # DINOv2 convention; HF DINOv3 uses 1e-5
    gelu_approximate: bool = True
    dtype: Dtype = jnp.float32
    use_flash: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 return_weights: bool = False,
                 rope_angles=None):
        # args are positional-capable (no keyword-only marker) so nn.remat
        # can mark deterministic/return_weights static via static_argnums
        def ls(name):
            if self.layerscale_init is None:
                return lambda y: y
            return LayerScale(self.dim, self.layerscale_init, name=name)

        dp_rng = None
        if not deterministic and self.drop_path_rate > 0.0:
            dp_rng = self.make_rng("drop_path")

        h = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                         name="norm1")(x)
        h = Attention(
            self.dim, self.num_heads, qkv_bias=self.qkv_bias,
            dtype=self.dtype, use_flash=self.use_flash, name="attn",
        )(h, return_weights=return_weights, rope_angles=rope_angles)
        h = ls("ls1")(h)
        rng1 = None if dp_rng is None else jax.random.fold_in(dp_rng, 0)
        x = x + drop_path(h, self.drop_path_rate, rng1, deterministic)

        h = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                         name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        if self.ffn_layer == "swiglu":
            h = SwiGLU(hidden, self.dim, dtype=self.dtype,
                       hidden_override=self.ffn_hidden, name="mlp")(
                h, deterministic=deterministic
            )
        else:
            h = Mlp(self.ffn_hidden or hidden, self.dim, dtype=self.dtype,
                    act=functools.partial(nn.gelu,
                                          approximate=self.gelu_approximate),
                    name="mlp")(
                h, deterministic=deterministic
            )
        h = ls("ls2")(h)
        rng2 = None if dp_rng is None else jax.random.fold_in(dp_rng, 1)
        x = x + drop_path(h, self.drop_path_rate, rng2, deterministic)
        return x


class PatchEmbed(nn.Module):
    """Conv patchify NHWC -> [B, N, dim] (reference `layers/patch_embed.py`).

    H and W must be divisible by `patch_size` (asserted like the reference
    `layers/patch_embed.py:68-81`); XLA lowers the stride-p conv to a single
    MXU matmul over the unfolded patches.
    """

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        p = self.patch_size
        assert H % p == 0 and W % p == 0, (
            f"input size {(H, W)} not divisible by patch size {p}"
        )
        gh, gw = H // p, W // p
        # Stride-p conv == one big matmul over unfolded patches. XLA's
        # conv lowering for C=3 im2col runs at a few TFLOP/s on the MXU
        # (~20x slower than the dot at ViT-S/224 shapes), and an explicit
        # unfold TRANSPOSE materialises a lane-hostile p=14 shuffle (+ its
        # scatter backward) at ~15x the matmul bound — so the projection
        # contracts the (p, p, C) dims in place via dot_general
        # (tools/bench_patchify.py). The param keeps the conv HWIO layout
        # ([p, p, C, emb] under "proj"), so torch weight conversion is
        # unchanged.
        x = x.reshape(B, gh, p, gw, p, C)
        return _PatchProj(self.embed_dim, (p, p, C), dtype=self.dtype,
                          name="proj")(x).reshape(B, gh * gw, self.embed_dim)


class _PatchProj(nn.Module):
    """Dense projection whose kernel is stored in conv HWIO shape."""

    embed_dim: int
    kernel_hwc: tuple
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p1, p2, c = self.kernel_hwc
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(batch_axis=(),
                                                   in_axis=(0, 1, 2),
                                                   out_axis=3),
            (p1, p2, c, self.embed_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        # x: [B, gh, p1, gw, p2, c] — contract the patch dims directly
        # against the HWIO kernel (no materialised im2col transpose).
        out = jax.lax.dot_general(
            x.astype(self.dtype), kernel.astype(self.dtype),
            dimension_numbers=(((2, 4, 5), (0, 1, 2)), ((), ())),
            preferred_element_type=self.dtype,
        )  # [B, gh, gw, emb]
        return out + bias.astype(self.dtype)
