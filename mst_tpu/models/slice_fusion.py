"""Slice-fusion transformer: MHA with rotary options + encoder layer.

Capability twin of the reference's custom attention stack
(`mst/models/utils/transformer_blocks.py`):

- `MultiheadAttention` = packed-qkv MHA with optional rotary positional
  encoding applied to q/k after the head reshape (reference :262-264,
  :324-362): RoPE uses theta=256 'lang' frequencies over head_dim
  (:333-349), LiRE learns skew-symmetric generators per half-head-dim
  block (:350-358).
- `TransformerEncoderLayer` = pre/post-norm encoder layer with a
  1-hidden-layer FFN and relu/gelu activation (reference :447-587).

Design notes (TPU-first):
- The fusion sequence is tiny (D slices + CLS, 33 tokens at reference
  scale), so attention runs as a plain XLA einsum — a Pallas kernel would
  be pure overhead here; the FLOPs live in the per-slice ViT encoder.
- Attention probabilities are exported via flax `intermediates` ("sow"),
  replacing the reference's `need_weights=True` monkey-patching + forward
  hooks (`mst/models/dino.py:214-260`, `resnet.py:218-234`).
- The LiRE generator parameters are position-count independent; rotations
  are built for the actual (static) sequence length at trace time, fixing
  the reference's hard-coded `axes_length=33` (:355). The reference's
  no-op output permute bug (`rotary_embedding_torch.py:389-395`) is not
  replicated.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mst_tpu.ops.attention import attention_reference, make_key_padding_bias
from mst_tpu.ops.rotary import (
    apply_liere,
    apply_rope,
    liere_rotations,
    num_skew_params,
    rope_angles,
)


class MultiheadAttention(nn.Module):
    dim: int
    num_heads: int
    rotary: Optional[str] = None  # None | "RoPE" | "LiRE"
    rope_theta: float = 256.0
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, S, dim]
        *,
        key_padding_mask: Optional[jax.Array] = None,  # [B, S] True = PAD
        return_weights: bool = False,
        deterministic: bool = True,
    ):
        B, S, _ = x.shape
        assert self.dim % self.num_heads == 0, (
            f"dim {self.dim} not divisible by num_heads {self.num_heads}"
        )
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="in_proj")(x)
        qkv = qkv.reshape(B, S, 3, self.num_heads, hd)
        q, k, v = (jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3))

        if self.rotary == "RoPE":
            ang = rope_angles(S, hd, theta=self.rope_theta)
            q, k = apply_rope(q, ang), apply_rope(k, ang)
        elif self.rotary == "LiRE":
            block = max(hd // 2, 2)
            n_blocks = hd // block
            gen = self.param(
                "liere_generators",
                nn.initializers.normal(0.02),
                (n_blocks, num_skew_params(block)),
            )
            rots = liere_rotations(gen, jnp.arange(S), block)
            q, k = apply_liere(q, rots), apply_liere(k, rots)
        elif self.rotary is not None:
            raise ValueError(f"unknown rotary mode {self.rotary!r}")

        bias = None
        if key_padding_mask is not None:
            bias = make_key_padding_bias(key_padding_mask)
        out, probs = attention_reference(q, k, v, bias=bias, return_weights=True)
        if return_weights:
            self.sow("intermediates", "attn_probs", probs)
        out = jnp.moveaxis(out, 1, 2).reshape(B, S, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)
        return nn.Dropout(self.dropout_rate, deterministic=deterministic)(out)


class TransformerEncoderLayer(nn.Module):
    """Pre/post-norm encoder layer (reference `transformer_blocks.py:447-587`).

    The MST slice fusion instantiates this with d_model=embed_dim, one
    hidden FFN layer of size `dim_feedforward = 1 * d_model`, pre-norm
    (reference `mst/models/dino.py:84-95`, `resnet.py:155-167`).
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout_rate: float = 0.0
    activation: str = "relu"  # relu | gelu
    norm_first: bool = True
    rotary: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        key_padding_mask: Optional[jax.Array] = None,
        return_weights: bool = False,
        deterministic: bool = True,
    ):
        act = {"relu": nn.relu, "gelu": nn.gelu}[self.activation]

        def sa(h):
            return MultiheadAttention(
                self.d_model, self.nhead, rotary=self.rotary,
                dropout_rate=self.dropout_rate, dtype=self.dtype,
                name="self_attn",
            )(
                h, key_padding_mask=key_padding_mask,
                return_weights=return_weights, deterministic=deterministic,
            )

        def ff(h):
            h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(h)
            h = act(h)
            h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
            h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
            return nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)

        # torch nn.TransformerEncoderLayer LayerNorms use eps=1e-5 (the ViT's
        # 1e-6 is DINOv2-specific); matched for bit-level converted-checkpoint
        # parity.
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        if self.norm_first:
            x = x + sa(norm1(x))
            x = x + ff(norm2(x))
        else:
            x = norm1(x + sa(x))
            x = norm2(x + ff(x))
        return x
