"""Attention-based 3D saliency maps as pure functions.

Functional port of the reference's explainability extraction
(`mst/models/dino.py:169-212` + `scripts/main_predict.py:55-106`): the
model forward returns attention probabilities as auxiliary outputs (flax
intermediates), and these functions turn them into slice / in-plane /
combined 3D saliency volumes. No hooks, no fastpath toggling — everything
is jittable and TTA-batchable.

Map semantics replicated exactly:
- slice attention: CLS->slice row of the fusion attention, normalised to
  sum 1 PER HEAD, then mean over heads (`dino.py:173-187` — the ordering
  matters: mean-of-normalised != normalised-mean);
- plane attention: CLS->patch row of the LAST ViT block, register tokens
  skipped via the token offset (`dino.py:189-195`), patch 0 zeroed
  (`dino.py:193`), normalised per head, then head-mean (the reference
  returns per-head maps and `main_predict.py:73-74` head-means them);
- combined map = outer product of the two (`dino.py:197-202`);
- attention rollout: `attention_cls_rollout` is the reference's
  `get_attention_cls` chain (`dino.py:204-212`); `attention_rollout` is the
  improved Abnar & Zuidema variant kept as an opt-in alternative.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def slice_attention(fusion_probs: jax.Array) -> jax.Array:
    """[B, heads, S, S] fusion attention (S = 1 + D, CLS first) ->
    normalised per-slice weights [B, D].

    Per-head CLS rows are normalised BEFORE the head mean (`dino.py:173-177`,
    `resnet.py:200-206`); the mean of rows that each sum to 1 sums to 1, so
    no renormalisation follows."""
    cls_row = fusion_probs[:, :, 0, 1:]  # [B, heads, D]
    w = cls_row / jnp.clip(jnp.sum(cls_row, axis=-1, keepdims=True), 1e-12)
    return jnp.mean(w, axis=1)


def plane_attention(
    vit_probs: jax.Array,  # [BD, heads, T, T] last-block ViT attention
    num_prefix_tokens: int,  # 1 (CLS) or 1 + registers
    grid_hw: tuple[int, int],
) -> jax.Array:
    """CLS->patch attention of the last ViT block -> [BD, gh, gw].

    Skips register tokens (reference offset `slice(5, None)` for 4-register
    models, `dino.py:191`) and zeroes the first patch (`dino.py:193`) — the
    first patch often collects global signal and would dominate the map.
    Zero + normalise happen PER HEAD, then heads are averaged
    (`dino.py:189-195` returns per-head maps; `main_predict.py:73-74`
    head-means the combined map).
    """
    return plane_attention_from_row(vit_probs[:, :, 0], num_prefix_tokens,
                                    grid_hw)


def plane_attention_from_row(
    cls_row: jax.Array,  # [BD, heads, T] CLS softmax row of the last block
    num_prefix_tokens: int,
    grid_hw: tuple[int, int],
) -> jax.Array:
    """`plane_attention` from the CLS row alone — what the fused serving
    path's last-block kernel emits (`ops/fused_block.
    fused_attention_sublayer_with_row`), so the [T, T] probability
    matrices never exist."""
    w = cls_row[:, :, num_prefix_tokens:]  # [BD, heads, N]
    w = w.at[:, :, 0].set(0.0)
    w = w / jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    w = jnp.mean(w, axis=1)
    gh, gw = grid_hw
    return w.reshape(-1, gh, gw)


def combined_saliency(
    slice_w: jax.Array,  # [B, D]
    plane_w: jax.Array,  # [B*D, gh, gw]
) -> jax.Array:
    """Outer product slice x plane -> [B, D, gh, gw] (`dino.py:197-202`)."""
    B, D = slice_w.shape
    plane = plane_w.reshape(B, D, *plane_w.shape[1:])
    return slice_w[:, :, None, None] * plane


def attention_cls_rollout(
    probs_per_layer: Sequence[jax.Array],  # each [B, heads, T, T]
) -> jax.Array:
    """Reference `get_attention_cls` (`dino.py:204-212`): a bare reversed
    matmul chain over the raw per-head attention probs — A_0 @ A_1 @ ... @
    A_{L-1}, no identity term, no row normalisation, heads kept.
    Returns [B, heads, T, T]."""
    result = probs_per_layer[-1]
    for a in reversed(probs_per_layer[:-1]):
        result = jnp.einsum("bhij,bhjk->bhik", a, result)
    return result


def attention_rollout_from_factors(
    factors: Sequence[jax.Array],  # each [B, T, T], already headmean+I+norm
    num_prefix_tokens: int,
) -> jax.Array:
    """`attention_rollout` when each layer's factor (head-mean + identity +
    row-normalise) was already computed — what the fused serving kernel
    emits (`ops/fused_block.fused_attention_sublayer_abnar`). Same
    newest-first product and CLS-row read."""
    result = None
    for a in factors:
        result = a if result is None else jnp.einsum("bij,bjk->bik",
                                                     a, result)
    cls_row = result[:, 0, num_prefix_tokens:]
    return cls_row / jnp.clip(jnp.sum(cls_row, axis=-1, keepdims=True),
                              1e-12)


def attention_rollout(
    probs_per_layer: Sequence[jax.Array],  # each [B, heads, T, T]
    num_prefix_tokens: int,
) -> jax.Array:
    """Rollout (Abnar & Zuidema 2020) over all layers -> CLS->patch map
    [B, N]: per layer, head-mean + FULL identity (residual branch),
    row-normalise, multiply down the stack, read the CLS row.

    This is deliberately NOT the reference's `get_attention_cls` chain (see
    `attention_cls_rollout`); it is kept as an opt-in improved alternative
    (`--rollout_mode abnar`).
    """
    result = None
    for probs in probs_per_layer:
        a = jnp.mean(probs, axis=1)  # [B, T, T]
        a = a + jnp.eye(a.shape[-1], dtype=a.dtype)[None]
        a = a / jnp.sum(a, axis=-1, keepdims=True)
        result = a if result is None else jnp.einsum("bij,bjk->bik", a, result)
    cls_row = result[:, 0, num_prefix_tokens:]
    return cls_row / jnp.clip(jnp.sum(cls_row, axis=-1, keepdims=True), 1e-12)


def upsample_saliency(
    saliency: jax.Array,  # [B, D, gh, gw]
    out_shape: tuple[int, int, int],  # (D, H, W)
) -> jax.Array:
    """Trilinear upsample to the volume grid (`main_predict.py:161-162`)."""
    B = saliency.shape[0]
    return jax.image.resize(
        saliency.astype(jnp.float32), (B, *out_shape), method="trilinear"
    )
