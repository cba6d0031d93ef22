"""Fused-kernel ViT/MST forward over the STANDARD parameter pytree.

A pure-function fast path for serving: consumes exactly the params produced
by `DinoSliceClassifier.init` / the weight converters (checkpoints stay
compatible) and runs each transformer block through the fused Pallas
sub-layer kernels (`mst_tpu/ops/fused_block.py`), eliminating the
LayerNorm/residual/layout traffic between XLA fusion islands.

Scope: inference-shaped workloads (differentiable via the fused ops' custom
VJPs, but the explainability / bias / rope paths use the flax modules).
"""

from __future__ import annotations

import functools
import math
import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from mst_tpu.models.vit import _VIT_CONFIGS, interpolate_pos_embed
from mst_tpu.ops.fused_block import (
    fused_attention_sublayer,
    fused_attention_sublayer_abnar,
    fused_attention_sublayer_rollout,
    fused_attention_sublayer_rope,
    fused_attention_sublayer_rope_with_row,
    fused_attention_sublayer_train,
    fused_attention_sublayer_train_rope,
    fused_attention_sublayer_with_row,
    fused_mlp_sublayer,
    fused_mlp_sublayer_train,
    fused_swiglu_sublayer,
    fused_swiglu_sublayer_train,
)
from mst_tpu.ops.rotary import rope_2d_angles


# The fused kernels hold the whole [S, E] sequence per program
# (fused_block.py "Constraints"); beyond this the flax path (ragged flash
# attention) takes over rather than risking a Mosaic VMEM compile failure.
FUSED_MAX_TOKENS = 512


def fused_config_supported(model, train: bool = False) -> bool:
    """Model-config conditions shared by every fused-path gate (serving:
    train/predictor.py; training: train/trainer.should_use_fused_train).
    Fusion-rotary / non-transformer-fusion configs use flax modules the
    fused kernels do not implement. Since round 3 the residual-sharing
    train kernels carry rope (DINOv3) and runtime-eps plumbing, so the
    train gate equals the serving gate.

    The encoder width must be lane-aligned (embed_dim % 128): Mosaic
    cannot lower the kernels' (K, S, E)->(K*S, E) collapse for narrower
    widths (measured on v5e: the test-only 32-wide "tiny" config fails
    `infer-vector-layout: unsupported shape cast`; every reference size
    — 384/768/1024/1536 — compiles at any token count). Narrow configs
    route to the flax composition instead of crashing the compile."""
    del train  # train/serve support parity since round 3
    width = _VIT_CONFIGS.get(getattr(model, "model_size", ""), {}).get(
        "embed_dim", 0)
    return (
        type(model).__name__ == "DinoSliceClassifier"
        and getattr(model, "rotary", 1) is None
        and getattr(model, "slice_fusion", "") == "transformer"
        and getattr(model, "fusion_layers", 0) >= 1
        and width >= 128 and width % 128 == 0
    )


def fused_seq_len_ok(model, height: int, width: int) -> bool:
    """Whether an input of this slice size fits the whole-sequence fused
    kernels (S = 1 + registers + patch tokens <= FUSED_MAX_TOKENS). 224px
    ViT-S/14 gives 257; 518px (1370 tokens) must use the flax path."""
    p = model.patch_size
    tokens = 1 + model.num_register_tokens + (height // p) * (width // p)
    return tokens <= FUSED_MAX_TOKENS


@dataclass(frozen=True)
class FastViTConfig:
    embed_dim: int
    depth: int
    num_heads: int
    patch_size: int = 14
    num_register_tokens: int = 0
    pos_embed_grid: int = 37
    gelu_approximate: bool = True
    ffn_layer: str = "mlp"  # "mlp" | "swiglu" (giant2 / DINOv3-gated)
    ffn_hidden: Optional[int] = None
    use_pos_embed: bool = True  # False: DINOv3 RoPE-only positions
    use_rope_2d: bool = False
    rope_theta: float = 100.0
    rope_normalized: bool = False
    norm_eps: float = 1e-6

    @classmethod
    def from_model(cls, model) -> "FastViTConfig":
        base = _VIT_CONFIGS[model.model_size]
        return cls(
            embed_dim=base["embed_dim"], depth=base["depth"],
            num_heads=base["num_heads"], patch_size=model.patch_size,
            num_register_tokens=model.num_register_tokens,
            pos_embed_grid=model.pos_embed_grid,
            gelu_approximate=model.gelu_approximate,
            ffn_layer=(getattr(model, "ffn_layer", None)
                       or base.get("ffn_layer", "mlp")),
            ffn_hidden=getattr(model, "ffn_hidden", None),
            use_pos_embed=getattr(model, "use_pos_embed", True),
            use_rope_2d=getattr(model, "use_rope_2d", False),
            rope_theta=getattr(model, "rope_theta", 100.0),
            rope_normalized=getattr(model, "rope_normalized", False),
            norm_eps=getattr(model, "norm_eps", 1e-6),
        )


def prepare_vit_tokens(params, x, cfg: FastViTConfig, dtype=jnp.bfloat16):
    """Token prep shared by `fused_vit_cls` and the int8 calibration
    forward (`ops/fused_int8.calibrate_act_scales_int8`): patch embed
    (unfold+matmul), pos-embed interpolation / RoPE-only positions, cls +
    register token prepend, 2D rope tables. x: [N, H, W, 3] ->
    (h [N, S, E], rope_cos, rope_sin)."""
    N, H, W, C = x.shape
    p = cfg.patch_size
    gh, gw = H // p, W // p
    E = cfg.embed_dim

    # Patchify WITHOUT the explicit (0,1,3,2,4,5) im2col transpose: contract
    # the (p, p, C) patch dims directly against the HWIO kernel.  The
    # materialised transpose (and its scatter-shaped backward) ran ~15x over
    # the matmul bound with p=14 (lane-hostile); folding the layout into
    # dot_general measured 5.87 vs 6.87 ms fwd+dW at the bs8 train shape
    # (tools/bench_patchify.py).  Output matches the unfold+matmul path to
    # bf16 rounding.
    # (a per-patch-row decomposition — tools/bench_patchify.py "rowsum" —
    # wins in isolation but NOT inside the composed grad program: 4.46 vs
    # 4.25 ms tokens leg; XLA already folds this layout once fused)
    xp = x.astype(dtype).reshape(N, gh, p, gw, p, C)
    w = params["patch_embed"]["proj"]["kernel"].astype(dtype)  # [p, p, C, E]
    tokens = jax.lax.dot_general(
        xp, w, dimension_numbers=(((2, 4, 5), (0, 1, 2)), ((), ())),
        preferred_element_type=dtype,
    ).reshape(N, gh * gw, E)
    tokens = tokens + params["patch_embed"]["proj"]["bias"].astype(dtype)

    if cfg.use_pos_embed:
        pe = interpolate_pos_embed(
            params["pos_embed"], (gh, gw),
            (cfg.pos_embed_grid, cfg.pos_embed_grid)
        ).astype(dtype)
        tokens = tokens + pe[:, 1:]
        cls = jnp.broadcast_to(
            params["cls_token"].astype(dtype) + pe[:, :1], (N, 1, E)
        )
    else:  # DINOv3: RoPE-only positions
        cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (N, 1, E))
    parts = [cls]
    if cfg.num_register_tokens:
        parts.append(jnp.broadcast_to(
            params["register_tokens"].astype(dtype),
            (N, cfg.num_register_tokens, E)))
    parts.append(tokens)
    h = jnp.concatenate(parts, axis=1)

    rope_cos = rope_sin = None
    if cfg.use_rope_2d:
        ang = rope_2d_angles(
            (gh, gw), E // cfg.num_heads,
            num_prefix=1 + cfg.num_register_tokens,
            theta=cfg.rope_theta, normalized=cfg.rope_normalized)
        rope_cos, rope_sin = jnp.cos(ang), jnp.sin(ang)
    return h, rope_cos, rope_sin


def _fused_train_block(h, blk, rope_cos, rope_sin, *, cfg: FastViTConfig):
    """One encoder block on the residual-sharing train kernels as a pure
    function of (tokens, block params) — the unit `jax.checkpoint` wraps
    for `remat=True`. Under remat the kernels' saved residuals (qkv [S,3E],
    pre-proj o [S,E], pre-activation hidden) are produced during the
    backward's recompute and consumed immediately, instead of being stored
    across the whole forward: activation memory drops from ~8-9E per token
    per block to the E-wide block inputs, which is what lets ViT-L/giant2
    train UNFROZEN in one chip's HBM (~+fwd/3 FLOPs)."""
    ls1 = blk["ls1"]["gamma"] if "ls1" in blk else None
    ls2 = blk["ls2"]["gamma"] if "ls2" in blk else None
    attn_args = (h, blk["norm1"]["scale"], blk["norm1"]["bias"],
                 blk["attn"]["qkv"]["kernel"], blk["attn"]["qkv"]["bias"],
                 blk["attn"]["proj"]["kernel"], blk["attn"]["proj"]["bias"],
                 ls1)
    if rope_cos is not None:
        h = fused_attention_sublayer_train_rope(
            *attn_args, rope_cos, rope_sin, cfg.num_heads, cfg.norm_eps)
    else:
        h = fused_attention_sublayer_train(*attn_args, cfg.num_heads,
                                           cfg.norm_eps)
    if cfg.ffn_layer == "swiglu":
        h = fused_swiglu_sublayer_train(
            h, blk["norm2"]["scale"], blk["norm2"]["bias"],
            blk["mlp"]["w12"]["kernel"], blk["mlp"]["w12"]["bias"],
            blk["mlp"]["w3"]["kernel"], blk["mlp"]["w3"]["bias"],
            ls2, cfg.norm_eps)
    else:
        h = fused_mlp_sublayer_train(
            h, blk["norm2"]["scale"], blk["norm2"]["bias"],
            blk["mlp"]["fc1"]["kernel"], blk["mlp"]["fc1"]["bias"],
            blk["mlp"]["fc2"]["kernel"], blk["mlp"]["fc2"]["bias"],
            ls2, cfg.gelu_approximate, cfg.norm_eps)
    return h


def _cls_last_block(h, blk, rope_cos, rope_sin, *, cfg: FastViTConfig):
    """The FINAL encoder block evaluated for the CLS token only.

    The MST forward consumes nothing but the CLS feature after the last
    block (`fused_vit_cls` returns `hf[:, 0]`; reference
    `mst/models/dino.py:134-166` reads `encoder(x)` = the CLS embedding),
    so the last block's patch-token outputs are dead code — in the
    backward too (their cotangents are exactly zero). This computes only
    what is live:

    - LN + k/v projection over ALL tokens (CLS attends to everything),
    - the q projection / attention row / proj for the CLS query alone,
    - the MLP on the single CLS token.

    That drops the block from ~1.01 GFLOP to ~0.16 GFLOP per ViT-S slice
    (the S× factor disappears from scores/context/proj/MLP) — ~6-7% of
    the whole encoder chain, on serving AND training. Pure XLA: at one
    query token there is no kernel-fusion win left for Pallas to add.

    Returns (cls_out [N, E] pre-final-norm, row [N, heads, S] f32) — the
    row is the per-head CLS softmax row, exactly what the "last"
    saliency mode consumes (`ops/saliency.plane_attention_from_row`), so
    `want_last_row` serving gets it for free.
    """
    from mst_tpu.ops.fused_block import _ln

    N, S, E = h.shape
    nh = cfg.num_heads
    hd = E // nh
    dtype = h.dtype
    ls1 = blk["ls1"]["gamma"] if "ls1" in blk else None
    ls2 = blk["ls2"]["gamma"] if "ls2" in blk else None

    hn = _ln(h, blk["norm1"]["scale"], blk["norm1"]["bias"],
             cfg.norm_eps).astype(dtype)
    wqkv = blk["attn"]["qkv"]["kernel"].astype(dtype)
    bqkv = blk["attn"]["qkv"]["bias"].astype(dtype)
    # qkv packing is [q | k | v] along the output dim (vit.Attention /
    # fused_block._attn_ref reshape to [..., 3, heads, hd]).
    q = hn[:, 0] @ wqkv[:, :E] + bqkv[:E]       # [N, E] — CLS query only
    kv = hn @ wqkv[:, E:] + bqkv[E:]            # [N, S, 2E]
    q = q.reshape(N, nh, hd)
    kv = kv.reshape(N, S, 2, nh, hd)
    k = jnp.moveaxis(kv[:, :, 0], 1, 2)         # [N, nh, S, hd]
    v = jnp.moveaxis(kv[:, :, 1], 1, 2)

    if rope_cos is not None:
        def rot(t):  # interleaved pairs: (a, b) -> (-b, a)
            tf = t.astype(jnp.float32).reshape(*t.shape[:-1], hd // 2, 2)
            tr = jnp.stack([-tf[..., 1], tf[..., 0]], axis=-1)
            return tr.reshape(*t.shape[:-1], hd)
        # CLS is a prefix token: rope row 0 is the zero angle (identity),
        # applied anyway so the math stays table-driven.
        q = (q.astype(jnp.float32) * rope_cos[0] + rot(q) * rope_sin[0]
             ).astype(dtype)
        k = (k.astype(jnp.float32) * rope_cos + rot(k) * rope_sin
             ).astype(dtype)

    s = jnp.einsum("nhd,nhkd->nhk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    row = jax.nn.softmax(s, axis=-1)            # [N, nh, S] f32
    o = jnp.einsum("nhk,nhkd->nhd", row.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(dtype)
    y = o.reshape(N, E) @ blk["attn"]["proj"]["kernel"].astype(dtype) + \
        blk["attn"]["proj"]["bias"].astype(dtype)
    if ls1 is not None:
        y = y * ls1.astype(dtype)
    c = h[:, 0] + y                             # [N, E]

    cn = _ln(c, blk["norm2"]["scale"], blk["norm2"]["bias"],
             cfg.norm_eps).astype(dtype)
    if cfg.ffn_layer == "swiglu":
        h12 = cn @ blk["mlp"]["w12"]["kernel"].astype(dtype) + \
            blk["mlp"]["w12"]["bias"].astype(dtype)
        h1, h2 = jnp.split(h12, 2, axis=-1)
        m = (jax.nn.silu(h1) * h2) @ blk["mlp"]["w3"]["kernel"].astype(dtype) \
            + blk["mlp"]["w3"]["bias"].astype(dtype)
    else:
        m = cn @ blk["mlp"]["fc1"]["kernel"].astype(dtype) + \
            blk["mlp"]["fc1"]["bias"].astype(dtype)
        m = jax.nn.gelu(m, approximate=cfg.gelu_approximate)
        m = m @ blk["mlp"]["fc2"]["kernel"].astype(dtype) + \
            blk["mlp"]["fc2"]["bias"].astype(dtype)
    if ls2 is not None:
        m = m * ls2.astype(dtype)
    return c + m, row


def fused_vit_cls(params, x, cfg: FastViTConfig,
                  dtype=jnp.bfloat16, train: bool = False,
                  want_last_row: bool = False,
                  want_rollout: bool = False,
                  want_abnar: bool = False,
                  remat: bool = False):
    """params: the VisionTransformer subtree; x: [N, H, W, 3] -> CLS [N, E].

    train=True routes through the residual-sharing kernel variants whose
    backward never re-runs the forward (fused_block.py train section).
    want_last_row=True (serving) additionally returns the LAST
    block's per-head CLS softmax row [N, heads, S] f32 — what
    `ops/saliency.plane_attention` consumes — computed in-kernel so the
    explainability path never materialises [N, heads, S, S] probabilities;
    returns (cls, row).
    want_rollout=True (serving) instead threads the attention-rollout
    chain's CLS row through every block in-VMEM
    (`fused_attention_sublayer_rollout`) and returns (cls, chain_row) —
    the reference `get_attention_cls` chain without the 12 sowed
    [N, heads, S, S] tensors.
    want_abnar=True (serving) collects each block's Abnar rollout factor
    emitted in-kernel ([N, S, S] f32, head-meaned + identity +
    row-normalised) and returns (cls, factors) — the newest-first Abnar
    product cannot thread a forward carry, so the factors chain in XLA
    (`ops/saliency.attention_rollout_from_factors`)."""
    N = x.shape[0]
    h, rope_cos, rope_sin = prepare_vit_tokens(params, x, cfg, dtype)

    if sum((want_last_row, want_rollout, want_abnar)) > 1:
        raise ValueError("want_last_row / want_rollout / want_abnar are "
                         "mutually exclusive saliency modes")
    if want_abnar and train:
        raise ValueError("want_abnar is a serving-only path")
    abnar_factors = []
    attn_fn = fused_attention_sublayer_train if train else \
        fused_attention_sublayer
    mlp_fn = fused_mlp_sublayer_train if train else fused_mlp_sublayer
    swiglu_fn = fused_swiglu_sublayer_train if train else fused_swiglu_sublayer
    carry = None
    if want_rollout:
        if train:
            raise ValueError("want_rollout is a serving-only path")
        S_tot = h.shape[1]
        carry = jnp.zeros((N, cfg.num_heads, S_tot), jnp.float32
                          ).at[:, :, 0].set(1.0)  # e_0: chain starts empty
    if want_last_row and train:
        raise ValueError("want_last_row is a serving-only path")
    ckpt_block = None
    if train and remat:
        ckpt_block = jax.checkpoint(
            functools.partial(_fused_train_block, cfg=cfg))
    # CLS-only last block (`_cls_last_block`): every mode whose only
    # consumers are the CLS feature (+ optionally the last CLS row) skips
    # the dead patch-token work of the final block. rollout/abnar need the
    # full last-block attention matrix; int8-quantized last blocks (trees
    # built with quantize_last=True) keep the full kernel path.
    last_blk = params[f"blocks_{cfg.depth - 1}"]
    cheap_last = (not want_rollout and not want_abnar
                  and "q8" not in last_blk["attn"]["qkv"]
                  and not os.environ.get("MST_NO_CHEAP_LAST"))
    loop_depth = cfg.depth - 1 if cheap_last else cfg.depth
    for i in range(loop_depth):
        blk = params[f"blocks_{i}"]
        if train and "q8" in blk["attn"]["qkv"]:
            # checked BEFORE the remat dispatch: the ckpt_block path would
            # otherwise die on a bare KeyError('kernel') inside
            # _fused_train_block instead of this explanation
            raise ValueError(
                "int8-quantized params serve only (training rides the "
                "bf16 kernels)")
        if ckpt_block is not None:
            h = ckpt_block(h, blk, rope_cos, rope_sin)
            continue
        ls1 = blk["ls1"]["gamma"] if "ls1" in blk else None
        ls2 = blk["ls2"]["gamma"] if "ls2" in blk else None
        want_row_here = want_last_row and i == cfg.depth - 1
        if "q8" in blk["attn"]["qkv"]:
            # int8-quantized block (`ops/fused_int8.quantize_encoder_int8`)
            # — W8A8 token-wise matmuls on the MXU's doubled int8 rate;
            # serving only (incl. the rope/DINOv3 config: rope applies to
            # the dequantised bf16 q/k; CLS-row / rollout emission for the
            # explainability modes rides the same kernels). train+int8
            # already raised above, before the remat dispatch.
            from mst_tpu.ops.fused_int8 import (
                fused_attention_sublayer_i8,
                fused_mlp_sublayer_i8,
                fused_swiglu_sublayer_i8,
            )

            # Static-activation-scale trees (calibrated PTQ,
            # `quantize_encoder_int8(..., act_scales=...)`) carry "a_inv"
            # on the second-matmul node; detection is static at trace time.
            ffn2 = (blk["mlp"]["w3"] if cfg.ffn_layer == "swiglu"
                    else blk["mlp"]["fc2"])
            static = "a_inv" in ffn2
            attn_out = fused_attention_sublayer_i8(
                h, blk["norm1"]["scale"], blk["norm1"]["bias"],
                blk["attn"]["qkv"], blk["attn"]["proj"], ls1,
                cfg.num_heads, cfg.norm_eps,
                rope_cos=rope_cos, rope_sin=rope_sin, static=static,
                want_row=want_row_here, abnar=want_abnar,
                carry=carry if want_rollout else None)
            if want_rollout:
                h, carry = attn_out
            elif want_row_here:
                h, last_row = attn_out
            elif want_abnar:
                h, amat = attn_out
                abnar_factors.append(amat)
            else:
                h = attn_out
            if cfg.ffn_layer == "swiglu":
                h = fused_swiglu_sublayer_i8(
                    h, blk["norm2"]["scale"], blk["norm2"]["bias"],
                    blk["mlp"]["w12"], blk["mlp"]["w3"], ls2, cfg.norm_eps)
            else:
                h = fused_mlp_sublayer_i8(
                    h, blk["norm2"]["scale"], blk["norm2"]["bias"],
                    blk["mlp"]["fc1"], blk["mlp"]["fc2"], ls2,
                    cfg.gelu_approximate, cfg.norm_eps)
            continue
        attn_args = (
            h, blk["norm1"]["scale"], blk["norm1"]["bias"],
            blk["attn"]["qkv"]["kernel"], blk["attn"]["qkv"]["bias"],
            blk["attn"]["proj"]["kernel"], blk["attn"]["proj"]["bias"],
            ls1,
        )
        if want_rollout:
            h, carry = fused_attention_sublayer_rollout(
                *attn_args, carry, cfg.num_heads, cfg.norm_eps,
                rope_cos=rope_cos, rope_sin=rope_sin)
        elif want_abnar:
            h, amat = fused_attention_sublayer_abnar(
                *attn_args, cfg.num_heads, cfg.norm_eps,
                rope_cos=rope_cos, rope_sin=rope_sin)
            abnar_factors.append(amat)
        elif rope_cos is not None:
            if want_row_here:
                h, last_row = fused_attention_sublayer_rope_with_row(
                    *attn_args, rope_cos, rope_sin, cfg.num_heads,
                    cfg.norm_eps)
            elif train:
                h = fused_attention_sublayer_train_rope(
                    *attn_args, rope_cos, rope_sin, cfg.num_heads,
                    cfg.norm_eps)
            else:
                h = fused_attention_sublayer_rope(
                    *attn_args, rope_cos, rope_sin, cfg.num_heads,
                    cfg.norm_eps)
        elif want_row_here:
            h, last_row = fused_attention_sublayer_with_row(
                *attn_args, cfg.num_heads, cfg.norm_eps)
        else:
            h = attn_fn(*attn_args, cfg.num_heads, cfg.norm_eps)
        if cfg.ffn_layer == "swiglu":
            swiglu_args = (
                h, blk["norm2"]["scale"], blk["norm2"]["bias"],
                blk["mlp"]["w12"]["kernel"], blk["mlp"]["w12"]["bias"],
                blk["mlp"]["w3"]["kernel"], blk["mlp"]["w3"]["bias"],
                ls2,
            )
            h = swiglu_fn(*swiglu_args, cfg.norm_eps)
        else:
            mlp_args = (
                h, blk["norm2"]["scale"], blk["norm2"]["bias"],
                blk["mlp"]["fc1"]["kernel"], blk["mlp"]["fc1"]["bias"],
                blk["mlp"]["fc2"]["kernel"], blk["mlp"]["fc2"]["bias"],
                ls2, cfg.gelu_approximate,
            )
            h = mlp_fn(*mlp_args, cfg.norm_eps)

    if cheap_last:
        last_fn = functools.partial(_cls_last_block, cfg=cfg)
        if ckpt_block is not None:
            last_fn = jax.checkpoint(last_fn)
        cls_vec, row = last_fn(h, last_blk, rope_cos, rope_sin)
        if want_last_row:
            last_row = row
    else:
        cls_vec = h[:, 0]  # final LN is per-token: LN(h)[:, 0] == LN(h[:, 0])
    n = params["norm"]
    hf = cls_vec.astype(jnp.float32)
    mean = hf.mean(-1, keepdims=True)
    var = ((hf - mean) ** 2).mean(-1, keepdims=True)
    hf = (hf - mean) * jax.lax.rsqrt(var + cfg.norm_eps) * n["scale"] + n["bias"]
    cls = hf.astype(dtype)
    if want_rollout:
        return cls, carry
    if want_abnar:
        return cls, abnar_factors
    if want_last_row:
        return cls, last_row
    return cls


def fused_mst_logits(params, source, model, src_key_padding_mask=None,
                     dtype=jnp.bfloat16, train: bool = False) -> jax.Array:
    """Full MST forward (DinoSliceClassifier params) on the fused path.

    source: [B, C, D, H, W]; only the per-slice encoder uses the fused
    kernels — the slice fusion / head are tiny and stay in XLA.
    train=True selects the residual-sharing kernels (differentiable without
    forward recompute); valid when all dropout rates are 0 (the reference's
    defaults) since the fused path has no rng plumbing. Frozen models
    (`model.freeze`) run the encoder through the serving kernels under
    stop_gradient instead.
    """
    logits, _, _ = _fused_mst(params, source, model, src_key_padding_mask,
                              dtype, train=train)
    return logits


def fused_mst_saliency(params, source, model, src_key_padding_mask=None,
                       dtype=jnp.bfloat16, plane_mode: str = "last"):
    """(probs, saliency [B, D, H, W]) on the fused serving path — the
    explainability contract of `train/predictor._forward_with_saliency`
    (reference `dino.py:169-202` + `main_predict.py:55-106`) without ever
    materialising full attention matrices. plane_mode "last": the last
    encoder block's kernel emits the per-head CLS row in-VMEM;
    plane_mode "rollout": the reference `get_attention_cls` chain's CLS
    row is threaded through every block's kernel
    (`fused_attention_sublayer_rollout`) — either way
    `plane_attention_from_row` consumes one [N, heads, S] row and the
    tiny fusion layer's probs come from its XLA softmax."""
    from mst_tpu.ops.saliency import (
        attention_rollout_from_factors,
        combined_saliency,
        plane_attention_from_row,
        slice_attention,
        upsample_saliency,
    )

    B, C, D, H, W = source.shape
    p = model.patch_size
    logits, sal_data, fusion_probs = _fused_mst(
        params, source, model, src_key_padding_mask, dtype,
        want_saliency=True, plane_mode=plane_mode)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
    if fusion_probs is None:  # single possible only with fusion_layers >= 1
        sw = jnp.full((B, D), 1.0 / D, jnp.float32)
    else:
        sw = slice_attention(fusion_probs)
    n_prefix = 1 + model.num_register_tokens
    gh, gw = H // p, W // p
    if plane_mode == "rollout_abnar":
        pw = attention_rollout_from_factors(sal_data, n_prefix
                                            ).reshape(-1, gh, gw)
    else:
        pw = plane_attention_from_row(sal_data, n_prefix, (gh, gw))
    sal = combined_saliency(sw, pw)
    return probs, upsample_saliency(sal, (D, H, W))


def _fused_mst(params, source, model, src_key_padding_mask=None,
               dtype=jnp.bfloat16, train: bool = False,
               want_saliency: bool = False, plane_mode: str = "last"):
    """Shared fused MST forward -> (logits, last_row | None,
    fusion_probs | None). With plane_mode="rollout" the returned row is
    the rollout chain's CLS row instead of the last block's."""
    cfg = FastViTConfig.from_model(model)
    B, C, D, H, W = source.shape
    x = jnp.transpose(source, (0, 2, 3, 4, 1)).reshape(B * D, H, W, C)
    if C == 1:
        x = jnp.repeat(x, 3, axis=-1)
    last_row = fusion_probs = None
    frozen = getattr(model, "freeze", False)
    if want_saliency and plane_mode == "rollout":
        feats, last_row = fused_vit_cls(params["encoder"], x, cfg, dtype,
                                        want_rollout=True)
    elif want_saliency and plane_mode == "rollout_abnar":
        feats, last_row = fused_vit_cls(params["encoder"], x, cfg, dtype,
                                        want_abnar=True)
    elif want_saliency:
        feats, last_row = fused_vit_cls(params["encoder"], x, cfg, dtype,
                                        want_last_row=True)
    elif train and frozen:
        # Frozen-encoder training (the reference's giant2 workflow,
        # `dino.py:69-71`): the encoder forward rides the SERVING kernels
        # (no residual outputs to write — they would only feed a backward
        # XLA dead-code-eliminates anyway), stop_gradient keeps the
        # backward to fusion + head. VERDICT r2 #2.
        feats = jax.lax.stop_gradient(
            fused_vit_cls(params["encoder"], x, cfg, dtype, train=False))
    else:
        feats = fused_vit_cls(params["encoder"], x, cfg, dtype, train=train,
                              remat=train and getattr(model, "remat", False))
        if frozen:
            feats = jax.lax.stop_gradient(feats)
    E = feats.shape[-1]
    if "bottleneck" in params:
        bp = params["bottleneck"]
        feats = feats @ bp["kernel"].astype(dtype) + bp["bias"].astype(dtype)
        E = feats.shape[-1]
    feats = feats.reshape(B, D, E)
    if "slice_pos_emb" in params:
        table = params["slice_pos_emb"]["embedding"]
        if D <= table.shape[0]:
            pos = table[jnp.arange(D)]
        else:
            # Large-D volumes: depth-interpolate the table exactly like the
            # flax path (models/mst.py) — a plain gather would silently
            # CLAMP indices >= vocab to the last row (JAX gather semantics),
            # giving every slice past 256 the same position.
            pos = jax.image.resize(
                table.astype(jnp.float32), (D, table.shape[1]), "linear")
        feats = feats + pos[None].astype(dtype)

    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (B, 1, E))
    h = jnp.concatenate([cls, feats], axis=1)
    scale = 1.0 / math.sqrt(E // model.fusion_heads)

    def ln(x, prm):
        # torch-layer norms (fusion / fusion_norm) use eps=1e-5, unlike the
        # DINOv2 ViT's 1e-6 (matches models/slice_fusion.py).
        xf = x.astype(jnp.float32)
        m = xf.mean(-1, keepdims=True)
        v = ((xf - m) ** 2).mean(-1, keepdims=True)
        return ((xf - m) * jax.lax.rsqrt(v + 1e-5) * prm["scale"]
                + prm["bias"]).astype(x.dtype)

    for i in range(model.fusion_layers):
        fp = params[f"fusion_{i}"]
        hn = ln(h, fp["norm1"])
        qkv = hn @ fp["self_attn"]["in_proj"]["kernel"].astype(dtype) + \
            fp["self_attn"]["in_proj"]["bias"].astype(dtype)
        nh = model.fusion_heads
        hd = E // nh
        qkv = qkv.reshape(B, -1, 3, nh, hd)
        q, k, v = (jnp.moveaxis(qkv[:, :, j], 1, 2) for j in range(3))
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        if src_key_padding_mask is not None:
            pad = jnp.concatenate(
                [jnp.zeros((B, 1), bool), src_key_padding_mask], axis=1)
            s = jnp.where(pad[:, None, None, :], -1e30, s)
        p = jax.nn.softmax(s, -1)
        if want_saliency and i == model.fusion_layers - 1:
            fusion_probs = p  # [B, heads, 1+D, 1+D] f32
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(dtype), v,
                       preferred_element_type=jnp.float32).astype(dtype)
        o = jnp.moveaxis(o, 1, 2).reshape(B, -1, E)
        h = h + (o @ fp["self_attn"]["out_proj"]["kernel"].astype(dtype)
                 + fp["self_attn"]["out_proj"]["bias"].astype(dtype))
        hn = ln(h, fp["norm2"])
        ff = jax.nn.relu(hn @ fp["linear1"]["kernel"].astype(dtype)
                         + fp["linear1"]["bias"].astype(dtype))
        h = h + (ff @ fp["linear2"]["kernel"].astype(dtype)
                 + fp["linear2"]["bias"].astype(dtype))
    if "fusion_norm" in params:
        h = ln(h, params["fusion_norm"])
    pooled = h[:, 0].astype(jnp.float32)
    logits = pooled @ params["head"]["kernel"] + params["head"]["bias"]
    return logits, last_row, fusion_probs
