"""Int8 (W8A8) fused ViT sub-layer kernels — opt-in serving quantization.

The bf16 fused path (`ops/fused_block.py`) runs the ViT-S MST chain at
~105 TFLOP/s, ~53% of v5e's 197 TFLOP/s bf16 peak; the remaining headroom
is capped by the attention score/context matmuls (hd=64 contraction) and
LN/softmax VPU work. The v5e MXU doubles its rate for int8 (394 TOPS), so
the token-wise matmuls — qkv / proj / fc1 / fc2, ~90% of encoder FLOPs —
run here as int8×int8→int32 with

- per-OUTPUT-CHANNEL symmetric weight scales, folded offline
  (`quantize_encoder_int8`), and
- per-TOKEN symmetric activation scales computed in-kernel after the
  LayerNorm (dynamic quantization — no calibration pass needed),

while softmax attention itself stays in bf16 from the dequantized q/k/v
(its FLOPs are ~10% and it is the accuracy-critical part). The slice-fusion
layer, head, patch embed and all LN/bias/residual math stay full precision.

Accuracy: per-token × per-channel symmetric W8A8 keeps the per-layer
matmul outputs within ~1e-2 relative of bf16; CLS cosine vs the bf16 path
is > 0.999 on random and converted weights (tests/test_fused_int8.py).
This is the standard production recipe (e.g. LLM.int8()-style serving)
— classification argmax agreement is checked in the e2e test.

Reference mapping: the reference has no quantized path (torch fp16 AMP,
`main_train.py:113`); this is a TPU-native extension along the axis its
xFormers kernels occupy (`extern/dinov2/layers/attention.py:72-89`).

Scope: serving only (no VJP). The DINOv3 config is covered too — rope
applies to the DEQUANTISED bf16 q/k, identical to the bf16 path's
rotation. CLS-row/rollout saliency serving stays on the bf16 kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mst_tpu.ops.attention import _on_tpu
from mst_tpu.ops.fused_block import (
    _COMPILER_PARAMS,
    _mhsa,
    _pick_block,
    _vec,
)


@jax.jit
def quantize_weight_int8(w) -> tuple:
    """[E, F] weight -> (int8 [E, F], f32 per-output-channel scale [1, F]).
    Symmetric: q = round(w / s), s = max|w[:, f]| / 127. Runs on device
    (jitted) — a giant2 tree quantizes without pulling 2.2 GB of weights
    to the host."""
    w = jnp.asarray(w, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0,
                    1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_encoder_int8(encoder_params) -> dict:
    """Return a copy of the VisionTransformer param subtree where every
    block's token-wise matmul kernel (attn.qkv/attn.proj + mlp.fc1/fc2 or
    mlp.w12/w3) is replaced by {"q8": int8, "scale": [1,F] f32}. All other
    leaves (LN, biases, patch_embed, cls/pos/register tokens, final norm)
    pass through unchanged. `fused_vit_cls` dispatches on the "q8" key."""

    def _conv(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = _conv(v)
            else:
                out[k] = v
        return out

    params = _conv(encoder_params)
    for name, blk in params.items():
        if not name.startswith("blocks_"):
            continue
        for path in (("attn", "qkv"), ("attn", "proj"), ("mlp", "fc1"),
                     ("mlp", "fc2"), ("mlp", "w12"), ("mlp", "w3")):
            node = blk
            for p in path[:-1]:
                node = node.get(p, {})
            leaf = node.get(path[-1])
            if leaf is None or "kernel" not in leaf:
                continue
            q, s = quantize_weight_int8(leaf["kernel"])
            node[path[-1]] = {"q8": jnp.asarray(q), "scale": jnp.asarray(s),
                              "bias": leaf["bias"]}
    return params


def quantize_mst_params_int8(params) -> dict:
    """Quantize the encoder inside a full DinoSliceClassifier param tree
    (checkpoint `params`); fusion layers / head / bottleneck stay full
    precision. The result feeds `vit_fast.fused_mst_logits` unchanged —
    `fused_vit_cls` dispatches per block on the "q8" key."""
    out = dict(params)
    out["encoder"] = quantize_encoder_int8(params["encoder"])
    return out


def _quant_rows(h):
    """Per-token symmetric int8 quantization of an f32 [T, F] block:
    -> (int8 values, f32 per-row scale [T, 1])."""
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    q = jnp.round(h * (1.0 / scale)).astype(jnp.int8)
    return q, scale


def _dot_i8(aq, wq):
    """int8 x int8 -> int32 on the MXU."""
    return jax.lax.dot_general(
        aq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _attn_i8_kernel(*refs, num_heads: int, has_ls: bool, eps: float,
                    has_rope: bool = False):
    """y = x + ls * proj_i8(MHSA_bf16([RoPE](qkv_i8(LN(x))))) — W8A8 qkv +
    proj, bf16 softmax attention. RoPE (the DINOv3 config) applies to the
    DEQUANTISED bf16 q/k, so the rotation is exactly the bf16 path's."""
    if has_rope:
        (x_ref, lns_ref, lnb_ref, wqkv_ref, sqkv_ref, bqkv_ref,
         wproj_ref, sproj_ref, bproj_ref, ls_ref,
         cos_ref, sin_ref, pmat_ref, o_ref) = refs
        rope = (cos_ref[:], sin_ref[:], pmat_ref[:])
    else:
        (x_ref, lns_ref, lnb_ref, wqkv_ref, sqkv_ref, bqkv_ref,
         wproj_ref, sproj_ref, bproj_ref, ls_ref, o_ref) = refs
        rope = None
    K, S, E = x_ref.shape
    x = x_ref[:].reshape(K * S, E)
    cd = x.dtype
    hd = E // num_heads
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps) * lns_ref[0] + lnb_ref[0]
    hq, hs = _quant_rows(h)
    qkv = (_dot_i8(hq, wqkv_ref[:]).astype(jnp.float32)
           * hs * sqkv_ref[0] + bqkv_ref[0]).astype(cd)
    o = _mhsa(qkv, E, hd, num_heads, cd, S=S, rope=rope)
    oq, osc = _quant_rows(o.astype(jnp.float32))
    y = (_dot_i8(oq, wproj_ref[:]).astype(jnp.float32)
         * osc * sproj_ref[0] + bproj_ref[0])
    if has_ls:
        y = y * ls_ref[0]
    o_ref[:] = (xf + y).astype(o_ref.dtype).reshape(K, S, E)


def _mlp_i8_kernel(x_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref,
                   w2_ref, s2_ref, b2_ref, ls_ref, o_ref, *,
                   approximate: bool, has_ls: bool, eps: float):
    """y = x + ls * fc2_i8(gelu(fc1_i8(LN(x)))) — W8A8 both matmuls, f32
    gelu."""
    K, S, E = x_ref.shape
    x = x_ref[:].reshape(K * S, E)
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps) * lns_ref[0] + lnb_ref[0]
    hq, hs = _quant_rows(h)
    a = (_dot_i8(hq, w1_ref[:]).astype(jnp.float32)
         * hs * s1_ref[0] + b1_ref[0])
    u = jax.nn.gelu(a, approximate=approximate)
    uq, us = _quant_rows(u)
    y = (_dot_i8(uq, w2_ref[:]).astype(jnp.float32)
         * us * s2_ref[0] + b2_ref[0])
    if has_ls:
        y = y * ls_ref[0]
    o_ref[:] = (xf + y).astype(o_ref.dtype).reshape(K, S, E)


def _swiglu_i8_kernel(x_ref, lns_ref, lnb_ref, w12_ref, s12_ref, b12_ref,
                      w3_ref, s3_ref, b3_ref, ls_ref, o_ref, *,
                      has_ls: bool, eps: float):
    """y = x + ls * w3_i8(silu(x1) * x2), x12 = w12_i8(LN(x)) — the giant2
    / DINOv3-gated FFN in W8A8."""
    K, S, E = x_ref.shape
    x = x_ref[:].reshape(K * S, E)
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps) * lns_ref[0] + lnb_ref[0]
    hq, hs = _quant_rows(h)
    h12 = (_dot_i8(hq, w12_ref[:]).astype(jnp.float32)
           * hs * s12_ref[0] + b12_ref[0])
    hidden = h12.shape[-1] // 2
    h1 = h12[:, :hidden]
    h2 = h12[:, hidden:]
    g = h1 * jax.nn.sigmoid(h1) * h2
    gq, gs = _quant_rows(g)
    y = (_dot_i8(gq, w3_ref[:]).astype(jnp.float32)
         * gs * s3_ref[0] + b3_ref[0])
    if has_ls:
        y = y * ls_ref[0]
    o_ref[:] = (xf + y).astype(o_ref.dtype).reshape(K, S, E)


def _call_i8(kernel, x, operands, block_n):
    N, S, E = x.shape
    in_specs = [pl.BlockSpec((block_n, S, E), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [x]
    for item in operands:
        in_specs.append(pl.BlockSpec(item.shape, lambda n: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(item)
    return pl.pallas_call(
        kernel,
        grid=(N // block_n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_n, S, E), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, S, E), x.dtype),
        interpret=not _on_tpu(),
        compiler_params=_COMPILER_PARAMS,
    )(*args)


def fused_attention_sublayer_i8(x, ln_s, ln_b, qkv_node, proj_node, ls,
                                num_heads, eps=1e-6,
                                rope_cos=None, rope_sin=None):
    """qkv_node/proj_node: {"q8", "scale", "bias"} from
    `quantize_encoder_int8`. Optional rope_cos/rope_sin ([S, hd] f32,
    `ops.rotary.rope_2d_angles` convention) select the DINOv3 variant."""
    from mst_tpu.ops.fused_block import _pair_swap_matrix

    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, x.shape[-1]), jnp.float32)
    operands = [_vec(ln_s), _vec(ln_b),
                qkv_node["q8"], jnp.asarray(qkv_node["scale"], jnp.float32),
                _vec(qkv_node["bias"]),
                proj_node["q8"], jnp.asarray(proj_node["scale"], jnp.float32),
                _vec(proj_node["bias"]), ls_arg]
    has_rope = rope_cos is not None
    if has_rope:
        pmat = jnp.asarray(_pair_swap_matrix(x.shape[-1] // num_heads),
                           x.dtype)
        operands += [jnp.asarray(rope_cos, jnp.float32),
                     jnp.asarray(rope_sin, jnp.float32), pmat]
    return _call_i8(
        functools.partial(_attn_i8_kernel, num_heads=num_heads,
                          has_ls=has_ls, eps=eps, has_rope=has_rope),
        x,
        operands,
        block_n=_pick_block(*x.shape),
    )


def fused_mlp_sublayer_i8(x, ln_s, ln_b, fc1_node, fc2_node, ls,
                          approximate, eps=1e-6):
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, x.shape[-1]), jnp.float32)
    return _call_i8(
        functools.partial(_mlp_i8_kernel, approximate=approximate,
                          has_ls=has_ls, eps=eps),
        x,
        [_vec(ln_s), _vec(ln_b),
         fc1_node["q8"], jnp.asarray(fc1_node["scale"], jnp.float32),
         _vec(fc1_node["bias"]),
         fc2_node["q8"], jnp.asarray(fc2_node["scale"], jnp.float32),
         _vec(fc2_node["bias"]), ls_arg],
        block_n=_pick_block(*x.shape),
    )


def fused_swiglu_sublayer_i8(x, ln_s, ln_b, w12_node, w3_node, ls,
                             eps=1e-6):
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, x.shape[-1]), jnp.float32)
    return _call_i8(
        functools.partial(_swiglu_i8_kernel, has_ls=has_ls, eps=eps),
        x,
        [_vec(ln_s), _vec(ln_b),
         w12_node["q8"], jnp.asarray(w12_node["scale"], jnp.float32),
         _vec(w12_node["bias"]),
         w3_node["q8"], jnp.asarray(w3_node["scale"], jnp.float32),
         _vec(w3_node["bias"]), ls_arg],
        block_n=_pick_block(*x.shape),
    )
