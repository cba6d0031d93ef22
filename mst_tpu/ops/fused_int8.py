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

Static activation scales (calibrated PTQ): the dynamic per-token abs-max
is a cross-lane VPU reduction per matmul input — measured as the bulk of
the int8 overhead at ViT-S width (ROADMAP). With a calibration pass
(`calibrate_act_scales_int8`: a pure-XLA mirror of the kernel math that
records per-tensor abs-max at the four quant sites per block),
`quantize_encoder_int8(..., act_scales=...)` FOLDS the scales offline so
the kernels do almost no quantization work at all:

- attn input:  scale folds into LN gamma/beta -> LN emits h/s directly;
- attn output: 1/s folds into the v-columns of the qkv dequant scale and
  bias, so the attention output emerges pre-scaled (softmax rows sum to
  1, so scaling v scales o linearly);
- both dequants fold s into the per-channel weight scale;
- only the FFN's nonlinear hidden (gelu/silu-gate output) needs a runtime
  multiply — one scalar `a_inv` operand per block.

In-kernel quantization then is clip(round(h), ±127).astype(int8) — no
reductions, no per-row rescale. Out-of-calibration-range activations
saturate (standard PTQ semantics; `margin` widens the scales).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mst_tpu.ops.attention import _on_tpu
from mst_tpu.ops.fused_block import (
    _COMPILER_PARAMS,
    _gelu,
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


def quantize_encoder_int8(encoder_params, act_scales=None,
                          margin: float = 1.05,
                          quantize_last: bool = False) -> dict:
    """Return a copy of the VisionTransformer param subtree where every
    block's token-wise matmul kernel (attn.qkv/attn.proj + mlp.fc1/fc2 or
    mlp.w12/w3) is replaced by {"q8": int8, "scale": [1,F] f32}. All other
    leaves (LN, biases, patch_embed, cls/pos/register tokens, final norm)
    pass through unchanged. `fused_vit_cls` dispatches on the "q8" key.

    act_scales (from `calibrate_act_scales_int8`) switches the tree to
    STATIC activation quantization: per-block per-tensor scales are folded
    into LN gamma/beta, the per-channel dequant scales, and (for the attn
    output) the v-columns of the qkv dequant — see the module docstring.
    The FFN hidden site's runtime scale ships as "a_inv" on the fc2/w3
    node (also the static-mode marker `fused_vit_cls` dispatches on).
    `margin` widens every calibrated scale to absorb out-of-sample
    activations (they saturate at ±127 beyond it).

    The LAST block is left unquantized by default (`quantize_last=False`):
    serving runs it through the CLS-only XLA block
    (`vit_fast._cls_last_block`) where only ~0.16 of its ~1.01 GFLOP
    survive — int8 has nothing left to accelerate there, and keeping it
    bf16 removes a quantization site from the accuracy budget. Pass
    `quantize_last=True` for trees that serve the rollout/abnar saliency
    modes heavily (they need the full last block and would otherwise run
    it bf16 — a ~1-2% throughput cost, the modes stay correct either
    way: `fused_vit_cls` dispatches per block on the "q8" key)."""

    def _conv(tree):
        out = {}
        for k, v in tree.items():
            out[k] = _conv(v) if isinstance(v, dict) else v
        return out

    def _copy_surviving_aliases(out, src):
        # Leaves that SURVIVE into the quantized tree are COPIED, not
        # aliased: the tree must outlive the source params (frozen int8
        # TRAINING holds it while the train step donates state.params —
        # aliased leaves would be deleted by the first step's buffer
        # donation). Copying happens AFTER quantization so the big matmul
        # kernels — replaced by q8 nodes — are never duplicated (at giant2
        # they are ~2.2 GB of the tree).
        for k, v in out.items():
            sv = src.get(k) if isinstance(src, dict) else None
            if isinstance(v, dict):
                _copy_surviving_aliases(v, sv if isinstance(sv, dict) else {})
            elif v is sv:
                out[k] = jnp.array(v, copy=True)

    params = _conv(encoder_params)
    block_ids = [int(n.split("_", 1)[1]) for n in params
                 if n.startswith("blocks_")]
    last_id = max(block_ids) if block_ids else -1
    for name, blk in params.items():
        if not name.startswith("blocks_"):
            continue
        if not quantize_last and int(name.split("_", 1)[1]) == last_id:
            continue  # served by the CLS-only bf16 block (docstring)
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
                              "bias": jnp.asarray(leaf["bias"], jnp.float32)}
        if act_scales is not None:
            _fold_static_scales(blk, act_scales[name], margin)
    _copy_surviving_aliases(params, encoder_params)
    return params


def _fold_static_scales(blk: dict, sc: dict, margin: float) -> None:
    """Fold one block's calibrated activation scales (in place on the
    already-quantized block tree). sc: {"attn_in", "attn_out", "mlp_in",
    "mlp_hidden"} per-tensor abs-max floats."""
    a_in = max(float(sc["attn_in"]), 1e-12) * margin / 127.0
    a_out = max(float(sc["attn_out"]), 1e-12) * margin / 127.0
    b_in = max(float(sc["mlp_in"]), 1e-12) * margin / 127.0
    b_hid = max(float(sc["mlp_hidden"]), 1e-12) * margin / 127.0

    # attn input: LN emits h/a_in directly
    n1 = blk["norm1"]
    n1["scale"] = jnp.asarray(n1["scale"], jnp.float32) / a_in
    n1["bias"] = jnp.asarray(n1["bias"], jnp.float32) / a_in
    # qkv dequant recovers the a_in scale; its v-columns additionally
    # divide by a_out so the attention output emerges pre-scaled
    qkv = blk["attn"]["qkv"]
    E = qkv["q8"].shape[0]
    colmul = jnp.ones((1, 3 * E), jnp.float32).at[:, 2 * E:].set(1.0 / a_out)
    qkv["scale"] = qkv["scale"] * a_in * colmul
    qkv["bias"] = qkv["bias"] * colmul[0]
    blk["attn"]["proj"]["scale"] = blk["attn"]["proj"]["scale"] * a_out

    # FFN input: LN folding again; hidden site keeps a runtime scalar
    n2 = blk["norm2"]
    n2["scale"] = jnp.asarray(n2["scale"], jnp.float32) / b_in
    n2["bias"] = jnp.asarray(n2["bias"], jnp.float32) / b_in
    if "w12" in blk["mlp"]:  # swiglu
        blk["mlp"]["w12"]["scale"] = blk["mlp"]["w12"]["scale"] * b_in
        w3 = blk["mlp"]["w3"]
        w3["scale"] = w3["scale"] * b_hid
        w3["a_inv"] = jnp.full((1, 1), 1.0 / b_hid, jnp.float32)
    else:
        blk["mlp"]["fc1"]["scale"] = blk["mlp"]["fc1"]["scale"] * b_in
        fc2 = blk["mlp"]["fc2"]
        fc2["scale"] = fc2["scale"] * b_hid
        fc2["a_inv"] = jnp.full((1, 1), 1.0 / b_hid, jnp.float32)


def calibrate_act_scales_int8(encoder_params, x, cfg,
                              dtype=jnp.bfloat16,
                              chunk: int = 16) -> dict:
    """Per-tensor abs-max at the four quantization sites of every block,
    from a pure-XLA mirror of the fused kernels' math (f32 sub-layer
    internals, `dtype` residual stream — the serving precision).

    x: [N, H, W, 3] calibration slice images (use
    `quantize_mst_params_int8(..., calib_source=...)` for [B,C,D,H,W]
    volumes); cfg: `vit_fast.FastViTConfig`. Returns
    {"blocks_i": {"attn_in", "attn_out", "mlp_in", "mlp_hidden"}} floats.

    Slice images flow through the encoder independently, so calibration
    chunks over N (`chunk` slices at a time, running max) — the explicit
    [n, heads, S, S] f32 attention stays bounded even at giant2 width.
    A ragged tail chunk is padded by wrapping around to the front of x
    (duplicate slices cannot change an abs-max), so every chunk hits the
    same jitted program.
    """
    n = x.shape[0]
    if n % chunk and n > chunk:
        pad = chunk - n % chunk
        x = jnp.concatenate([x, x[:pad]], axis=0)
    stats = None
    for lo in range(0, x.shape[0], chunk):
        cs = _calibrate_chunk(encoder_params, x[lo:lo + chunk], cfg, dtype)
        if stats is None:
            stats = cs
        else:
            stats = {name: {k: jnp.maximum(stats[name][k], v)
                            for k, v in s.items()}
                     for name, s in cs.items()}
    return {name: {k: float(v) for k, v in s.items()}
            for name, s in jax.device_get(stats).items()}


@functools.partial(jax.jit, static_argnums=(2, 3))
def _calib_prepare(encoder_params, x, cfg, dtype):
    from mst_tpu.models.vit_fast import prepare_vit_tokens

    return prepare_vit_tokens(encoder_params, x, cfg, dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "approximate", "nh", "dtype"))
def _calib_block(blk, h, rope, *, eps, approximate, nh, dtype):
    """One transformer block's calibration forward: f32 sub-layer
    internals, `dtype` residual stream — the serving precision. Returns
    (next_h, per-site abs-max dict). Jitted PER BLOCK, not per encoder:
    uniform-depth encoders compile one block program and reuse it depth
    times — jitting the whole unrolled encoder produced XLA graphs the
    remote compiler chewed on for tens of minutes at giant2 width."""
    E = h.shape[-1]
    hd = E // nh

    def _ln(xf, prm):
        m = xf.mean(-1, keepdims=True)
        v = ((xf - m) ** 2).mean(-1, keepdims=True)
        return ((xf - m) * jax.lax.rsqrt(v + eps)
                * jnp.asarray(prm["scale"], jnp.float32)
                + jnp.asarray(prm["bias"], jnp.float32))

    s = {}
    xf = h.astype(jnp.float32)
    hn = _ln(xf, blk["norm1"])
    s["attn_in"] = jnp.max(jnp.abs(hn))
    qkv = (hn @ jnp.asarray(blk["attn"]["qkv"]["kernel"], jnp.float32)
           + jnp.asarray(blk["attn"]["qkv"]["bias"], jnp.float32))
    N, S, _ = qkv.shape
    qkv = qkv.reshape(N, S, 3, nh, hd)
    q = jnp.moveaxis(qkv[:, :, 0], 1, 2)  # [N, nh, S, hd]
    k = jnp.moveaxis(qkv[:, :, 1], 1, 2)
    v = jnp.moveaxis(qkv[:, :, 2], 1, 2)
    if rope is not None:
        cos, sin, pmat = rope
        q = q * cos + (q @ pmat) * sin
        k = k * cos + (k @ pmat) * sin
    att = jnp.einsum("nhqd,nhkd->nhqk", q, k) / math.sqrt(hd)
    p = jax.nn.softmax(att, -1)
    o = jnp.einsum("nhqk,nhkd->nhqd", p, v)
    o = jnp.moveaxis(o, 1, 2).reshape(N, S, E)
    s["attn_out"] = jnp.max(jnp.abs(o))
    y = (o @ jnp.asarray(blk["attn"]["proj"]["kernel"], jnp.float32)
         + jnp.asarray(blk["attn"]["proj"]["bias"], jnp.float32))
    if "ls1" in blk:
        y = y * jnp.asarray(blk["ls1"]["gamma"], jnp.float32)
    h = (xf + y).astype(dtype)

    xf = h.astype(jnp.float32)
    hn = _ln(xf, blk["norm2"])
    s["mlp_in"] = jnp.max(jnp.abs(hn))
    if "w12" in blk["mlp"]:  # swiglu
        h12 = (hn @ jnp.asarray(blk["mlp"]["w12"]["kernel"], jnp.float32)
               + jnp.asarray(blk["mlp"]["w12"]["bias"], jnp.float32))
        hidden = h12.shape[-1] // 2
        h1, h2 = h12[..., :hidden], h12[..., hidden:]
        u = h1 * jax.nn.sigmoid(h1) * h2
        s["mlp_hidden"] = jnp.max(jnp.abs(u))
        y = (u @ jnp.asarray(blk["mlp"]["w3"]["kernel"], jnp.float32)
             + jnp.asarray(blk["mlp"]["w3"]["bias"], jnp.float32))
    else:
        a = (hn @ jnp.asarray(blk["mlp"]["fc1"]["kernel"], jnp.float32)
             + jnp.asarray(blk["mlp"]["fc1"]["bias"], jnp.float32))
        u = jax.nn.gelu(a, approximate=approximate)
        s["mlp_hidden"] = jnp.max(jnp.abs(u))
        y = (u @ jnp.asarray(blk["mlp"]["fc2"]["kernel"], jnp.float32)
             + jnp.asarray(blk["mlp"]["fc2"]["bias"], jnp.float32))
    if "ls2" in blk:
        y = y * jnp.asarray(blk["ls2"]["gamma"], jnp.float32)
    return (xf + y).astype(dtype), s


def _calibrate_chunk(encoder_params, x, cfg, dtype) -> dict:
    from mst_tpu.ops.fused_block import _pair_swap_matrix

    h, rope_cos, rope_sin = _calib_prepare(encoder_params, x, cfg, dtype)
    rope = None
    if rope_cos is not None:
        hd = cfg.embed_dim // cfg.num_heads
        rope = (jnp.asarray(rope_cos, jnp.float32),
                jnp.asarray(rope_sin, jnp.float32),
                jnp.asarray(_pair_swap_matrix(hd), jnp.float32))
    stats = {}
    for i in range(cfg.depth):
        h, stats[f"blocks_{i}"] = _calib_block(
            encoder_params[f"blocks_{i}"], h, rope, eps=cfg.norm_eps,
            approximate=cfg.gelu_approximate, nh=cfg.num_heads,
            dtype=dtype)
    return stats


def quantize_mst_params_int8(params, model=None, calib_source=None,
                             margin: float = 1.05,
                             dtype=jnp.bfloat16,
                             quantize_last: bool = False) -> dict:
    """Quantize the encoder inside a full DinoSliceClassifier param tree
    (checkpoint `params`); fusion layers / head / bottleneck stay full
    precision. The result feeds `vit_fast.fused_mst_logits` unchanged —
    `fused_vit_cls` dispatches per block on the "q8" key.

    With `model` + `calib_source` ([B, C, D, H, W] volumes), runs the
    static-scale calibration pass first and folds the activation scales
    (module docstring) — the serving kernels then skip the per-token
    abs-max reductions entirely."""
    act_scales = None
    if calib_source is not None:
        if model is None:
            raise ValueError("static calibration needs the model "
                             "(quantize_mst_params_int8(params, model, x))")
        from mst_tpu.models.vit_fast import FastViTConfig

        cfg = FastViTConfig.from_model(model)
        B, C, D, H, W = calib_source.shape
        x = jnp.transpose(calib_source, (0, 2, 3, 4, 1)).reshape(
            B * D, H, W, C)
        if C == 1:
            x = jnp.repeat(x, 3, axis=-1)
        act_scales = calibrate_act_scales_int8(
            params["encoder"], x, cfg, dtype=dtype)
    out = dict(params)
    out["encoder"] = quantize_encoder_int8(params["encoder"], act_scales,
                                           margin,
                                           quantize_last=quantize_last)
    return out


def _quant_rows(h):
    """Per-token symmetric int8 quantization of an f32 [T, F] block:
    -> (int8 values, f32 per-row scale [T, 1])."""
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    q = jnp.round(h * (1.0 / scale)).astype(jnp.int8)
    return q, scale


def _quant_static(h):
    """Static-scale quantization of a PRE-SCALED f32 block (the activation
    scale is folded upstream, module docstring): round + saturate only —
    no reductions."""
    return jnp.clip(jnp.round(h), -127.0, 127.0).astype(jnp.int8)


def _dot_i8(aq, wq):
    """int8 x int8 -> int32 on the MXU."""
    return jax.lax.dot_general(
        aq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _attn_i8_kernel(*refs, num_heads: int, has_ls: bool, eps: float,
                    has_rope: bool = False, static_act: bool = False,
                    want_row: bool = False, carry: bool = False,
                    abnar: bool = False):
    """y = x + ls * proj_i8(MHSA_bf16([RoPE](qkv_i8(LN(x))))) — W8A8 qkv +
    proj, bf16 softmax attention. RoPE (the DINOv3 config) applies to the
    DEQUANTISED bf16 q/k, so the rotation is exactly the bf16 path's.

    static_act: both activation scales are folded offline (input into LN
    gamma/beta + qkv dequant; output into the v-columns + proj dequant) —
    quantization is round+saturate only, zero reductions.

    want_row / carry mirror the bf16 `_attn_any_kernel`: emit the per-head
    CLS softmax row and/or advance the in-VMEM rollout carry — int8
    explainability serving. With static_act the v-columns arrive
    pre-scaled by 1/a_out, which cancels in softmax rows (they are built
    from q/k only), so the rows match the dynamic path's exactly."""
    idx = 1
    x_ref = refs[0]
    carry_ref = None
    if carry:
        carry_ref = refs[1]
        idx = 2
    (lns_ref, lnb_ref, wqkv_ref, sqkv_ref, bqkv_ref,
     wproj_ref, sproj_ref, bproj_ref, ls_ref) = refs[idx:idx + 9]
    idx += 9
    rope = None
    if has_rope:
        cos_ref, sin_ref, pmat_ref = refs[idx:idx + 3]
        idx += 3
        rope = (cos_ref[:], sin_ref[:], pmat_ref[:])
    out_refs = refs[idx:]
    K, S, E = x_ref.shape
    x = x_ref[:].reshape(K * S, E)
    cd = x.dtype
    hd = E // num_heads
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps) * lns_ref[0] + lnb_ref[0]
    if static_act:
        hq = _quant_static(h)
        qkv = (_dot_i8(hq, wqkv_ref[:]).astype(jnp.float32)
               * sqkv_ref[0] + bqkv_ref[0]).astype(cd)
    else:
        hq, hs = _quant_rows(h)
        qkv = (_dot_i8(hq, wqkv_ref[:]).astype(jnp.float32)
               * hs * sqkv_ref[0] + bqkv_ref[0]).astype(cd)
    out = _mhsa(qkv, E, hd, num_heads, cd, S=S, rope=rope,
                want_row=want_row, want_abnar=abnar,
                carry_row=carry_ref[:] if carry else None)
    new_carry = rows = amat = None
    rest = list(out[1:]) if isinstance(out, tuple) else []
    o = out[0] if isinstance(out, tuple) else out
    if want_row:
        rows = rest.pop(0)
    if abnar:
        amat = rest.pop(0)
    if carry:
        new_carry = rest.pop(0)
    if static_act:
        oq = _quant_static(o.astype(jnp.float32))
        y = (_dot_i8(oq, wproj_ref[:]).astype(jnp.float32)
             * sproj_ref[0] + bproj_ref[0])
    else:
        oq, osc = _quant_rows(o.astype(jnp.float32))
        y = (_dot_i8(oq, wproj_ref[:]).astype(jnp.float32)
             * osc * sproj_ref[0] + bproj_ref[0])
    if has_ls:
        y = y * ls_ref[0]
    out_refs[0][:] = (xf + y).astype(out_refs[0].dtype).reshape(K, S, E)
    oi = 1
    if want_row:
        out_refs[oi][:] = rows  # [K, heads, S]
        oi += 1
    if abnar:
        out_refs[oi][:] = amat  # [K, S, S]
        oi += 1
    if carry:
        out_refs[oi][:] = new_carry  # [K, heads, S]


def _mlp_i8_kernel(*refs, approximate: bool, has_ls: bool, eps: float,
                   static_act: bool = False):
    """y = x + ls * fc2_i8(gelu(fc1_i8(LN(x)))) — W8A8 both matmuls, f32
    gelu. static_act: input scale folded into LN/dequant; the gelu output
    (nonlinear — unfoldable) quantizes by the single runtime scalar
    ainv_ref."""
    if static_act:
        (x_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref,
         w2_ref, s2_ref, b2_ref, ls_ref, ainv_ref, o_ref) = refs
    else:
        (x_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref,
         w2_ref, s2_ref, b2_ref, ls_ref, o_ref) = refs
    K, S, E = x_ref.shape
    x = x_ref[:].reshape(K * S, E)
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps) * lns_ref[0] + lnb_ref[0]
    if static_act:
        hq = _quant_static(h)
        a = _dot_i8(hq, w1_ref[:]).astype(jnp.float32) * s1_ref[0] + b1_ref[0]
        u = _gelu(a, approximate)
        uq = _quant_static(u * ainv_ref[0, 0])
        y = _dot_i8(uq, w2_ref[:]).astype(jnp.float32) * s2_ref[0] + b2_ref[0]
    else:
        hq, hs = _quant_rows(h)
        a = (_dot_i8(hq, w1_ref[:]).astype(jnp.float32)
             * hs * s1_ref[0] + b1_ref[0])
        u = _gelu(a, approximate)
        uq, us = _quant_rows(u)
        y = (_dot_i8(uq, w2_ref[:]).astype(jnp.float32)
             * us * s2_ref[0] + b2_ref[0])
    if has_ls:
        y = y * ls_ref[0]
    o_ref[:] = (xf + y).astype(o_ref.dtype).reshape(K, S, E)


def _swiglu_i8_kernel(*refs, has_ls: bool, eps: float,
                      static_act: bool = False):
    """y = x + ls * w3_i8(silu(x1) * x2), x12 = w12_i8(LN(x)) — the giant2
    / DINOv3-gated FFN in W8A8. static_act as in `_mlp_i8_kernel` (the
    gate output quantizes by ainv_ref)."""
    if static_act:
        (x_ref, lns_ref, lnb_ref, w12_ref, s12_ref, b12_ref,
         w3_ref, s3_ref, b3_ref, ls_ref, ainv_ref, o_ref) = refs
    else:
        (x_ref, lns_ref, lnb_ref, w12_ref, s12_ref, b12_ref,
         w3_ref, s3_ref, b3_ref, ls_ref, o_ref) = refs
    K, S, E = x_ref.shape
    x = x_ref[:].reshape(K * S, E)
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps) * lns_ref[0] + lnb_ref[0]
    if static_act:
        hq = _quant_static(h)
        h12 = (_dot_i8(hq, w12_ref[:]).astype(jnp.float32)
               * s12_ref[0] + b12_ref[0])
    else:
        hq, hs = _quant_rows(h)
        h12 = (_dot_i8(hq, w12_ref[:]).astype(jnp.float32)
               * hs * s12_ref[0] + b12_ref[0])
    hidden = h12.shape[-1] // 2
    h1 = h12[:, :hidden]
    h2 = h12[:, hidden:]
    g = h1 * jax.nn.sigmoid(h1) * h2
    if static_act:
        gq = _quant_static(g * ainv_ref[0, 0])
        y = _dot_i8(gq, w3_ref[:]).astype(jnp.float32) * s3_ref[0] + b3_ref[0]
    else:
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
                                rope_cos=None, rope_sin=None,
                                static=False, want_row=False, carry=None,
                                abnar=False):
    """qkv_node/proj_node: {"q8", "scale", "bias"} from
    `quantize_encoder_int8`. Optional rope_cos/rope_sin ([S, hd] f32,
    `ops.rotary.rope_2d_angles` convention) select the DINOv3 variant.
    static=True: the nodes carry FOLDED activation scales (calibrated
    tree) — the attn kernel then needs no extra operands at all.
    want_row emits the per-head CLS softmax row [N, heads, S] f32;
    carry ([N, heads, S] f32) advances the rollout chain in-VMEM —
    the int8 explainability serving path (returns (y[, row][, carry]))."""
    from mst_tpu.ops.fused_block import _call_fused_multi, _pair_swap_matrix

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
    kernel = functools.partial(_attn_i8_kernel, num_heads=num_heads,
                               has_ls=has_ls, eps=eps, has_rope=has_rope,
                               static_act=static, want_row=want_row,
                               carry=carry is not None, abnar=abnar)
    if not want_row and carry is None and not abnar:
        return _call_i8(kernel, x, operands, block_n=_pick_block(*x.shape, cap=1))
    N, S, E = x.shape
    out_shapes = [(S, E)]
    out_dtypes = [x.dtype]
    if want_row:
        out_shapes.append((num_heads, S))
        out_dtypes.append(jnp.float32)
    if abnar:
        out_shapes.append((S, S))
        out_dtypes.append(jnp.float32)
    if carry is not None:
        out_shapes.append((num_heads, S))
        out_dtypes.append(jnp.float32)
    return _call_fused_multi(
        kernel, x, operands,
        out_shapes=out_shapes, out_dtypes=out_dtypes,
        block_n=_pick_block(N, S, E, cap=1),
        grid_inputs=[jnp.asarray(carry, jnp.float32)]
        if carry is not None else (),
    )


def fused_mlp_sublayer_i8(x, ln_s, ln_b, fc1_node, fc2_node, ls,
                          approximate, eps=1e-6):
    """Static-scale trees are detected by the "a_inv" leaf on fc2_node
    (`_fold_static_scales`)."""
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, x.shape[-1]), jnp.float32)
    static = "a_inv" in fc2_node
    operands = [_vec(ln_s), _vec(ln_b),
                fc1_node["q8"], jnp.asarray(fc1_node["scale"], jnp.float32),
                _vec(fc1_node["bias"]),
                fc2_node["q8"], jnp.asarray(fc2_node["scale"], jnp.float32),
                _vec(fc2_node["bias"]), ls_arg]
    if static:
        operands.append(jnp.asarray(fc2_node["a_inv"], jnp.float32))
    return _call_i8(
        functools.partial(_mlp_i8_kernel, approximate=approximate,
                          has_ls=has_ls, eps=eps, static_act=static),
        x,
        operands,
        block_n=_pick_block(*x.shape),
    )


def fused_swiglu_sublayer_i8(x, ln_s, ln_b, w12_node, w3_node, ls,
                             eps=1e-6):
    """Static-scale trees are detected by the "a_inv" leaf on w3_node."""
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, x.shape[-1]), jnp.float32)
    static = "a_inv" in w3_node
    operands = [_vec(ln_s), _vec(ln_b),
                w12_node["q8"], jnp.asarray(w12_node["scale"], jnp.float32),
                _vec(w12_node["bias"]),
                w3_node["q8"], jnp.asarray(w3_node["scale"], jnp.float32),
                _vec(w3_node["bias"]), ls_arg]
    if static:
        operands.append(jnp.asarray(w3_node["a_inv"], jnp.float32))
    return _call_i8(
        functools.partial(_swiglu_i8_kernel, has_ls=has_ls, eps=eps,
                          static_act=static),
        x,
        operands,
        block_n=_pick_block(*x.shape),
    )
