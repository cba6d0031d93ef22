"""Fused ViT sub-layer kernels: LN + matmuls + attention + residual in
one Pallas program per slice image.

Motivation (measured, v5e): a ViT-S block costs ~3.0 ms at MST shapes while
its isolated matmuls/attention/LN sum to ~1.4 ms — the rest is fusion
boundaries (LayerNorm round trips, head-layout transposes, residual adds).
These kernels keep the whole [S, E] activation resident in VMEM across the
sub-layer:

- `fused_attention_sublayer`: y = x + ls1 * proj(MHSA(LN1(x)))
- `fused_mlp_sublayer`:       y = x + ls2 * fc2(act(fc1(LN2(x))))

Both carry a custom VJP whose backward differentiates the equivalent XLA
composition (`_attn_ref` / `_mlp_ref`), so the fused path is usable in
training too; the kernels themselves are inference-oriented (weights are
re-streamed per program).

Constraints: S <= 512 (whole sequence per program), no attention bias, no
attention-prob output (the explainability path uses the unfused modules).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mst_tpu.ops.attention import NEG_INF, _on_tpu


# ---------------------------------------------------------------------------
# Reference (XLA) compositions — ground truth + backward rules
# ---------------------------------------------------------------------------


def _ln(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias)


def _attn_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls, num_heads):
    N, S, E = x.shape
    hd = E // num_heads
    h = _ln(x, ln_s, ln_b).astype(x.dtype)
    qkv = h @ wqkv.astype(x.dtype) + bqkv.astype(x.dtype)
    qkv = qkv.reshape(N, S, 3, num_heads, hd)
    q, k, v = (jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3))
    s = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("nhqk,nhkd->nhqd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = jnp.moveaxis(o, 1, 2).reshape(N, S, E)
    y = o @ wproj.astype(x.dtype) + bproj.astype(x.dtype)
    if ls is not None:
        y = y * ls.astype(x.dtype)
    return x + y


def _mlp_ref(x, ln_s, ln_b, w1, b1, w2, b2, ls, approximate):
    h = _ln(x, ln_s, ln_b).astype(x.dtype)
    h = h @ w1.astype(x.dtype) + b1.astype(x.dtype)
    h = jax.nn.gelu(h, approximate=approximate)
    h = h @ w2.astype(x.dtype) + b2.astype(x.dtype)
    if ls is not None:
        h = h * ls.astype(x.dtype)
    return x + h


# ---------------------------------------------------------------------------
# Kernels (grid over the N slice images; whole [S, E] in VMEM)
# ---------------------------------------------------------------------------


def _attn_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                 bproj_ref, ls_ref, o_ref, *, num_heads: int, has_ls: bool):
    x = x_ref[0]  # [S, E]
    S, E = x.shape
    hd = E // num_heads
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + 1e-6)
         * lns_ref[0] + lnb_ref[0]).astype(x.dtype)
    qkv = jax.lax.dot_general(
        h, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[0]
    qkv = qkv.astype(x.dtype)  # [S, 3E]
    scale = 1.0 / math.sqrt(hd)
    outs = []
    for i in range(num_heads):
        q = qkv[:, i * hd:(i + 1) * hd]
        k = qkv[:, E + i * hd: E + (i + 1) * hd]
        v = qkv[:, 2 * E + i * hd: 2 * E + (i + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype))
    o = jnp.concatenate(outs, axis=-1)  # [S, E]
    y = jax.lax.dot_general(
        o, wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[0]
    if has_ls:
        y = y * ls_ref[0]
    o_ref[0] = (xf + y).astype(o_ref.dtype)


def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                ls_ref, o_ref, *, approximate: bool, has_ls: bool):
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + 1e-6)
         * lns_ref[0] + lnb_ref[0]).astype(x.dtype)
    h = jax.lax.dot_general(
        h, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0]
    h = jax.nn.gelu(h, approximate=approximate).astype(x.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0]
    if has_ls:
        y = y * ls_ref[0]
    o_ref[0] = (xf + y).astype(o_ref.dtype)


def _vec(x):
    return jnp.asarray(x, jnp.float32).reshape(1, -1)


def _call_fused(kernel, x, operands, **kw):
    """Common pallas_call plumbing: x [N,S,E]; operands are grid-invariant
    VMEM-resident params ([1,dim] fp32 vectors or full weight matrices)."""
    N, S, E = x.shape
    in_specs = [pl.BlockSpec((1, S, E), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [x]
    for item in operands:
        in_specs.append(pl.BlockSpec(item.shape, lambda n: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(item)
    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, S, E), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, S, E), x.dtype),
        interpret=not _on_tpu(),
        **kw,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_attention_sublayer(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls,
                             num_heads):
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, x.shape[-1]), jnp.float32)
    return _call_fused(
        functools.partial(_attn_kernel, num_heads=num_heads, has_ls=has_ls),
        x,
        [_vec(ln_s), _vec(ln_b), jnp.asarray(wqkv, x.dtype), _vec(bqkv),
         jnp.asarray(wproj, x.dtype), _vec(bproj), ls_arg],
    )


def _attn_fwd(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls, num_heads):
    out = fused_attention_sublayer(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                                   ls, num_heads)
    return out, (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls)


def _attn_bwd(num_heads, res, g):
    x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls = res
    _, vjp = jax.vjp(
        lambda *a: _attn_ref(*a, num_heads=num_heads),
        x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls,
    )
    return vjp(g)


fused_attention_sublayer.defvjp(_attn_fwd, _attn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_mlp_sublayer(x, ln_s, ln_b, w1, b1, w2, b2, ls, approximate):
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, x.shape[-1]), jnp.float32)
    return _call_fused(
        functools.partial(_mlp_kernel, approximate=approximate, has_ls=has_ls),
        x,
        [_vec(ln_s), _vec(ln_b), jnp.asarray(w1, x.dtype), _vec(b1),
         jnp.asarray(w2, x.dtype), _vec(b2), ls_arg],
    )


def _mlp_fwd(x, ln_s, ln_b, w1, b1, w2, b2, ls, approximate):
    out = fused_mlp_sublayer(x, ln_s, ln_b, w1, b1, w2, b2, ls, approximate)
    return out, (x, ln_s, ln_b, w1, b1, w2, b2, ls)


def _mlp_bwd(approximate, res, g):
    x, ln_s, ln_b, w1, b1, w2, b2, ls = res
    _, vjp = jax.vjp(
        lambda *a: _mlp_ref(*a, approximate=approximate),
        x, ln_s, ln_b, w1, b1, w2, b2, ls,
    )
    return vjp(g)


fused_mlp_sublayer.defvjp(_mlp_fwd, _mlp_bwd)
