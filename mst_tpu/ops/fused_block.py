"""Fused ViT sub-layer kernels: LN + matmuls + attention + residual in
one Pallas program per slice image.

Motivation (measured, v5e): a ViT-S block costs ~3.0 ms at MST shapes while
its isolated matmuls/attention/LN sum to ~1.4 ms — the rest is fusion
boundaries (LayerNorm round trips, head-layout transposes, residual adds).
These kernels keep the whole [S, E] activation resident in VMEM across the
sub-layer:

- `fused_attention_sublayer`: y = x + ls1 * proj(MHSA(LN1(x)))
- `fused_mlp_sublayer`:       y = x + ls2 * fc2(act(fc1(LN2(x))))
- `fused_swiglu_sublayer`:    y = x + ls2 * w3(silu(x1) * x2), x12=w12(LN2(x))
  (the giant2 FFN, reference `layers/swiglu_ffn.py`)

Both carry a custom VJP whose backward differentiates the equivalent XLA
composition (`_attn_ref` / `_mlp_ref`), so the fused path is usable in
training too; the kernels themselves are inference-oriented (weights are
re-streamed per program).

TRAINING variants (`fused_attention_sublayer_train` /
`fused_mlp_sublayer_train` / `fused_swiglu_sublayer_train`) share residuals
instead of recomputing: the forward kernel additionally writes the
intermediates the pullback needs (qkv, pre-proj concat, pre-activation
hidden), and the forward is never re-run in any backward (round-1 VERDICT
#3: the re-running VJPs made training fall back to the unfused path). The
attention and MLP backwards run as fused Pallas kernels that recompute the
softmax in VMEM and accumulate weight/LN grads in f32 VMEM blocks across
the sequential grid; embed widths above `_PALLAS_BWD_MAX_E` use an
equivalent XLA backward instead (the accumulators outgrow VMEM). The
SwiGLU backward is pure XLA over the saved intermediates (its gate
recomputation is elementwise — there is no cross-token accumulation for a
Pallas kernel to win on). LN statistics are recomputed in the backward
from x (two cheap VPU reductions) rather than saved.

Constraints: S <= 512 (whole sequence per program), no attention bias.
Explainability rides `fused_attention_sublayer[_rope]_with_row` — the
last block emits the per-head CLS softmax row in-VMEM, so saliency never
materialises [S, S] probability matrices (full-matrix rollout modes use
the unfused flax modules).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mst_tpu.ops.attention import _on_tpu


# ---------------------------------------------------------------------------
# Reference (XLA) compositions — ground truth + backward rules
# ---------------------------------------------------------------------------


def _ln(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias)


def _attn_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls, num_heads,
              eps=1e-6):
    N, S, E = x.shape
    hd = E // num_heads
    h = _ln(x, ln_s, ln_b, eps).astype(x.dtype)
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


def _attn_rope_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls, cos, sin,
                   num_heads, eps=1e-6):
    """XLA composition of the RoPE attention sublayer (ground truth for the
    Pallas kernel + its backward rule). cos/sin: [S, hd] interleaved-pair
    convention (`ops.rotary.rope_2d_angles`)."""
    N, S, E = x.shape
    hd = E // num_heads
    h = _ln(x, ln_s, ln_b, eps).astype(x.dtype)
    qkv = h @ wqkv.astype(x.dtype) + bqkv.astype(x.dtype)
    qkv = qkv.reshape(N, S, 3, num_heads, hd)
    q, k, v = (jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3))

    def rot(t):  # interleaved pairs: (a, b) -> (-b, a)
        tf = t.astype(jnp.float32).reshape(*t.shape[:-1], hd // 2, 2)
        tr = jnp.stack([-tf[..., 1], tf[..., 0]], axis=-1)
        return tr.reshape(*t.shape[:-1], hd)

    q = (q.astype(jnp.float32) * cos + rot(q) * sin).astype(x.dtype)
    k = (k.astype(jnp.float32) * cos + rot(k) * sin).astype(x.dtype)
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


def _mlp_ref(x, ln_s, ln_b, w1, b1, w2, b2, ls, approximate, eps=1e-6):
    h = _ln(x, ln_s, ln_b, eps).astype(x.dtype)
    h = h @ w1.astype(x.dtype) + b1.astype(x.dtype)
    h = jax.nn.gelu(h, approximate=approximate)
    h = h @ w2.astype(x.dtype) + b2.astype(x.dtype)
    if ls is not None:
        h = h * ls.astype(x.dtype)
    return x + h


def _swiglu_ref(x, ln_s, ln_b, w12, b12, w3, b3, ls, eps=1e-6):
    h = _ln(x, ln_s, ln_b, eps).astype(x.dtype)
    h12 = h @ w12.astype(x.dtype) + b12.astype(x.dtype)
    h1, h2 = jnp.split(h12, 2, axis=-1)
    y = (jax.nn.silu(h1) * h2) @ w3.astype(x.dtype) + b3.astype(x.dtype)
    if ls is not None:
        y = y * ls.astype(x.dtype)
    return x + y


# ---------------------------------------------------------------------------
# Kernels (grid over the N slice images; whole [S, E] in VMEM)
# ---------------------------------------------------------------------------

_LOG2E = math.log2(math.e)


def _erf_as(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7): Mosaic has
    no erf/erfc lowering, so the EXACT-GELU kernels (gelu_approximate=False,
    the torch-default GELU a converted reference checkpoint reproduces)
    need a polynomial path. 1.5e-7 is ~4 decades below bf16 resolution and
    ~2 below the f32 parity tolerances."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.where(x >= 0.0, 1.0, -1.0)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x, approximate: bool):
    """In-kernel GELU: tanh approximation lowers natively; exact GELU uses
    the A&S erf polynomial on TPU (interpret mode keeps jax.nn.gelu so CPU
    tests stay bit-aligned with the XLA reference)."""
    if approximate or not _on_tpu():
        return jax.nn.gelu(x, approximate=approximate)
    xf = x.astype(jnp.float32)
    y = xf * 0.5 * (1.0 + _erf_as(xf * (1.0 / math.sqrt(2.0))))
    return y.astype(x.dtype)


def _pick_block(N: int, S: int, E: int, max_elems: int = 1_100_000,
                cap: int = 8) -> int:
    """Slices per program for the multi-slice ("weight-stationary") fused
    kernels: the largest k in {8,4,2,1} dividing N whose [k*S, E] activation
    block stays within a VMEM-friendly element budget. Packing k slices
    flattens the token-wise matmuls to M = k*S rows, retiring the
    257->272 sublane padding (bf16 tiles are 16 rows) and amortising
    per-program launch/pipeline overhead. k=1 reproduces the single-slice
    kernels bit-for-bit.

    `cap` bounds the pick per sub-layer KIND: the token-wise MLP/SwiGLU
    programs keep the full packing, but ATTENTION programs pass cap=1 —
    packing measured **-25%** on the serving attention sub-layer at ViT-S
    shapes (10.32 -> 8.27 ms for 12 layers at N=128, round-3
    MST_FUSED_BLOCK_N A/B of tools/bench_sublayer_parts.py): the K-packed
    per-head scores/context working set evicts the pipeline's double
    buffers, same mechanism that pinned the train kernels at block 1. The
    env override still wins for A/B."""
    import os

    force = os.environ.get("MST_FUSED_BLOCK_N")  # perf A/B override
    if force:
        try:
            k = int(force)
        except ValueError:
            k = 0
        if k >= 1 and N % k == 0:
            return k
        # invalid/non-dividing override: fall through to the automatic pick
    for k in (8, 4, 2, 1):
        if k <= cap and N % k == 0 and k * S * E <= max_elems:
            return k
    return 1


def _mhsa(qkv, E, hd, num_heads, cd, rope=None, want_row=False, S=None,
          carry_row=None, want_abnar=False, want_lse=False):
    """Per-head softmax attention over a packed [K*S, 3E] qkv block of K
    independent slice images (`S` tokens each; S=None means one slice).
    `want_row=True` additionally returns the CLS (query 0) softmax row per
    head, [K, heads, S] f32 — the only attention the saliency maps consume
    (`ops/saliency.plane_attention`), so the fused serving path never
    materialises the [S, S] probability matrices.

    `carry_row` ([K, heads, S] f32) threads the attention-rollout chain
    IN-VMEM: the reference's `get_attention_cls` product
    A_0 @ A_1 @ ... @ A_{L-1} is only ever read at its CLS row
    (`ops/saliency.attention_cls_rollout` -> `plane_attention`), and
    row(P) = ((e_0^T A_0) A_1) ... evaluates left-to-right in FORWARD
    layer order — so each layer updates r_new = r @ A_i while A_i is
    resident, and the [S, S] matrices never reach HBM (the flax rollout
    sows 12 x [N, heads, S, S] f32). The update runs as a
    broadcast-multiply + column-reduce, not an M=1 matmul (an M=1 MXU op
    is a measured worst case — tools/bench_attn_split_cls.py). Returns
    (out[, rows], new_carry).

    Softmax economics (measured, v5e — the attention sublayer ran at 66
    TFLOP/s vs the MLP's 140 with the naive form): log2(e) folds into the
    softmax scale so the exponential is a bare exp2 (removes a [S, S]
    multiply pass), and the normalising division moves to the [S, hd]
    output instead of the [S, S] probability matrix (~6x fewer divides).

    `rope=(cos, sin, pmat)` applies interleaved-pair RoPE to q and k
    ([S, hd] f32 cos/sin; prefix-token rows carry cos=1/sin=0). The pair
    swap (x[2j], x[2j+1]) -> (-x[2j+1], x[2j]) runs as a matmul with the
    constant block-diagonal `pmat` [hd, hd] — an MXU-friendly formulation
    (a strided lane shuffle would be a VPU worst case).

    `want_abnar=True` additionally returns this layer's Abnar & Zuidema
    rollout factor per slice, [K, S, S] f32: head-MEAN of the softmax
    probabilities + full identity, row-normalised (`ops/saliency.
    attention_rollout`). The Abnar product multiplies NEWEST-layer-first
    (A_{L-1} @ ... @ A_0), so unlike the reference chain it cannot thread
    a forward carry row — the factors are emitted (12x smaller than the
    flax path's per-head sows) and chained in XLA.

    `want_lse=True` additionally returns the per-row softmax log-sum-exp
    in base 2, b = m + log2(l), as [K, S, heads] f32 (S in sublanes —
    the layout both the emitting fwd and the consuming bwd kernel use
    without a transpose). The train backward reconstructs the normalised
    probabilities in ONE fused VPU pass, p = exp2(s - b), instead of the
    max / exp2 / sum / normalise recompute (4 passes over [S, S] per
    head).
    """
    scale = 1.0 / math.sqrt(hd) * _LOG2E
    T = qkv.shape[0]
    S = T if S is None else S
    K = T // S
    outs, rows, carries, abnars, lses = [], [], [], [], []
    for sl in range(K):
        lo = sl * S
        souts, srows, scarries, sbs = [], [], [], []
        ab = None
        for i in range(num_heads):
            q = qkv[lo:lo + S, i * hd:(i + 1) * hd]
            k = qkv[lo:lo + S, E + i * hd: E + (i + 1) * hd]
            v = qkv[lo:lo + S, 2 * E + i * hd: 2 * E + (i + 1) * hd]
            if rope is not None:
                cos, sin, pmat = rope
                qr = jax.lax.dot_general(
                    q, pmat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                q = (q.astype(jnp.float32) * cos + qr * sin).astype(cd)
                kr = jax.lax.dot_general(
                    k, pmat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                k = (k.astype(jnp.float32) * cos + kr * sin).astype(cd)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            ) * scale
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(cd), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / l
            souts.append(o.astype(cd))
            if want_lse:
                sbs.append(m + jnp.log2(l))  # [S, 1] f32
            if want_row:
                srows.append(p[:1] / l[:1])  # CLS softmax row [1, S], f32
            if want_abnar:
                pn = p / l  # normalised probs [S, S] f32
                ab = pn if ab is None else ab + pn
            if carry_row is not None:
                # r_new[j] = sum_i r[i] * softmax(p)[i, j]: fold the row
                # normaliser into r, then multiply-reduce over rows.
                r = carry_row[sl, i] * (1.0 / l[:, 0])  # [S]
                scarries.append(jnp.sum(r[:, None] * p, axis=0))  # [S]
        outs.append(jnp.concatenate(souts, axis=-1))  # [S, E]
        if want_lse:
            lses.append(jnp.concatenate(sbs, axis=1))  # [S, heads]
        if want_row:
            rows.append(jnp.concatenate(srows, axis=0))  # [heads, S]
        if want_abnar:
            a = ab * (1.0 / num_heads) + jnp.eye(S, dtype=jnp.float32)
            abnars.append(a / jnp.sum(a, axis=-1, keepdims=True))
        if carry_row is not None:
            carries.append(jnp.stack(scarries, axis=0))  # [heads, S]
    out = jnp.concatenate(outs, axis=0)  # [K*S, E]
    ret = (out,)
    if want_row:
        ret += (jnp.stack(rows, axis=0),)  # [K, heads, S]
    if want_abnar:
        ret += (jnp.stack(abnars, axis=0),)  # [K, S, S]
    if want_lse:
        ret += (jnp.stack(lses, axis=0),)  # [K, S, heads]
    if carry_row is not None:
        ret += (jnp.stack(carries, axis=0),)  # [K, heads, S]
    return ret if len(ret) > 1 else out


def _attn_any_kernel(*refs, num_heads: int, has_ls: bool, eps: float,
                     has_rope: bool, want_row: bool, carry: bool = False,
                     abnar: bool = False):
    """The serving attention sub-layer kernel, one body for all its
    variants (plain / RoPE / CLS-row / rollout-carry / Abnar-factor —
    static flags pick the ref layout and outputs): y = x + ls *
    proj(MHSA([RoPE](LN(x)))), optionally emitting the per-head CLS
    softmax row [heads, S] (f32) for the explainability path, the Abnar
    rollout factor [S, S] (f32), and/or updating the in-VMEM rollout
    carry row (see `_mhsa`). RoPE angles from `ops.rotary.rope_2d_angles`;
    the pair swap runs as a matmul with the constant block-diagonal
    `pmat`."""
    idx = 1
    x_ref = refs[0]
    carry_ref = None
    if carry:
        carry_ref = refs[1]
        idx = 2
    (lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
     ls_ref) = refs[idx:idx + 7]
    idx += 7
    rope = None
    if has_rope:
        cos_ref, sin_ref, pmat_ref = refs[idx:idx + 3]
        idx += 3
        rope = (cos_ref[:], sin_ref[:], pmat_ref[:])
    out_refs = refs[idx:]
    K, S, E = x_ref.shape  # K slice images per program (_pick_block)
    x = x_ref[:].reshape(K * S, E)
    hd = E // num_heads
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + eps)
         * lns_ref[0] + lnb_ref[0]).astype(x.dtype)
    qkv = jax.lax.dot_general(
        h, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[0]
    qkv = qkv.astype(x.dtype)  # [K*S, 3E]
    out = _mhsa(qkv, E, hd, num_heads, x.dtype, rope=rope, want_row=want_row,
                S=S, carry_row=carry_ref[:] if carry else None,
                want_abnar=abnar)
    new_carry = rows = amat = None
    rest = list(out[1:]) if isinstance(out, tuple) else []
    o = out[0] if isinstance(out, tuple) else out
    if want_row:
        rows = rest.pop(0)
    if abnar:
        amat = rest.pop(0)
    if carry:
        new_carry = rest.pop(0)
    y = jax.lax.dot_general(
        o, wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[0]
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


_attn_rope_kernel = functools.partial(_attn_any_kernel, has_rope=True,
                                      want_row=False)


def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                ls_ref, o_ref, *, approximate: bool, has_ls: bool,
                eps: float = 1e-6):
    K, S, E = x_ref.shape
    x = x_ref[:].reshape(K * S, E)  # token-wise op: flatten the K slices
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + eps)
         * lns_ref[0] + lnb_ref[0]).astype(x.dtype)
    h = jax.lax.dot_general(
        h, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0]
    h = _gelu(h, approximate).astype(x.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0]
    if has_ls:
        y = y * ls_ref[0]
    o_ref[:] = (xf + y).astype(o_ref.dtype).reshape(K, S, E)


def _attn_train_kernel(*refs, num_heads: int, has_ls: bool,
                       eps: float = 1e-6, has_rope: bool = False):
    """Forward + residual outputs for the attention sublayer backward:
    qkv [S,3E] (PRE-rope), the pre-proj concat o [S,E], and the softmax
    log-sum-exp rows b [S,heads] f32 (base 2, max folded in). Attention
    probs are NOT saved — the backward kernel reconstructs the normalised
    softmax from the saved b in one fused exp2 pass, p = exp2(s - b),
    avoiding an [H,S,S] HBM round trip per layer AND the 4-pass
    max/exp2/sum/normalise recompute (b costs S*heads f32 ≈ 6 KB/slice).
    `has_rope` adds cos/sin/pmat operands (the DINOv3 train sub-layer)."""
    if has_rope:
        (x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
         ls_ref, cos_ref, sin_ref, pmat_ref, y_ref, qkv_ref, o_ref,
         b_ref) = refs
        rope = (cos_ref[:], sin_ref[:], pmat_ref[:])
    else:
        (x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
         ls_ref, y_ref, qkv_ref, o_ref, b_ref) = refs
        rope = None
    K, S, E = x_ref.shape
    x = x_ref[:].reshape(K * S, E)
    hd = E // num_heads
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + eps)
         * lns_ref[0] + lnb_ref[0]).astype(x.dtype)
    qkv = jax.lax.dot_general(
        h, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[0]
    qkv = qkv.astype(x.dtype)
    qkv_ref[:] = qkv.reshape(K, S, 3 * E)
    o, b = _mhsa(qkv, E, hd, num_heads, x.dtype, S=S, rope=rope,
                 want_lse=True)
    o_ref[:] = o.reshape(K, S, E)
    b_ref[:] = b  # [K, S, heads] f32
    y = jax.lax.dot_general(
        o, wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[0]
    if has_ls:
        y = y * ls_ref[0]
    y_ref[:] = (xf + y).astype(y_ref.dtype).reshape(K, S, E)


def _mlp_train_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, ls_ref, y_ref, a_ref, *, approximate: bool,
                      has_ls: bool, eps: float = 1e-6):
    """Forward + residual output for the MLP backward: pre-activation
    hidden a [S, F]."""
    K, S, E = x_ref.shape
    x = x_ref[:].reshape(K * S, E)
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + eps)
         * lns_ref[0] + lnb_ref[0]).astype(x.dtype)
    a = jax.lax.dot_general(
        h, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0]
    a = a.astype(x.dtype)
    a_ref[:] = a.reshape(K, S, -1)
    u = _gelu(a, approximate).astype(x.dtype)
    y = jax.lax.dot_general(
        u, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0]
    if has_ls:
        y = y * ls_ref[0]
    y_ref[:] = (xf + y).astype(y_ref.dtype).reshape(K, S, E)


def _swiglu_train_kernel(x_ref, lns_ref, lnb_ref, w12_ref, b12_ref, w3_ref,
                         b3_ref, ls_ref, y_ref, h12_ref, *, has_ls: bool,
                         eps: float = 1e-6):
    """Forward + residual output for the SwiGLU backward: pre-gate hidden
    h12 [S, 2F]."""
    K, S, E = x_ref.shape
    x = x_ref[:].reshape(K * S, E)
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + eps)
         * lns_ref[0] + lnb_ref[0]).astype(x.dtype)
    h12 = jax.lax.dot_general(
        h, w12_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b12_ref[0]
    h12 = h12.astype(x.dtype)
    h12_ref[:] = h12.reshape(K, S, -1)
    # gate from the SAVED (rounded) h12, upcast to f32: bit-consistent with
    # the backward's recompute, and Mosaic's logistic lowering rejects bf16
    # operands (f32 constant broadcast into a bf16 vector fails the
    # verifier — found compiling the giant2 UNFROZEN remat step)
    h12f = h12.astype(jnp.float32)
    hidden = h12f.shape[-1] // 2
    h1 = h12f[:, :hidden]
    h2 = h12f[:, hidden:]
    g = (h1 * jax.nn.sigmoid(h1) * h2).astype(x.dtype)
    y = jax.lax.dot_general(
        g, w3_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b3_ref[0]
    if has_ls:
        y = y * ls_ref[0]
    y_ref[:] = (xf + y).astype(y_ref.dtype).reshape(K, S, E)


def _swiglu_kernel(x_ref, lns_ref, lnb_ref, w12_ref, b12_ref, w3_ref, b3_ref,
                   ls_ref, o_ref, *, has_ls: bool, eps: float = 1e-6):
    K, S, E = x_ref.shape
    x = x_ref[:].reshape(K * S, E)  # token-wise op: flatten the K slices
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + eps)
         * lns_ref[0] + lnb_ref[0]).astype(x.dtype)
    h12 = jax.lax.dot_general(
        h, w12_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b12_ref[0]
    hidden = h12.shape[-1] // 2
    h1 = h12[:, :hidden]
    h2 = h12[:, hidden:]
    g = (h1 * jax.nn.sigmoid(h1) * h2).astype(x.dtype)
    y = jax.lax.dot_general(
        g, w3_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b3_ref[0]
    if has_ls:
        y = y * ls_ref[0]
    o_ref[:] = (xf + y).astype(o_ref.dtype).reshape(K, S, E)


def _vec(x):
    return jnp.asarray(x, jnp.float32).reshape(1, -1)


# Whole-sequence programs with resident weights want more than the default
# 16 MiB scoped-VMEM budget (giant2's qkv matmul alone holds an 18 MiB
# working set); v5e has 128 MiB of VMEM per core.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _call_fused(kernel, x, operands, block_n: int = 1, **kw):
    """Common pallas_call plumbing: x [N,S,E]; operands are grid-invariant
    VMEM-resident params ([1,dim] fp32 vectors or full weight matrices).
    `block_n` slices feed each program (see `_pick_block`); kernels see
    (block_n, S, E) blocks."""
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
        **kw,
    )(*args)


def _call_fused_multi(kernel, x, operands, out_shapes, out_dtypes=None,
                      block_n: int = 1, grid_inputs=(), **kw):
    """Like `_call_fused` but with multiple grid-mapped outputs.

    out_shapes: list of per-slice shapes (without the leading grid dim);
    output i has global shape (N, *out_shapes[i]) and block
    (block_n, *shape). out_dtypes: optional per-output dtypes (default:
    x.dtype). `grid_inputs`: additional [N, *]-leading arrays blocked like
    x (e.g. the rollout carry row), placed directly after x in the kernel
    ref order."""
    N = x.shape[0]
    in_specs = [pl.BlockSpec((block_n, *x.shape[1:]),
                             lambda n: (n,) + (0,) * (x.ndim - 1),
                             memory_space=pltpu.VMEM)]
    args = [x]
    for t in grid_inputs:
        in_specs.append(pl.BlockSpec(
            (block_n, *t.shape[1:]),
            lambda n, _nd=t.ndim - 1: (n,) + (0,) * _nd,
            memory_space=pltpu.VMEM))
        args.append(t)
    for item in operands:
        in_specs.append(pl.BlockSpec(item.shape, lambda n: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(item)
    if out_dtypes is None:
        out_dtypes = [x.dtype] * len(out_shapes)
    out_specs, out_shape = [], []
    for shp, dt in zip(out_shapes, out_dtypes):
        nd = len(shp)
        out_specs.append(pl.BlockSpec(
            (block_n, *shp), (lambda n, _nd=nd: (n,) + (0,) * _nd),
            memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((N, *shp), dt))
    return pl.pallas_call(
        kernel,
        grid=(N // block_n,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=not _on_tpu(),
        compiler_params=_COMPILER_PARAMS,
        **kw,
    )(*args)


def _ln_recompute(x, ln_s, eps=1e-6):
    """Recompute LN statistics from x (backward; cheaper than saving
    lane-padded per-row stats from the kernel)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    return xhat, rstd


def _ln_bwd(dh, xhat, rstd, ln_s):
    """Pullback through h = xhat * ln_s + ln_b -> (dx, dln_s, dln_b)."""
    dh = dh.astype(jnp.float32)
    dln_s = (dh * xhat).sum((0, 1))
    dln_b = dh.sum((0, 1))
    dxhat = dh * ln_s.astype(jnp.float32)
    m1 = dxhat.mean(-1, keepdims=True)
    m2 = (dxhat * xhat).mean(-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    return dx, dln_s, dln_b


def _heads(t, num_heads):
    """[N, S, E] -> [N, H, S, hd]"""
    N, S, E = t.shape
    return jnp.moveaxis(t.reshape(N, S, num_heads, E // num_heads), 1, 2)


# ---------------------------------------------------------------------------
# Fused backward kernels (training). One program per slice image; the
# weight/bias/LN grads accumulate in f32 VMEM blocks across the sequential
# grid (constant index_map: initialised at program 0, written back once at
# the end). dx streams out grid-mapped. Everything the flax backward would
# bounce through HBM (softmax probs, LN intermediates, dqkv) stays in VMEM.
# ---------------------------------------------------------------------------


def _attn_bwd_kernel(*refs, num_heads: int, has_ls: bool,
                     eps: float = 1e-6, has_rope: bool = False,
                     use_lse: bool = True):
    """Fused attention-sublayer backward. With `use_lse` (default) the
    normalised softmax is reconstructed from the saved log-sum-exp rows in
    ONE fused VPU pass, p = exp2(s - b), and the softmax-Jacobian row term
    sum_k dp*p collapses to the [S, hd] row-dot delta = do_h . o_h (since
    dp = do_h v^T and o_h = p v, sum_k dp[q,k] p[q,k] = do_h[q] . o_h[q]);
    vs the r3 recompute (max / exp2 / sum / normalise + a [S, S]
    mul+reduce) this removes ~5 of 6 non-matmul [S, S] passes per head.
    `use_lse=False` keeps the full recompute for A/B
    (MST_ATTN_BWD=recompute)."""
    if has_rope:
        (g_ref, x_ref, qkv_ref, o_ref, b_ref, lns_ref, lnb_ref,
         wqkv_ref, wproj_ref, bproj_ref, ls_ref, cos_ref, sin_ref, pmat_ref,
         dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
         dlns_ref, dlnb_ref, dls_ref) = refs
        rope = (cos_ref[:], sin_ref[:], pmat_ref[:])
    else:
        (g_ref, x_ref, qkv_ref, o_ref, b_ref, lns_ref, lnb_ref,
         wqkv_ref, wproj_ref, bproj_ref, ls_ref,
         dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
         dlns_ref, dlnb_ref, dls_ref) = refs
        rope = None
    n = pl.program_id(0)

    @pl.when(n == 0)
    def _init():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[:] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[:] = jnp.zeros_like(dbproj_ref)
        dlns_ref[:] = jnp.zeros_like(dlns_ref)
        dlnb_ref[:] = jnp.zeros_like(dlnb_ref)
        dls_ref[:] = jnp.zeros_like(dls_ref)

    K, S, E = x_ref.shape
    g = g_ref[:].reshape(K * S, E)
    x = x_ref[:].reshape(K * S, E)
    qkv = qkv_ref[:].reshape(K * S, 3 * E)
    o = o_ref[:].reshape(K * S, E)
    b_all = b_ref[:]  # [K, S, heads] f32
    hd = E // num_heads
    scale = 1.0 / math.sqrt(hd)
    cd = x.dtype
    gf = g.astype(jnp.float32)

    if has_ls:
        z = jax.lax.dot_general(
            o, wproj_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bproj_ref[0]
        dls_ref[:] += jnp.sum(gf * z, axis=0, keepdims=True)
        gz = (g.astype(jnp.float32) * ls_ref[0]).astype(cd)
    else:
        gz = g

    dwproj_ref[:] += jax.lax.dot_general(
        o, gz, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbproj_ref[:] += jnp.sum(gz.astype(jnp.float32), axis=0, keepdims=True)
    do = jax.lax.dot_general(
        gz, wproj_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cd)  # [S, E]

    slice_dqkv = []
    for sl in range(K):
        lo = sl * S
        dqs, dks, dvs = [], [], []
        for i in range(num_heads):
            q = qkv[lo:lo + S, i * hd:(i + 1) * hd]
            k = qkv[lo:lo + S, E + i * hd: E + (i + 1) * hd]
            v = qkv[lo:lo + S, 2 * E + i * hd: 2 * E + (i + 1) * hd]
            do_h = do[lo:lo + S, i * hd:(i + 1) * hd]
            if rope is not None:
                # rope is linear: q_r = q*cos + (q@P)*sin (P the pair-swap
                # matrix, P^T = -P). Recompute rotated q/k for the softmax,
                # rotate dq_r/dk_r back below.
                cos, sin, pmat = rope
                qr = jax.lax.dot_general(
                    q, pmat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                q = (q.astype(jnp.float32) * cos + qr * sin).astype(cd)
                kr = jax.lax.dot_general(
                    k, pmat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                k = (k.astype(jnp.float32) * cos + kr * sin).astype(cd)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            ) * (scale * _LOG2E)
            if use_lse:
                # One fused pass: normalised probs straight from the saved
                # log-sum-exp rows (max + log2(l) folded into b).
                p = jnp.exp2(s - b_all[sl, :, i:i + 1])
            else:
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s - m)
                # The row normaliser can't fold out of BOTH backward matmuls
                # (it varies along dv's contraction axis), so normalise p
                # here — but as a reciprocal multiply, with exp already in
                # exp2 form.
                p = p * (1.0 / jnp.sum(p, axis=-1, keepdims=True))
            p_c = p.astype(cd)
            dvs.append(jax.lax.dot_general(
                p_c, do_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(cd))
            dp = jax.lax.dot_general(
                do_h, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if use_lse:
                # sum_k dp*p == row-dot(do_h, o_h): a [S, hd] reduce instead
                # of a [S, S] mul+reduce pass.
                o_h = o[lo:lo + S, i * hd:(i + 1) * hd]
                delta = jnp.sum(do_h.astype(jnp.float32)
                                * o_h.astype(jnp.float32),
                                axis=-1, keepdims=True)
            else:
                delta = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = ((dp - delta) * p * scale).astype(cd)
            dq_h = jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk_h = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if rope is not None:
                # d/dq of q_r = q*cos + (q@P)*sin: dq = dq_r*cos +
                # (dq_r*sin)@P^T = dq_r*cos - (dq_r*sin)@P
                dq_h = dq_h * cos - jax.lax.dot_general(
                    (dq_h * sin).astype(cd), pmat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dk_h = dk_h * cos - jax.lax.dot_general(
                    (dk_h * sin).astype(cd), pmat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            dqs.append(dq_h.astype(cd))
            dks.append(dk_h.astype(cd))
        slice_dqkv.append(jnp.concatenate(dqs + dks + dvs, axis=-1))
    dqkv = jnp.concatenate(slice_dqkv, axis=0)  # [K*S, 3E]
    dbqkv_ref[:] += jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)

    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    h = (xhat * lns_ref[0] + lnb_ref[0]).astype(cd)
    dwqkv_ref[:] += jax.lax.dot_general(
        h, dqkv, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dh = jax.lax.dot_general(
        dqkv, wqkv_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dlns_ref[:] += jnp.sum(dh * xhat, axis=0, keepdims=True)
    dlnb_ref[:] += jnp.sum(dh, axis=0, keepdims=True)
    dxhat = dh * lns_ref[0]
    m1 = dxhat.mean(-1, keepdims=True)
    m2 = (dxhat * xhat).mean(-1, keepdims=True)
    dx_ref[:] = (rstd * (dxhat - m1 - xhat * m2)
                 + gf).astype(dx_ref.dtype).reshape(K, S, E)


def _mlp_bwd_kernel(g_ref, x_ref, a_ref, lns_ref, lnb_ref, w1_ref, w2_ref,
                    b2_ref, ls_ref,
                    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                    dlns_ref, dlnb_ref, dls_ref,
                    *, approximate: bool, has_ls: bool, eps: float = 1e-6):
    n = pl.program_id(0)

    @pl.when(n == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dlns_ref[:] = jnp.zeros_like(dlns_ref)
        dlnb_ref[:] = jnp.zeros_like(dlnb_ref)
        dls_ref[:] = jnp.zeros_like(dls_ref)

    K, S, E = x_ref.shape
    g = g_ref[:].reshape(K * S, E)
    x = x_ref[:].reshape(K * S, E)
    a = a_ref[:].reshape(K * S, -1).astype(jnp.float32)
    cd = x.dtype
    gf = g.astype(jnp.float32)

    gelu = functools.partial(_gelu, approximate=approximate)
    u, dgelu = jax.jvp(gelu, (a,), (jnp.ones_like(a),))
    u_c = u.astype(cd)
    if has_ls:
        z = jax.lax.dot_general(
            u_c, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[0]
        dls_ref[:] += jnp.sum(gf * z, axis=0, keepdims=True)
        gz = (gf * ls_ref[0]).astype(cd)
    else:
        gz = g

    dw2_ref[:] += jax.lax.dot_general(
        u_c, gz, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(gz.astype(jnp.float32), axis=0, keepdims=True)
    du = jax.lax.dot_general(
        gz, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    da = (du * dgelu).astype(cd)
    db1_ref[:] += jnp.sum(da.astype(jnp.float32), axis=0, keepdims=True)

    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    h = (xhat * lns_ref[0] + lnb_ref[0]).astype(cd)
    dw1_ref[:] += jax.lax.dot_general(
        h, da, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dh = jax.lax.dot_general(
        da, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dlns_ref[:] += jnp.sum(dh * xhat, axis=0, keepdims=True)
    dlnb_ref[:] += jnp.sum(dh, axis=0, keepdims=True)
    dxhat = dh * lns_ref[0]
    m1 = dxhat.mean(-1, keepdims=True)
    m2 = (dxhat * xhat).mean(-1, keepdims=True)
    dx_ref[:] = (rstd * (dxhat - m1 - xhat * m2)
                 + gf).astype(dx_ref.dtype).reshape(K, S, E)


def _call_fused_bwd(kernel, g, grid_inputs, operands, accum_shapes,
                    block_n: int = 1):
    """Backward pallas_call: g + grid_inputs are [N, S, *]-blocked (block_n
    slices per program — see `_pick_block`); operands are grid-invariant;
    outputs are (dx [like g's block], *accumulators [shape, f32, constant
    index])."""
    N = g.shape[0]
    args, in_specs = [], []
    for t in (g, *grid_inputs):
        in_specs.append(pl.BlockSpec((block_n, *t.shape[1:]),
                                     lambda n, _nd=t.ndim - 1: (n,) + (0,) * _nd,
                                     memory_space=pltpu.VMEM))
        args.append(t)
    for item in operands:
        in_specs.append(pl.BlockSpec(item.shape, lambda n: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(item)
    out_specs = [pl.BlockSpec((block_n, *g.shape[1:]),
                              lambda n: (n,) + (0,) * (g.ndim - 1),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct(g.shape, g.dtype)]
    for shp in accum_shapes:
        nd = len(shp)
        out_specs.append(pl.BlockSpec(shp, (lambda n, _nd=nd: (0,) * _nd),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(shp, jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(N // block_n,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=not _on_tpu(),
        compiler_params=_COMPILER_PARAMS,
    )(*args)


# Above this embed width the f32 weight-grad accumulators + resident
# weights outgrow the VMEM budget; fall back to the XLA backward.
_PALLAS_BWD_MAX_E = 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_attention_sublayer_train(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                                   ls, num_heads, eps=1e-6):
    """y = x + ls * proj(MHSA(LN(x))) — training variant whose backward
    consumes saved residuals instead of re-running the forward."""
    y, *_ = _attn_train_fwd_impl(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                                 ls, num_heads, eps)
    return y


def _attn_train_fwd_impl(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls,
                         num_heads, eps=1e-6, rope=None):
    N, S, E = x.shape
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, E), jnp.float32)
    operands = [_vec(ln_s), _vec(ln_b), jnp.asarray(wqkv, x.dtype),
                _vec(bqkv), jnp.asarray(wproj, x.dtype), _vec(bproj), ls_arg]
    if rope is not None:
        cos, sin = rope
        pmat = jnp.asarray(_pair_swap_matrix(E // num_heads), x.dtype)
        operands += [jnp.asarray(cos, jnp.float32),
                     jnp.asarray(sin, jnp.float32), pmat]
    y, qkv, o, b = _call_fused_multi(
        functools.partial(_attn_train_kernel, num_heads=num_heads,
                          has_ls=has_ls, eps=eps,
                          has_rope=rope is not None),
        x,
        operands,
        out_shapes=[(S, E), (S, 3 * E), (S, E), (S, num_heads)],
        out_dtypes=[x.dtype, x.dtype, x.dtype, jnp.float32],
        block_n=1,  # packing measured -6% on the train step (r3 A/B)
    )
    return y, qkv, o, b


def _attn_train_fwd(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls, num_heads,
                    eps):
    y, qkv, o, b = _attn_train_fwd_impl(x, ln_s, ln_b, wqkv, bqkv, wproj,
                                        bproj, ls, num_heads, eps)
    return y, (x, qkv, o, b, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls)


def _cast_like(val, like):
    return None if like is None else val.astype(
        jnp.asarray(like).dtype).reshape(jnp.shape(like))


def _attn_train_bwd(num_heads, eps, res, g):
    x = res[0]
    N, S, E = x.shape
    if E <= _PALLAS_BWD_MAX_E:
        return _attn_train_bwd_pallas(num_heads, res, g, eps=eps)
    return _attn_train_bwd_xla(num_heads, res, g, eps=eps)


def _attn_train_bwd_pallas(num_heads, res, g, eps=1e-6, rope=None):
    """Fused backward: normalised softmax reconstructed in VMEM from the
    saved qkv + log-sum-exp rows (one exp2 pass; MST_ATTN_BWD=recompute
    forces the r3 4-pass recompute for A/B — read at TRACE time, so set it
    before the process's first backward compile; toggling later hits the
    jit cache and is ignored), weight grads accumulated in
    VMEM f32 across the grid — no [H,S,S] HBM round trips (those made the
    first XLA backward SLOWER than the flax path: 41.4 vs 44.5 vol/s
    measured)."""
    import os

    x, qkv, o, b, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls = res
    N, S, E = x.shape
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, E), jnp.float32)
    operands = [_vec(ln_s), _vec(ln_b), jnp.asarray(wqkv, x.dtype),
                jnp.asarray(wproj, x.dtype), _vec(bproj), ls_arg]
    if rope is not None:
        cos, sin = rope
        pmat = jnp.asarray(_pair_swap_matrix(E // num_heads), x.dtype)
        operands += [jnp.asarray(cos, jnp.float32),
                     jnp.asarray(sin, jnp.float32), pmat]
    use_lse = os.environ.get("MST_ATTN_BWD", "lse") != "recompute"
    dx, dwqkv, dbqkv, dwproj, dbproj, dlns, dlnb, dls = _call_fused_bwd(
        functools.partial(_attn_bwd_kernel, num_heads=num_heads,
                          has_ls=has_ls, eps=eps,
                          has_rope=rope is not None, use_lse=use_lse),
        g.astype(x.dtype),
        grid_inputs=[x, qkv, o, b],
        operands=operands,
        accum_shapes=[(E, 3 * E), (1, 3 * E), (E, E), (1, E),
                      (1, E), (1, E), (1, E)],
        # packing the backward measured -6% on the end-to-end train step
        # (round-3 A/B at bs8) — the accumulators + live intermediates
        # evict the pipeline's double buffers; keep one slice per program
        block_n=1,
    )
    return (dx, _cast_like(dlns, ln_s), _cast_like(dlnb, ln_b),
            _cast_like(dwqkv, wqkv), _cast_like(dbqkv, bqkv),
            _cast_like(dwproj, wproj), _cast_like(dbproj, bproj),
            _cast_like(dls, ls) if has_ls else None)


def _attn_train_bwd_xla(num_heads, res, g, eps=1e-6):
    """XLA fallback backward for embed widths whose weight-grad
    accumulators exceed VMEM (giant-scale). Recomputes the softmax (the
    saved lse rows `b` are unused — XLA fuses its own normalisation)."""
    x, qkv, o, b, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls = res
    N, S, E = x.shape
    hd = E // num_heads
    scale = 1.0 / math.sqrt(hd)
    cd = x.dtype  # compute dtype for the big matmuls (MXU)
    g = g.astype(cd)
    f32 = jnp.float32

    if ls is not None:
        # z = proj output pre-LayerScale; one extra matmul for dls
        z = (o @ wproj.astype(cd) + bproj.astype(cd)).astype(f32)
        dls = (g.astype(f32) * z).sum((0, 1))
        gz = (g * ls.astype(cd)).astype(cd)
    else:
        dls, gz = None, g

    dwproj = jnp.einsum("nse,nsf->ef", o, gz,
                        preferred_element_type=f32)
    dbproj = gz.astype(f32).sum((0, 1))
    do = (gz @ wproj.T.astype(cd)).astype(cd)

    q, k, v = (
        _heads(qkv[:, :, i * E:(i + 1) * E], num_heads) for i in range(3)
    )
    do_h = _heads(do, num_heads)
    s = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                   preferred_element_type=f32) * scale
    pf = jax.nn.softmax(s, axis=-1)
    p_c = pf.astype(cd)
    dv = jnp.einsum("nhqk,nhqd->nhkd", p_c, do_h, preferred_element_type=f32)
    dp = jnp.einsum("nhqd,nhkd->nhqk", do_h, v, preferred_element_type=f32)
    ds = ((dp - (dp * pf).sum(-1, keepdims=True)) * pf * scale).astype(cd)
    dq = jnp.einsum("nhqk,nhkd->nhqd", ds, k, preferred_element_type=f32)
    dk = jnp.einsum("nhqk,nhqd->nhkd", ds, q, preferred_element_type=f32)

    def unheads(t):  # [N,H,S,hd] -> [N,S,E]
        return jnp.moveaxis(t.astype(cd), 1, 2).reshape(N, S, E)

    dqkv = jnp.concatenate([unheads(dq), unheads(dk), unheads(dv)], axis=-1)
    xhat, rstd = _ln_recompute(x, ln_s, eps)
    h = (xhat * ln_s.astype(f32) + ln_b.astype(f32)).astype(cd)
    dwqkv = jnp.einsum("nse,nsf->ef", h, dqkv, preferred_element_type=f32)
    dbqkv = dqkv.astype(f32).sum((0, 1))
    dh = dqkv @ wqkv.T.astype(cd)
    dx_ln, dln_s, dln_b = _ln_bwd(dh, xhat, rstd, ln_s)
    dx = (g.astype(f32) + dx_ln).astype(x.dtype)

    return (dx, _cast_like(dln_s, ln_s), _cast_like(dln_b, ln_b),
            _cast_like(dwqkv, wqkv), _cast_like(dbqkv, bqkv),
            _cast_like(dwproj, wproj), _cast_like(dbproj, bproj),
            _cast_like(dls, ls))


fused_attention_sublayer_train.defvjp(_attn_train_fwd, _attn_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_attention_sublayer_train_rope(x, ln_s, ln_b, wqkv, bqkv, wproj,
                                        bproj, ls, rope_cos, rope_sin,
                                        num_heads, eps=1e-6):
    """RoPE training variant (the DINOv3 encoder sub-layer,
    `dino.py:279-795`): same residual-sharing scheme as
    `fused_attention_sublayer_train`, with the rotation recomputed from the
    saved PRE-rope qkv in the backward and dq/dk rotated back through
    P^T = -P (rope is linear). rope_cos/rope_sin grads are not produced
    (they are precomputed constants of the patch grid)."""
    y, *_ = _attn_train_fwd_impl(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                                 ls, num_heads, eps,
                                 rope=(rope_cos, rope_sin))
    return y


def _attn_rope_train_fwd(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls,
                         rope_cos, rope_sin, num_heads, eps):
    y, qkv, o, b = _attn_train_fwd_impl(x, ln_s, ln_b, wqkv, bqkv, wproj,
                                        bproj, ls, num_heads, eps,
                                        rope=(rope_cos, rope_sin))
    return y, (x, qkv, o, b, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls,
               rope_cos, rope_sin)


def _attn_rope_train_bwd(num_heads, eps, res, g):
    (x, qkv, o, b, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls,
     rope_cos, rope_sin) = res
    N, S, E = x.shape
    core = (x, qkv, o, b, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls)
    if E <= _PALLAS_BWD_MAX_E:
        grads = _attn_train_bwd_pallas(num_heads, core, g, eps=eps,
                                       rope=(rope_cos, rope_sin))
    else:
        # giant-scale rope config: recompute-based XLA fallback (the
        # accumulators outgrow VMEM; this path re-runs the forward inside
        # vjp, acceptable at giant batch economics)
        _, vjp = jax.vjp(
            lambda *a: _attn_rope_ref(*a, num_heads=num_heads, eps=eps),
            x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls,
            rope_cos, rope_sin)
        return vjp(g)[:8] + (jnp.zeros_like(rope_cos),
                             jnp.zeros_like(rope_sin))
    return grads + (jnp.zeros_like(rope_cos), jnp.zeros_like(rope_sin))


fused_attention_sublayer_train_rope.defvjp(_attn_rope_train_fwd,
                                           _attn_rope_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_mlp_sublayer_train(x, ln_s, ln_b, w1, b1, w2, b2, ls, approximate,
                             eps=1e-6):
    y, _ = _mlp_train_fwd_impl(x, ln_s, ln_b, w1, b1, w2, b2, ls,
                               approximate, eps)
    return y


def _mlp_train_fwd_impl(x, ln_s, ln_b, w1, b1, w2, b2, ls, approximate,
                        eps=1e-6):
    N, S, E = x.shape
    F = w1.shape[-1]
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, E), jnp.float32)
    y, a = _call_fused_multi(
        functools.partial(_mlp_train_kernel, approximate=approximate,
                          has_ls=has_ls, eps=eps),
        x,
        [_vec(ln_s), _vec(ln_b), jnp.asarray(w1, x.dtype), _vec(b1),
         jnp.asarray(w2, x.dtype), _vec(b2), ls_arg],
        out_shapes=[(S, E), (S, F)],
        block_n=1,  # packing measured -6% on the train step (r3 A/B)
    )
    return y, a


def _mlp_train_fwd(x, ln_s, ln_b, w1, b1, w2, b2, ls, approximate, eps):
    y, a = _mlp_train_fwd_impl(x, ln_s, ln_b, w1, b1, w2, b2, ls,
                               approximate, eps)
    return y, (x, a, ln_s, ln_b, w1, b1, w2, b2, ls)


def _mlp_train_bwd(approximate, eps, res, g):
    x, a, ln_s, ln_b, w1, b1, w2, b2, ls = res
    if x.shape[-1] <= _PALLAS_BWD_MAX_E:
        return _mlp_train_bwd_pallas(approximate, res, g, eps=eps)
    return _mlp_train_bwd_xla(approximate, res, g, eps=eps)


def _mlp_train_bwd_pallas(approximate, res, g, eps=1e-6):
    x, a, ln_s, ln_b, w1, b1, w2, b2, ls = res
    N, S, E = x.shape
    F = w1.shape[-1]
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, E), jnp.float32)
    dx, dw1, db1, dw2, db2, dlns, dlnb, dls = _call_fused_bwd(
        functools.partial(_mlp_bwd_kernel, approximate=approximate,
                          has_ls=has_ls, eps=eps),
        g.astype(x.dtype),
        grid_inputs=[x, a],
        operands=[_vec(ln_s), _vec(ln_b), jnp.asarray(w1, x.dtype),
                  jnp.asarray(w2, x.dtype), _vec(b2), ls_arg],
        accum_shapes=[(E, F), (1, F), (F, E), (1, E), (1, E), (1, E), (1, E)],
        block_n=1,  # packing measured -6% on the train step (r3 A/B)
    )
    return (dx, _cast_like(dlns, ln_s), _cast_like(dlnb, ln_b),
            _cast_like(dw1, w1), _cast_like(db1, b1),
            _cast_like(dw2, w2), _cast_like(db2, b2),
            _cast_like(dls, ls) if has_ls else None)


def _mlp_train_bwd_xla(approximate, res, g, eps=1e-6):
    x, a, ln_s, ln_b, w1, b1, w2, b2, ls = res
    cd = x.dtype
    g = g.astype(cd)
    f32 = jnp.float32

    gelu = functools.partial(jax.nn.gelu, approximate=approximate)
    u = gelu(a.astype(f32))
    if ls is not None:
        z = (u.astype(cd) @ w2.astype(cd) + b2.astype(cd)).astype(f32)
        dls = (g.astype(f32) * z).sum((0, 1))
        gz = (g * ls.astype(cd)).astype(cd)
    else:
        dls, gz = None, g

    dw2 = jnp.einsum("nsf,nse->fe", u.astype(cd), gz,
                     preferred_element_type=f32)
    db2 = gz.astype(f32).sum((0, 1))
    du = gz @ w2.T.astype(cd)
    # exact gelu' via jvp on the scalar activation (handles both variants)
    _, dgelu = jax.jvp(gelu, (a.astype(f32),), (jnp.ones_like(a, f32),))
    da = (du.astype(f32) * dgelu).astype(cd)
    xhat, rstd = _ln_recompute(x, ln_s, eps)
    h = (xhat * ln_s.astype(f32) + ln_b.astype(f32)).astype(cd)
    dw1 = jnp.einsum("nse,nsf->ef", h, da, preferred_element_type=f32)
    db1 = da.astype(f32).sum((0, 1))
    dh = da @ w1.T.astype(cd)
    dx_ln, dln_s, dln_b = _ln_bwd(dh, xhat, rstd, ln_s)
    dx = (g.astype(f32) + dx_ln).astype(x.dtype)

    return (dx, _cast_like(dln_s, ln_s), _cast_like(dln_b, ln_b),
            _cast_like(dw1, w1), _cast_like(db1, b1), _cast_like(dw2, w2),
            _cast_like(db2, b2), _cast_like(dls, ls))


fused_mlp_sublayer_train.defvjp(_mlp_train_fwd, _mlp_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_swiglu_sublayer_train(x, ln_s, ln_b, w12, b12, w3, b3, ls,
                                eps=1e-6):
    y, _ = _swiglu_train_fwd_impl(x, ln_s, ln_b, w12, b12, w3, b3, ls, eps)
    return y


def _swiglu_train_fwd_impl(x, ln_s, ln_b, w12, b12, w3, b3, ls, eps=1e-6):
    N, S, E = x.shape
    F2 = w12.shape[-1]
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, E), jnp.float32)
    y, h12 = _call_fused_multi(
        functools.partial(_swiglu_train_kernel, has_ls=has_ls, eps=eps),
        x,
        [_vec(ln_s), _vec(ln_b), jnp.asarray(w12, x.dtype), _vec(b12),
         jnp.asarray(w3, x.dtype), _vec(b3), ls_arg],
        out_shapes=[(S, E), (S, F2)],
        block_n=1,  # packing measured -6% on the train step (r3 A/B)
    )
    return y, h12


def _swiglu_train_fwd(x, ln_s, ln_b, w12, b12, w3, b3, ls, eps):
    y, h12 = _swiglu_train_fwd_impl(x, ln_s, ln_b, w12, b12, w3, b3, ls, eps)
    return y, (x, h12, ln_s, ln_b, w12, b12, w3, b3, ls)


def _swiglu_train_bwd(eps, res, g):
    x, h12, ln_s, ln_b, w12, b12, w3, b3, ls = res
    cd = x.dtype
    g = g.astype(cd)
    f32 = jnp.float32
    hidden = h12.shape[-1] // 2
    h1 = h12[:, :, :hidden].astype(f32)
    h2 = h12[:, :, hidden:].astype(f32)
    sig = jax.nn.sigmoid(h1)
    silu = h1 * sig
    u = silu * h2
    if ls is not None:
        z = (u.astype(cd) @ w3.astype(cd) + b3.astype(cd)).astype(f32)
        dls = (g.astype(f32) * z).sum((0, 1))
        gz = (g * ls.astype(cd)).astype(cd)
    else:
        dls, gz = None, g

    dw3 = jnp.einsum("nsf,nse->fe", u.astype(cd), gz,
                     preferred_element_type=f32)
    db3 = gz.astype(f32).sum((0, 1))
    du = (gz @ w3.T.astype(cd)).astype(f32)
    dh1 = du * h2 * (sig + silu * (1.0 - sig))  # d silu(h1)/dh1 = sig+h1*sig*(1-sig)
    dh2 = du * silu
    dh12 = jnp.concatenate([dh1, dh2], axis=-1).astype(cd)
    xhat, rstd = _ln_recompute(x, ln_s, eps)
    h = (xhat * ln_s.astype(f32) + ln_b.astype(f32)).astype(cd)
    dw12 = jnp.einsum("nse,nsf->ef", h, dh12, preferred_element_type=f32)
    db12 = dh12.astype(f32).sum((0, 1))
    dh = dh12 @ w12.T.astype(cd)
    dx_ln, dln_s, dln_b = _ln_bwd(dh, xhat, rstd, ln_s)
    dx = (g.astype(f32) + dx_ln).astype(x.dtype)

    return (dx, _cast_like(dln_s, ln_s), _cast_like(dln_b, ln_b),
            _cast_like(dw12, w12), _cast_like(db12, b12),
            _cast_like(dw3, w3), _cast_like(db3, b3), _cast_like(dls, ls))


fused_swiglu_sublayer_train.defvjp(_swiglu_train_fwd, _swiglu_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_attention_sublayer(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls,
                             num_heads, eps=1e-6):
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, x.shape[-1]), jnp.float32)
    return _call_fused(
        functools.partial(_attn_any_kernel, num_heads=num_heads,
                          has_ls=has_ls, eps=eps, has_rope=False,
                          want_row=False),
        x,
        [_vec(ln_s), _vec(ln_b), jnp.asarray(wqkv, x.dtype), _vec(bqkv),
         jnp.asarray(wproj, x.dtype), _vec(bproj), ls_arg],
        block_n=_pick_block(*x.shape, cap=1),
    )


def _attn_fwd(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls, num_heads, eps):
    out = fused_attention_sublayer(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                                   ls, num_heads, eps)
    return out, (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls)


def _attn_bwd(num_heads, eps, res, g):
    x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls = res
    _, vjp = jax.vjp(
        lambda *a: _attn_ref(*a, num_heads=num_heads, eps=eps),
        x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls,
    )
    return vjp(g)


fused_attention_sublayer.defvjp(_attn_fwd, _attn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_mlp_sublayer(x, ln_s, ln_b, w1, b1, w2, b2, ls, approximate,
                       eps=1e-6):
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, x.shape[-1]), jnp.float32)
    return _call_fused(
        functools.partial(_mlp_kernel, approximate=approximate,
                          has_ls=has_ls, eps=eps),
        x,
        [_vec(ln_s), _vec(ln_b), jnp.asarray(w1, x.dtype), _vec(b1),
         jnp.asarray(w2, x.dtype), _vec(b2), ls_arg],
        block_n=_pick_block(*x.shape),
    )


def _mlp_fwd(x, ln_s, ln_b, w1, b1, w2, b2, ls, approximate, eps):
    out = fused_mlp_sublayer(x, ln_s, ln_b, w1, b1, w2, b2, ls, approximate,
                             eps)
    return out, (x, ln_s, ln_b, w1, b1, w2, b2, ls)


def _mlp_bwd(approximate, eps, res, g):
    x, ln_s, ln_b, w1, b1, w2, b2, ls = res
    _, vjp = jax.vjp(
        lambda *a: _mlp_ref(*a, approximate=approximate, eps=eps),
        x, ln_s, ln_b, w1, b1, w2, b2, ls,
    )
    return vjp(g)


fused_mlp_sublayer.defvjp(_mlp_fwd, _mlp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_swiglu_sublayer(x, ln_s, ln_b, w12, b12, w3, b3, ls, eps=1e-6):
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, x.shape[-1]), jnp.float32)
    return _call_fused(
        functools.partial(_swiglu_kernel, has_ls=has_ls, eps=eps),
        x,
        [_vec(ln_s), _vec(ln_b), jnp.asarray(w12, x.dtype), _vec(b12),
         jnp.asarray(w3, x.dtype), _vec(b3), ls_arg],
        block_n=_pick_block(*x.shape),
    )


def _swiglu_fwd(x, ln_s, ln_b, w12, b12, w3, b3, ls, eps):
    out = fused_swiglu_sublayer(x, ln_s, ln_b, w12, b12, w3, b3, ls, eps)
    return out, (x, ln_s, ln_b, w12, b12, w3, b3, ls)


def _swiglu_bwd(eps, res, g):
    x, ln_s, ln_b, w12, b12, w3, b3, ls = res
    _, vjp = jax.vjp(
        lambda *a: _swiglu_ref(*a, eps=eps),
        x, ln_s, ln_b, w12, b12, w3, b3, ls,
    )
    return vjp(g)


fused_swiglu_sublayer.defvjp(_swiglu_fwd, _swiglu_bwd)


def _pair_swap_matrix(hd: int) -> "np.ndarray":
    """Constant [hd, hd] matrix M with (x @ M)[2j] = -x[2j+1],
    (x @ M)[2j+1] = x[2j] — the interleaved rotate-pair as an MXU matmul."""
    import numpy as np

    m = np.zeros((hd, hd), np.float32)
    j = np.arange(hd // 2)
    m[2 * j + 1, 2 * j] = -1.0
    m[2 * j, 2 * j + 1] = 1.0
    return m


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_attention_sublayer_rope(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                                  ls, rope_cos, rope_sin, num_heads,
                                  eps=1e-6):
    """y = x + ls * proj(MHSA(RoPE(LN(x)))) — the DINOv3 encoder sub-layer
    (serving path; training uses the flax composition). rope_cos/rope_sin:
    [S, hd] in the interleaved-pair convention of
    `ops.rotary.rope_2d_angles` (prefix rows cos=1/sin=0)."""
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, x.shape[-1]), jnp.float32)
    hd = x.shape[-1] // num_heads
    pmat = jnp.asarray(_pair_swap_matrix(hd), x.dtype)
    return _call_fused(
        functools.partial(_attn_rope_kernel, num_heads=num_heads,
                          has_ls=has_ls, eps=eps),
        x,
        [_vec(ln_s), _vec(ln_b), jnp.asarray(wqkv, x.dtype), _vec(bqkv),
         jnp.asarray(wproj, x.dtype), _vec(bproj), ls_arg,
         jnp.asarray(rope_cos, jnp.float32), jnp.asarray(rope_sin, jnp.float32),
         pmat],
        block_n=_pick_block(*x.shape, cap=1),
    )


def _attn_rope_fwd(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls,
                   rope_cos, rope_sin, num_heads, eps):
    out = fused_attention_sublayer_rope(
        x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls, rope_cos, rope_sin,
        num_heads, eps)
    return out, (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls,
                 rope_cos, rope_sin)


def _attn_rope_bwd(num_heads, eps, res, g):
    x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls, rope_cos, rope_sin = res
    _, vjp = jax.vjp(
        lambda *a: _attn_rope_ref(*a, num_heads=num_heads, eps=eps),
        x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls, rope_cos, rope_sin,
    )
    return vjp(g)


fused_attention_sublayer_rope.defvjp(_attn_rope_fwd, _attn_rope_bwd)


def fused_attention_sublayer_with_row(x, ln_s, ln_b, wqkv, bqkv, wproj,
                                      bproj, ls, num_heads, eps=1e-6):
    """(y, cls_row): the fused attention sub-layer plus the per-head CLS
    softmax row [N, heads, S] f32 — the attention the saliency maps
    consume, emitted in-VMEM so the [S, S] probability matrices never
    reach HBM (the flax path sows [N, heads, S, S]: ~100 MB for a
    4-volume LIDC batch; the rows are ~0.4 MB). Serving only (no VJP) —
    the saliency path (`train/predictor._forward_with_saliency`)."""
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, x.shape[-1]), jnp.float32)
    N, S, E = x.shape
    return _call_fused_multi(
        functools.partial(_attn_any_kernel, num_heads=num_heads,
                          has_ls=has_ls, eps=eps, has_rope=False,
                          want_row=True),
        x,
        [_vec(ln_s), _vec(ln_b), jnp.asarray(wqkv, x.dtype), _vec(bqkv),
         jnp.asarray(wproj, x.dtype), _vec(bproj), ls_arg],
        out_shapes=[(S, E), (num_heads, S)],
        out_dtypes=[x.dtype, jnp.float32],
        block_n=_pick_block(N, S, E, cap=1),
    )


def fused_attention_sublayer_abnar(x, ln_s, ln_b, wqkv, bqkv, wproj,
                                   bproj, ls, num_heads, eps=1e-6,
                                   rope_cos=None, rope_sin=None):
    """(y, abnar_factor): the fused attention sub-layer plus this layer's
    Abnar & Zuidema rollout factor [N, S, S] f32 (head-meaned probs + full
    identity, row-normalised — `ops/saliency.attention_rollout` per-layer
    term, computed in-kernel). The Abnar product multiplies newest-first,
    so the factors are emitted and chained in XLA
    (`ops/saliency.attention_rollout_from_factors`) — still 12x smaller
    than the flax path's per-head [N, heads, S, S] sows. Serving only."""
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, x.shape[-1]), jnp.float32)
    N, S, E = x.shape
    has_rope = rope_cos is not None
    operands = [_vec(ln_s), _vec(ln_b), jnp.asarray(wqkv, x.dtype),
                _vec(bqkv), jnp.asarray(wproj, x.dtype), _vec(bproj), ls_arg]
    if has_rope:
        pmat = jnp.asarray(_pair_swap_matrix(E // num_heads), x.dtype)
        operands += [jnp.asarray(rope_cos, jnp.float32),
                     jnp.asarray(rope_sin, jnp.float32), pmat]
    return _call_fused_multi(
        functools.partial(_attn_any_kernel, num_heads=num_heads,
                          has_ls=has_ls, eps=eps, has_rope=has_rope,
                          want_row=False, abnar=True),
        x,
        operands,
        out_shapes=[(S, E), (S, S)],
        out_dtypes=[x.dtype, jnp.float32],
        block_n=_pick_block(N, S, E, cap=1),
    )


def fused_attention_sublayer_rollout(x, ln_s, ln_b, wqkv, bqkv, wproj,
                                     bproj, ls, carry, num_heads, eps=1e-6,
                                     rope_cos=None, rope_sin=None,
                                     want_row=False):
    """(y, [cls_row,] new_carry): the fused attention sub-layer that ALSO
    advances the attention-rollout chain in-VMEM (serving only, no VJP).

    `carry` [N, heads, S] f32 is the running CLS row of the chain
    A_0 @ ... @ A_{i-1} (initialise with one-hot at token 0 before block
    0); the kernel updates it to include this block's softmax without the
    [S, S] matrices ever reaching HBM — the flax `--use_rollout` path sows
    12 x [N, heads, S, S] f32 (~1.2 GB for one 32-slice LIDC volume).
    `ops/saliency.plane_attention_from_row(final_carry, ...)` consumes the
    result exactly like the reference chain's CLS row
    (`dino.py:204-212` + `main_predict.py:73-100`). Optional rope
    (DINOv3) and `want_row` (emits this block's own CLS row as well, for
    plane_mode='last' reuse) compose."""
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, x.shape[-1]), jnp.float32)
    N, S, E = x.shape
    has_rope = rope_cos is not None
    operands = [_vec(ln_s), _vec(ln_b), jnp.asarray(wqkv, x.dtype),
                _vec(bqkv), jnp.asarray(wproj, x.dtype), _vec(bproj), ls_arg]
    if has_rope:
        pmat = jnp.asarray(_pair_swap_matrix(E // num_heads), x.dtype)
        operands += [jnp.asarray(rope_cos, jnp.float32),
                     jnp.asarray(rope_sin, jnp.float32), pmat]
    out_shapes = [(S, E)]
    out_dtypes = [x.dtype]
    if want_row:
        out_shapes.append((num_heads, S))
        out_dtypes.append(jnp.float32)
    out_shapes.append((num_heads, S))
    out_dtypes.append(jnp.float32)
    return _call_fused_multi(
        functools.partial(_attn_any_kernel, num_heads=num_heads,
                          has_ls=has_ls, eps=eps, has_rope=has_rope,
                          want_row=want_row, carry=True),
        x,
        operands,
        out_shapes=out_shapes,
        out_dtypes=out_dtypes,
        block_n=_pick_block(N, S, E, cap=1),
        grid_inputs=[jnp.asarray(carry, jnp.float32)],
    )


def fused_attention_sublayer_rope_with_row(x, ln_s, ln_b, wqkv, bqkv, wproj,
                                           bproj, ls, rope_cos, rope_sin,
                                           num_heads, eps=1e-6):
    """(y, cls_row) for the RoPE sub-layer (the DINOv3 explainability
    serving sub-layer) — serving only (no VJP)."""
    has_ls = ls is not None
    ls_arg = _vec(ls) if has_ls else jnp.zeros((1, x.shape[-1]), jnp.float32)
    N, S, E = x.shape
    hd = E // num_heads
    pmat = jnp.asarray(_pair_swap_matrix(hd), x.dtype)
    return _call_fused_multi(
        functools.partial(_attn_any_kernel, num_heads=num_heads,
                          has_ls=has_ls, eps=eps, has_rope=True,
                          want_row=True),
        x,
        [_vec(ln_s), _vec(ln_b), jnp.asarray(wqkv, x.dtype), _vec(bqkv),
         jnp.asarray(wproj, x.dtype), _vec(bproj), ls_arg,
         jnp.asarray(rope_cos, jnp.float32),
         jnp.asarray(rope_sin, jnp.float32), pmat],
        out_shapes=[(S, E), (num_heads, S)],
        out_dtypes=[x.dtype, jnp.float32],
        block_n=_pick_block(N, S, E, cap=1),
    )
