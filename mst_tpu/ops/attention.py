"""Attention ops: Pallas TPU flash attention + XLA reference attention.

TPU-native replacement for the reference's attention stack:
- xFormers `memory_efficient_attention` CUDA kernels used by the DINOv2 ViT
  (reference `mst/models/extern/dinov2/layers/attention.py:72-89`) become a
  Pallas flash-attention kernel (online-softmax, fp32 accumulation on the
  MXU, custom VJP with a Pallas backward).
- torch `scaled_dot_product_attention` used by the slice-fusion layer
  (reference `mst/models/utils/transformer_blocks.py:296-318`) maps to the
  same kernel; the explicit-weights path (needed for explainability,
  reference `transformer_blocks.py:266-295`) is `attention_reference`
  with `return_weights=True` — a pure function returning the softmax
  matrix as an auxiliary output instead of mutating module state via hooks.

Conventions: q/k/v are `[B, H, S, D]`; an optional additive bias is
`[B, 1|H, Sq, Sk]`. Padding semantics use additive `-inf`-style bias (the
wrapper `make_key_padding_bias` builds it from a boolean key-padding mask,
matching `src_key_padding_mask` semantics of the reference).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # large-negative instead of -inf: keeps softmax NaN-free on fully masked rows

# Kernels compute the softmax exponential as exp2((qk * scale * LOG2E) - m2):
# folding log2(e) into the scale turns every exp into the cheaper exp2 (the
# VPU lowers exp to exp2 * log2e anyway — folding removes a full [S, S]
# multiply pass) and the normalising division moves to the [S, D] output
# (`o * inv`) instead of the [S, S] probability matrix. Saved lse values
# stay in NATURAL-log units (converted once per row) so residuals remain
# interchangeable with the XLA reference path.
LOG2E = math.log2(math.e)


# ---------------------------------------------------------------------------
# Reference XLA attention (used for: small sequences, explainability path,
# numerics tests against the Pallas kernel).
# ---------------------------------------------------------------------------


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    sm_scale: Optional[float] = None,
    return_weights: bool = False,
):
    """Plain XLA attention. q,k,v: [B,H,S,D]. bias: [B,1|H,Sq,Sk] additive.

    With `return_weights=True` returns `(out, probs)` where probs is
    `[B,H,Sq,Sk]` — the functional analogue of the reference forcing
    `need_weights=True, average_attn_weights=False` (reference
    `mst/models/dino.py:214-260`).
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * sm_scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    if return_weights:
        return out, probs
    return out


def make_key_padding_bias(
    key_padding_mask: jax.Array, dtype=jnp.float32
) -> jax.Array:
    """[B, Sk] bool (True = PAD, as in torch src_key_padding_mask) -> additive
    bias [B, 1, 1, Sk]."""
    return jnp.where(key_padding_mask[:, None, None, :], NEG_INF, 0.0).astype(dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *refs,
                sm_scale: float, kv_len: int, block_k: int,
                want_lse: bool = True):
    """Grid: (BH, num_q_blocks, num_k_blocks); k-axis innermost (sequential on
    TPU) so the online-softmax state lives in VMEM scratch across k steps."""
    if want_lse:
        lse_ref, acc_ref, m_ref, l_ref = refs
    else:
        lse_ref, (acc_ref, m_ref, l_ref) = None, refs
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    s = s * (sm_scale * LOG2E)  # base-2 domain (see LOG2E note at top)

    # Static-length key padding: mask columns >= kv_len.
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_ref[:, 0]                     # [bq]
    m_cur = jnp.max(s, axis=-1)              # [bq]
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new[:, None])         # [bq, bk]
    alpha = jnp.exp2(m_prev - m_new)         # [bq]
    l_new = alpha * l_ref[:, 0] + jnp.sum(p, axis=-1)
    acc_ref[:] = acc_ref[:] * alpha[:, None] + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:, 0] = m_new
    l_ref[:, 0] = l_new

    @pl.when(kb == nk - 1)
    def _finish():
        l = l_ref[:, 0]
        inv = jnp.where(l > 0.0, 1.0 / l, 0.0)
        o_ref[0] = (acc_ref[:] * inv[:, None]).astype(o_ref.dtype)
        if want_lse:
            # Convert base-2 running stats back to natural-log lse units.
            lse = (m_ref[:, 0] + jnp.log2(jnp.maximum(l, 1e-30))) / LOG2E
            # lse is replicated along a 128-lane last axis purely to
            # satisfy TPU tiling (same trick as jax's reference TPU flash
            # kernel).
            lse_ref[0] = jnp.broadcast_to(lse[:, None], lse_ref.shape[1:])


def _fwd_single_kernel(q_ref, k_ref, v_ref, o_ref, *refs,
                       sm_scale: float, kv_len: int, want_lse: bool = True):
    """Short-sequence fast path: whole K/V resident in VMEM, one program per
    (b*h, q-block) — no online-softmax carry, two MXU matmuls + a softmax.
    At MST scale (257-token ViT slices) this beats the blocked loop: the
    grid shrinks 3x and the softmax state never round-trips scratch."""
    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [Skp, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (sm_scale * LOG2E)  # base-2 domain (LOG2E note at top)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=-1)
    p = jnp.exp2(s - m[:, None])
    l = jnp.sum(p, axis=-1)
    inv = jnp.where(l > 0.0, 1.0 / l, 0.0)
    # Normalise the [bq, d] output rather than the [bq, Sk] p matrix.
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) * inv[:, None]
    o_ref[0] = o.astype(o_ref.dtype)
    if want_lse:
        lse_ref = refs[0]
        lse = (m + jnp.log2(jnp.maximum(l, 1e-30))) / LOG2E
        lse_ref[0] = jnp.broadcast_to(lse[:, None], lse_ref.shape[1:])


# Whole-sequence programs hold several f32 [S, S] intermediates at once
# (~9.4 MB each at S=1536); the default 16 MiB scoped-VMEM budget only
# covers S <= ~500. v5e has 128 MiB of VMEM per core.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


# Sequences up to this length take the single-block (ragged, unpadded)
# kernels. 1536 covers the ViT-g/14 518px grid (1370 tokens); the
# whole-row f32 intermediates at 1536x1536 are ~9.4 MB each, well within
# VMEM for the ~4 the backward holds at once.
SINGLE_BLOCK_MAX_KV = 1536


def _pad_to(x: jax.Array, axis: int, mult: int) -> jax.Array:
    s = x.shape[axis]
    pad = (-s) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_fwd(q, k, v, sm_scale, block_q, block_k, interpret,
               want_lse=True):
    B, H, Sq, D = q.shape
    Sk = k.shape[2]

    if Sk <= SINGLE_BLOCK_MAX_KV and Sq <= SINGLE_BLOCK_MAX_KV:
        # Whole-sequence blocks: Mosaic accepts blocks equal to the (ragged)
        # array dims and pads tiles internally, so no host-visible 257->384
        # padding copies are needed; masking operates on logical shapes.
        qp = q.reshape(B * H, Sq, D)
        kp = k.reshape(B * H, Sk, D)
        vp = v.reshape(B * H, Sk, D)
        Sqp, Skp = Sq, Sk
        bq = Sq
        out_specs = [pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((B * H, Sqp, D), q.dtype)]
        if want_lse:
            out_specs.append(pl.BlockSpec((1, bq, 128), lambda b, i: (b, i, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((B * H, Sqp, 128), jnp.float32))
        res = pl.pallas_call(
            functools.partial(
                _fwd_single_kernel, sm_scale=sm_scale, kv_len=Sk,
                want_lse=want_lse,
            ),
            grid=(B * H, Sqp // bq),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Skp, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Skp, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(qp, kp, vp)
        out = res[0][:, :Sq].reshape(B, H, Sq, D)
        if not want_lse:
            return out, None
        lse = res[1][:, :Sq, 0].reshape(B, H, Sq)
        return out, lse

    # Long-sequence blocked path: pad to block multiples.
    block_q = min(block_q, max(8, 1 << (Sq - 1).bit_length()))
    block_k = min(block_k, max(8, 1 << (Sk - 1).bit_length()))
    qp = _pad_to(q.reshape(B * H, Sq, D), 1, block_q)
    kp = _pad_to(k.reshape(B * H, Sk, D), 1, block_k)
    vp = _pad_to(v.reshape(B * H, Sk, D), 1, block_k)
    Sqp, Skp = qp.shape[1], kp.shape[1]
    grid = (B * H, Sqp // block_q, Skp // block_k)

    out_specs = [pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B * H, Sqp, D), q.dtype)]
    if want_lse:
        out_specs.append(pl.BlockSpec((1, block_q, 128),
                                      lambda b, i, j: (b, i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((B * H, Sqp, 128), jnp.float32))
    res = pl.pallas_call(
        functools.partial(
            _fwd_kernel, sm_scale=sm_scale, kv_len=Sk, block_k=block_k,
            want_lse=want_lse,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(qp, kp, vp)
    out = res[0][:, :Sq].reshape(B, H, Sq, D)
    if not want_lse:
        return out, None
    lse = res[1][:, :Sq, 0].reshape(B, H, Sq)
    return out, lse


# ---------------------------------------------------------------------------
# Pallas flash attention (backward)
# ---------------------------------------------------------------------------


def _bwd_single_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                       dq_ref, dk_ref, dv_ref,
                       *, sm_scale: float, kv_len: int):
    """Short-sequence backward: dq, dk, dv in ONE program per (b*h) — the
    whole sequence is VMEM-resident, so no scratch accumulators, no grid
    loops, and no host-visible padding (same ragged-block trick as the
    forward)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (sm_scale * LOG2E)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp2(s - lse_ref[0][:, :1] * LOG2E)  # [Sq, Sk]
    dv_ref[0] = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta_ref[0][:, :1]) * sm_scale
    dq_ref[0] = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   dq_acc, *, sm_scale: float, kv_len: int, block_k: int):
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (sm_scale * LOG2E)
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp2(s - lse_ref[0][:, :1] * LOG2E)  # [bq, bk]
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, bk]
    ds = p * (dp - delta_ref[0][:, :1]) * sm_scale
    dq_acc[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == nk - 1)
    def _finish():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc,
                    *, sm_scale: float, kv_len: int, block_k: int):
    qb = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qb == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (sm_scale * LOG2E)  # [bq, bk]
    kb_idx = pl.program_id(1)
    col = kb_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp2(s - lse_ref[0][:, :1] * LOG2E)  # [bq, bk]
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bk, d]
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, bk]
    ds = p * (dp - delta_ref[0][:, :1]) * sm_scale  # [bq, bk]
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bk, d]

    @pl.when(qb == nq - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(sm_scale, block_q, block_k, interpret, residuals, g):
    q, k, v, out, lse = residuals
    B, H, Sq, D = q.shape
    Sk = k.shape[2]

    do = g.astype(q.dtype)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    if Sk <= SINGLE_BLOCK_MAX_KV and Sq <= SINGLE_BLOCK_MAX_KV:
        # Ragged single-block backward (see _bwd_single_kernel).
        qp = q.reshape(B * H, Sq, D)
        kp = k.reshape(B * H, Sk, D)
        vp = v.reshape(B * H, Sk, D)
        dop = do.reshape(B * H, Sq, D)
        lsep = jnp.broadcast_to(
            lse.reshape(B * H, Sq)[..., None], (B * H, Sq, 128))
        deltap = jnp.broadcast_to(
            delta.reshape(B * H, Sq)[..., None], (B * H, Sq, 128))
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_single_kernel, sm_scale=sm_scale, kv_len=Sk
            ),
            grid=(B * H,),
            in_specs=[
                pl.BlockSpec((1, Sq, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Sk, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Sk, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Sq, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Sq, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Sq, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, Sq, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Sk, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Sk, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B * H, Sq, D), q.dtype),
                jax.ShapeDtypeStruct((B * H, Sk, D), k.dtype),
                jax.ShapeDtypeStruct((B * H, Sk, D), v.dtype),
            ],
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(qp, kp, vp, dop, lsep, deltap)
        return (dq.reshape(B, H, Sq, D), dk.reshape(B, H, Sk, D),
                dv.reshape(B, H, Sk, D))

    block_q = min(block_q, max(8, 1 << (Sq - 1).bit_length()))
    block_k = min(block_k, max(8, 1 << (Sk - 1).bit_length()))

    qp = _pad_to(q.reshape(B * H, Sq, D), 1, block_q)
    kp = _pad_to(k.reshape(B * H, Sk, D), 1, block_k)
    vp = _pad_to(v.reshape(B * H, Sk, D), 1, block_k)
    dop = _pad_to(do.reshape(B * H, Sq, D), 1, block_q)
    # Padded query rows must contribute nothing: pad lse with +1e30 so
    # p = exp(s - lse) == 0 for those rows; delta pads with zeros.
    lsep = _pad_to(lse.reshape(B * H, Sq), 1, block_q)
    if lsep.shape[1] != Sq:
        pad_rows = lsep.shape[1] - Sq
        lsep = jnp.concatenate(
            [lsep[:, :Sq], jnp.full((B * H, pad_rows), 1e30, jnp.float32)], axis=1
        )
    deltap = _pad_to(delta.reshape(B * H, Sq), 1, block_q)
    # Lane-pad to 128 for TPU tiling (value replicated; kernels read lane 0).
    lsep = jnp.broadcast_to(lsep[..., None], (*lsep.shape, 128))
    deltap = jnp.broadcast_to(deltap[..., None], (*deltap.shape, 128))
    Sqp, Skp = qp.shape[1], kp.shape[1]

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, sm_scale=sm_scale, kv_len=Sk, block_k=block_k
        ),
        grid=(B * H, Sqp // block_q, Skp // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Sqp, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
    )(qp, kp, vp, dop, lsep, deltap)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, sm_scale=sm_scale, kv_len=Sk, block_k=block_k
        ),
        grid=(B * H, Skp // block_k, Sqp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Skp, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, Skp, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
    )(qp, kp, vp, dop, lsep, deltap)

    dq = dq[:, :Sq].reshape(B, H, Sq, D)
    dk = dk[:, :Sk].reshape(B, H, Sk, D)
    dv = dv[:, :Sk].reshape(B, H, Sk, D)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public flash_attention with custom VJP
# ---------------------------------------------------------------------------


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention(q, k, v, sm_scale, block_q, block_k, interpret):
    # Primal (inference) path skips the lse output entirely.
    out, _ = _flash_fwd(q, k, v, sm_scale, block_q, block_k, interpret,
                        want_lse=False)
    return out


def _flash_attention_fwd(q, k, v, sm_scale, block_q, block_k, interpret):
    out, lse = _flash_fwd(q, k, v, sm_scale, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _flash_attention_bwd(sm_scale, block_q, block_k, interpret, res, g):
    return _flash_bwd(sm_scale, block_q, block_k, interpret, res, g)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: Optional[float] = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash attention over [B,H,S,D]. Unmasked full attention (ViT encoder
    path — every patch token attends everywhere, reference
    `extern/dinov2/layers/attention.py`). Sequences are padded internally to
    the block size; padded keys are masked by sequence length.

    On non-TPU backends (CPU tests) falls back to Pallas interpreter mode
    unless `interpret` is given explicitly.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    if interpret is None:
        interpret = not _on_tpu()
    return _flash_attention(q, k, v, sm_scale, block_q, block_k, interpret)
