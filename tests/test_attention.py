"""Numerics parity: Pallas flash attention vs XLA reference attention.

SURVEY.md §4 plan item (b). Shapes mirror the MST hot path: the ViT slice
encoder runs [B*D, H, 257, 64]-style attention (here shrunk for CPU tests).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mst_tpu.ops import attention_reference, flash_attention, make_key_padding_bias


def _rand_qkv(key, b, h, s, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), dtype)
    k = jax.random.normal(kk, (b, h, s, d), dtype)
    v = jax.random.normal(kv, (b, h, s, d), dtype)
    return q, k, v


@pytest.mark.parametrize("s", [16, 33, 65])
def test_flash_matches_reference(s):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), 2, 3, s, 32)
    ref = attention_reference(q, k, v)
    out = flash_attention(q, k, v, block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_grads_match_reference():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 2, 48, 16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=16, block_k=16) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)


def test_blocked_long_sequence_path(monkeypatch):
    """The long-sequence blocked path (sequences above SINGLE_BLOCK_MAX_KV,
    e.g. >1536-token slices) — forced here at tiny sizes — must match the
    reference in fwd (want_lse=False inference branch) AND grads
    (want_lse=True branch)."""
    import mst_tpu.ops.attention as A

    monkeypatch.setattr(A, "SINGLE_BLOCK_MAX_KV", 32)
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), 1, 2, 80, 16)
    out = A.flash_attention(q, k, v, block_q=32, block_k=32)
    ref = A.attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    gf = jax.grad(lambda a, b, c: jnp.sum(
        A.flash_attention(a, b, c, block_q=32, block_k=32) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda a, b, c: jnp.sum(
        A.attention_reference(a, b, c) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_key_padding_bias_matches_masked_softmax():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), 2, 2, 8, 16)
    pad = jnp.array([[False] * 8, [False] * 5 + [True] * 3])
    bias = make_key_padding_bias(pad)
    out, w = attention_reference(q, k, v, bias=bias, return_weights=True)
    # Padded keys get zero attention; rows still normalise to 1.
    assert np.asarray(w)[1, :, :, 5:].max() < 1e-12
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-6)


def test_flash_bf16_close_to_fp32_reference():
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), 1, 2, 40, 32, dtype=jnp.bfloat16)
    ref = attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    out = flash_attention(q, k, v, block_q=16, block_k=16)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
    )
