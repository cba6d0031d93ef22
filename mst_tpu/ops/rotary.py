"""Rotary positional encodings for the slice-fusion attention.

Re-designs the reference's vendored lucidrains `rotary_embedding_torch.py`
(reference `mst/models/utils/rotary_embedding_torch.py`) as pure functions:

- RoPE: 'lang'-style inverse-frequency rotation, interleaved-pair layout,
  theta=256 as configured by the reference MHA
  (`mst/models/utils/transformer_blocks.py:333-349`).
- LiRE (LieRE, learned rotary): per-block skew-symmetric generators ->
  `expm(p * A)` rotation per position, block-diagonal application to q/k
  (`transformer_blocks.py:350-358`, `rotary_embedding_torch.py:320-387`).

Known reference bug NOT replicated: the reference's
`rotate_queries_or_keys` (`rotary_embedding_torch.py:389-395`) computes a
permutation of the rotated output and drops it (no-op permute), so its LiRE
path silently returns a mis-laid-out tensor. Here the rotation is applied
and returned in the `[B, H, L, D]` layout, which is the intended semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------


def rope_frequencies(dim: int, theta: float = 256.0) -> np.ndarray:
    """Inverse frequencies for 'lang' RoPE: 1/theta^(2i/dim), i < dim/2."""
    return 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))


def rope_angles(seq_len: int, dim: int, theta: float = 256.0) -> jnp.ndarray:
    """Angles [seq_len, dim] with each frequency repeated for the (x, y) pair
    (interleaved layout, matching lucidrains `repeat(freqs, '... n -> ... (n r)',
    r=2)`)."""
    freqs = rope_frequencies(dim, theta)  # [dim/2]
    t = np.arange(seq_len, dtype=np.float64)
    ang = np.einsum("s,d->sd", t, freqs)  # [seq, dim/2]
    ang = np.repeat(ang, 2, axis=-1)  # [seq, dim]
    return jnp.asarray(ang, dtype=jnp.float32)


def _rotate_half_interleaved(x: jax.Array) -> jax.Array:
    """(x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...)."""
    x2 = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    a, b = x2[..., 0], x2[..., 1]
    return jnp.stack([-b, a], axis=-1).reshape(x.shape)


def apply_rope(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Apply RoPE to x [..., L, D] given angles [L, D] (fp32 rotation, cast
    back to x.dtype)."""
    xf = x.astype(jnp.float32)
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    out = xf * cos + _rotate_half_interleaved(xf) * sin
    return out.astype(x.dtype)


def rope_2d_angles(grid_hw, dim: int, num_prefix: int = 1,
                   theta: float = 100.0,
                   normalized: bool = False) -> jnp.ndarray:
    """Axial 2D RoPE angles for a patch grid (the DINOv3-style in-plane
    rotary encoding; reference `mst/models/dino.py:686-724` plumbs the rope
    kwarg of DINOv3 attention).

    Half of `dim` rotates with the row coordinate, half with the column.
    Prefix tokens (CLS + registers) get zero angles (identity rotation).
    Returns [num_prefix + gh*gw, dim].

    `normalized=True` reproduces HF `DINOv3ViTRopePositionEmbedding`
    EXACTLY (pretrained-DINOv3-weight compatible): coordinates are patch
    CENTERS normalised to [-1, 1] (`2*(i+0.5)/n - 1`) scaled by 2*pi, and
    the per-pair angle sequence [row-freqs, col-freqs] matches HF's
    `tile(2)` + rotate-half layout after the q/k head-dim interleave
    permutation applied by `convert_hf_dinov3` (the frequency exponents
    `theta**(-4i/head_dim)` are identical in both conventions).
    `normalized=False` keeps raw integer patch indices (grid-size-dependent
    angular range; the pre-weight-compat behavior).
    """
    gh, gw = grid_hw
    half = dim // 2
    freqs = rope_frequencies(half, theta)  # [half/2]
    rows = np.repeat(np.arange(gh, dtype=np.float64), gw)
    cols = np.tile(np.arange(gw, dtype=np.float64), gh)
    if normalized:
        rows = (2.0 * (rows + 0.5) / gh - 1.0) * (2.0 * np.pi)
        cols = (2.0 * (cols + 0.5) / gw - 1.0) * (2.0 * np.pi)
    ang_r = np.repeat(np.einsum("s,d->sd", rows, freqs), 2, axis=-1)
    ang_c = np.repeat(np.einsum("s,d->sd", cols, freqs), 2, axis=-1)
    ang = np.concatenate([ang_r, ang_c], axis=-1)  # [gh*gw, dim]
    ang = np.concatenate([np.zeros((num_prefix, dim)), ang], axis=0)
    return jnp.asarray(ang, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# LiRE (learned rotary via Lie-group generators)
# ---------------------------------------------------------------------------


def num_skew_params(block: int) -> int:
    """Free parameters of a block×block skew-symmetric matrix."""
    return block * (block - 1) // 2


def flat_to_skew(params: jax.Array, block: int) -> jax.Array:
    """[..., block*(block-1)/2] -> skew-symmetric [..., block, block].

    Mirrors the reference's upper-triangle packing
    (`rotary_embedding_torch.py:320-326`).
    """
    iu = np.triu_indices(block, k=1)
    zeros = jnp.zeros(params.shape[:-1] + (block, block), params.dtype)
    upper = zeros.at[..., iu[0], iu[1]].set(params)
    return upper - jnp.swapaxes(upper, -1, -2)


def liere_rotations(params: jax.Array, positions: jax.Array,
                    block: int) -> jax.Array:
    """Rotation matrices R[p] = expm(p * A_b) for each position and block.

    params: [n_blocks, block*(block-1)/2] learned generators.
    positions: [L] (float or int).
    Returns [L, n_blocks, block, block] (fp32).
    """
    skew = flat_to_skew(params.astype(jnp.float32), block)  # [nb, b, b]
    pos = positions.astype(jnp.float32)

    def per_pos(p):
        return jax.scipy.linalg.expm(p * skew)  # vmaps over leading nb axis

    return jax.vmap(per_pos)(pos)


def apply_liere(x: jax.Array, rotations: jax.Array) -> jax.Array:
    """Apply block-diagonal rotations to x [..., L, D].

    rotations: [L, n_blocks, b, b] with n_blocks * b == D. The reference
    materialises a sparse block-diagonal [L*D, L*D] matrix and does sparse
    bmm in fp32 (`rotary_embedding_torch.py:345-387`); on TPU the same
    contraction is a dense per-block einsum that XLA maps to the MXU.
    """
    L, nb, b, _ = rotations.shape
    xf = x.astype(jnp.float32)
    xb = xf.reshape(*x.shape[:-1], nb, b)  # [..., L, nb, b]
    out = jnp.einsum("lnij,...lnj->...lni", rotations, xb)
    return out.reshape(x.shape).astype(x.dtype)
