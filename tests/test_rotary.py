"""Rotary op tests: RoPE norm preservation / relativity, LiRE orthogonality."""

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.ops import (
    apply_liere,
    apply_rope,
    flat_to_skew,
    liere_rotations,
    num_skew_params,
    rope_angles,
)


def test_rope_preserves_norm():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 32))
    ang = rope_angles(16, 32, theta=256.0)
    y = apply_rope(x, ang)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_rope_relative_property():
    # <R_m q, R_n k> depends only on (m - n).
    d = 16
    q = jax.random.normal(jax.random.PRNGKey(1), (d,))
    k = jax.random.normal(jax.random.PRNGKey(2), (d,))
    L = 12
    ang = rope_angles(L, d)
    qs = apply_rope(jnp.broadcast_to(q, (L, d)), ang)
    ks = apply_rope(jnp.broadcast_to(k, (L, d)), ang)
    dots = np.asarray(jnp.einsum("ld,md->lm", qs, ks))
    # Same offset => same dot product, up to fp error.
    np.testing.assert_allclose(dots[2, 5], dots[4, 7], rtol=1e-4)
    np.testing.assert_allclose(dots[0, 3], dots[6, 9], rtol=1e-4)


def test_flat_to_skew_is_skew_symmetric():
    b = 6
    p = jax.random.normal(jax.random.PRNGKey(3), (2, num_skew_params(b)))
    s = np.asarray(flat_to_skew(p, b))
    np.testing.assert_allclose(s, -np.swapaxes(s, -1, -2), atol=1e-7)


def test_liere_rotations_are_orthogonal_and_norm_preserving():
    block, nb, L = 4, 2, 5
    params = 0.3 * jax.random.normal(
        jax.random.PRNGKey(4), (nb, num_skew_params(block))
    )
    rots = liere_rotations(params, jnp.arange(L), block)
    r = np.asarray(rots)
    eye = np.eye(block)
    for l in range(L):
        for n in range(nb):
            np.testing.assert_allclose(r[l, n] @ r[l, n].T, eye, atol=1e-5)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 3, L, nb * block))
    y = apply_liere(x, rots)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )
    # Position 0 is the identity rotation.
    np.testing.assert_allclose(np.asarray(y)[..., 0, :], np.asarray(x)[..., 0, :], atol=1e-5)
