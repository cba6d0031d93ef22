"""Small inventory-parity pieces: DINOHead, EnsureShapeMultiple, slices2rgb."""

import jax
import jax.numpy as jnp
import numpy as np


def test_dino_head_shapes_and_normalised_prototypes():
    from mst_tpu.models.dino_head import DINOHead

    head = DINOHead(out_dim=64, hidden_dim=32, bottleneck_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 24))
    params = head.init(jax.random.PRNGKey(1), x)
    out = head.apply(params, x)
    assert out.shape == (4, 64)
    # logits are cosine similarities: bounded by 1
    assert float(jnp.abs(out).max()) <= 1.0 + 1e-5


def test_ensure_shape_multiple_pad_and_crop():
    from mst_tpu.data.transforms import ensure_shape_multiple

    vol = np.random.default_rng(0).normal(size=(1, 5, 9, 12)).astype(np.float32)
    (padded,) = ensure_shape_multiple(vol, 4, method="pad")
    assert padded.shape == (1, 8, 12, 12)
    (cropped,) = ensure_shape_multiple(vol, 4, method="crop")
    assert cropped.shape == (1, 4, 8, 12)
    # per-axis multiple
    (p2,) = ensure_shape_multiple(vol, (2, 3, 5), method="pad")
    assert p2.shape == (1, 6, 9, 15)


def test_slices2rgb_packing():
    from mst_tpu.models.mst import slices2rgb

    vol = jnp.arange(2 * 1 * 7 * 2 * 2, dtype=jnp.float32).reshape(2, 1, 7, 2, 2)
    out = slices2rgb(vol)
    assert out.shape == (2 * 3, 3, 2, 2)  # ceil(7/3) = 3 triplets per volume
    # first triplet of the first volume is slices 0,1,2
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(vol[0, 0, :3]))
