"""`--remat` (per-block gradient rematerialisation via jax.checkpoint):
remat must change ONLY the backward's memory/recompute schedule — the
param tree, logits, and gradients are identical with remat on vs off, on
both the flax path (nn.remat-wrapped Block) and the fused Pallas train
path (jax.checkpoint around `vit_fast._fused_train_block`).

The memory effect itself (ViT-L/giant2 UNFROZEN training fitting one
chip's HBM) is measured on real hardware by tools/bench_remat.py — XLA's
CPU backend reports no comparable per-program memory analysis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mst_tpu.models.mst import DinoSliceClassifier
from mst_tpu.models.vit_fast import fused_mst_logits

TINY = dict(model_size="tiny", patch_size=14, use_flash=False, fusion_heads=4)


def _grads_close(g1, g2, atol=2e-4):
    flat1 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_flatten_with_path(g1)[0]}
    flat2 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_flatten_with_path(g2)[0]}
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_allclose(np.asarray(flat1[k]),
                                   np.asarray(flat2[k]),
                                   atol=atol, rtol=atol, err_msg=k)


def test_flax_remat_same_tree_logits_grads():
    """nn.remat-wrapped blocks: identical init tree (checkpoints are
    remat-agnostic), identical train-mode logits, identical grads."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 2, 28, 28))
    t = jnp.array([0, 1])
    base = DinoSliceClassifier(out_ch=2, **TINY)
    rem = DinoSliceClassifier(out_ch=2, remat=True, **TINY)

    params = base.init(jax.random.PRNGKey(1), x)["params"]
    params_r = rem.init(jax.random.PRNGKey(1), x)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_r))

    def loss(model):
        def f(p):
            logits = model.apply({"params": p}, x, deterministic=False,
                                 rngs={"drop_path": jax.random.PRNGKey(2)})
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, t).mean()
        return f

    l0, l1 = float(loss(base)(params)), float(loss(rem)(params))
    np.testing.assert_allclose(l1, l0, atol=1e-6)
    _grads_close(jax.grad(loss(base))(params), jax.grad(loss(rem))(params))


@pytest.mark.slow
@pytest.mark.parametrize("extra", [
    {},                                                    # mlp blocks
    {"ffn_layer": "swiglu"},                               # giant2 family
    {"use_rope_2d": True, "use_pos_embed": False,
     "num_register_tokens": 4, "norm_eps": 1e-5},          # DINOv3 family
])
def test_fused_remat_grads_match(extra):
    """jax.checkpoint around the fused train kernels: gradient parity vs
    the non-remat fused path for all three block families the train
    kernels support (mlp / swiglu / rope+registers)."""
    model = DinoSliceClassifier(out_ch=2, **TINY, **extra)
    model_r = DinoSliceClassifier(out_ch=2, remat=True, **TINY, **extra)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 2, 28, 28))
    t = jnp.array([0, 1])
    params = model.init(jax.random.PRNGKey(4), x)["params"]

    def loss_for(m):
        def f(p):
            logits = fused_mst_logits(p, x, m, dtype=jnp.float32, train=True)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, t).mean()
        return f

    np.testing.assert_allclose(float(loss_for(model_r)(params)),
                               float(loss_for(model)(params)), atol=1e-6)
    _grads_close(jax.grad(loss_for(model))(params),
                 jax.grad(loss_for(model_r))(params))
