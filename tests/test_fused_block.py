"""Fused sub-layer kernels vs the flax modules (numerics + full fast path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mst_tpu.models.mst import DinoSliceClassifier
from mst_tpu.models.vit_fast import FastViTConfig, fused_mst_logits, fused_vit_cls
from mst_tpu.ops.fused_block import (
    _attn_ref,
    _mlp_ref,
    _swiglu_ref,
    fused_attention_sublayer,
    fused_attention_sublayer_train,
    fused_mlp_sublayer,
    fused_mlp_sublayer_train,
    fused_swiglu_sublayer,
    fused_swiglu_sublayer_train,
)

TINY = dict(model_size="tiny", patch_size=14, use_flash=False, fusion_heads=4)


def test_fused_attention_sublayer_matches_reference():
    key = jax.random.PRNGKey(0)
    N, S, E, H = 2, 9, 32, 4
    x = jax.random.normal(key, (N, S, E))
    ks = jax.random.split(key, 8)
    ln_s = 1.0 + 0.1 * jax.random.normal(ks[0], (E,))
    ln_b = 0.1 * jax.random.normal(ks[1], (E,))
    wqkv = 0.1 * jax.random.normal(ks[2], (E, 3 * E))
    bqkv = 0.1 * jax.random.normal(ks[3], (3 * E,))
    wproj = 0.1 * jax.random.normal(ks[4], (E, E))
    bproj = 0.1 * jax.random.normal(ks[5], (E,))
    ls = 1.0 + 0.1 * jax.random.normal(ks[6], (E,))

    for ls_arg in (None, ls):
        ref = _attn_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls_arg, H)
        out = fused_attention_sublayer(x, ln_s, ln_b, wqkv, bqkv, wproj,
                                       bproj, ls_arg, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_fused_mlp_sublayer_matches_reference_and_grads():
    key = jax.random.PRNGKey(1)
    N, S, E, F = 2, 9, 32, 64
    x = jax.random.normal(key, (N, S, E))
    ks = jax.random.split(key, 8)
    args = (
        1.0 + 0.1 * jax.random.normal(ks[0], (E,)),
        0.1 * jax.random.normal(ks[1], (E,)),
        0.1 * jax.random.normal(ks[2], (E, F)),
        0.1 * jax.random.normal(ks[3], (F,)),
        0.1 * jax.random.normal(ks[4], (F, E)),
        0.1 * jax.random.normal(ks[5], (E,)),
        None,
    )
    ref = _mlp_ref(x, *args, approximate=True)
    out = fused_mlp_sublayer(x, *args, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    g_f = jax.grad(lambda x: jnp.sum(fused_mlp_sublayer(x, *args, True) ** 2))(x)
    g_r = jax.grad(lambda x: jnp.sum(_mlp_ref(x, *args, approximate=True) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               atol=5e-4, rtol=5e-4)


def _rand_attn_args(key, E=32):
    ks = jax.random.split(key, 8)
    return (
        1.0 + 0.1 * jax.random.normal(ks[0], (E,)),
        0.1 * jax.random.normal(ks[1], (E,)),
        0.1 * jax.random.normal(ks[2], (E, 3 * E)),
        0.1 * jax.random.normal(ks[3], (3 * E,)),
        0.1 * jax.random.normal(ks[4], (E, E)),
        0.1 * jax.random.normal(ks[5], (E,)),
        1.0 + 0.1 * jax.random.normal(ks[6], (E,)),
    )


def test_attention_train_variant_full_grad_parity():
    """The residual-sharing backward (hand-written, no forward recompute)
    must match jax.grad of the XLA reference in EVERY argument."""
    key = jax.random.PRNGKey(3)
    N, S, E, H = 2, 9, 32, 4
    x = jax.random.normal(key, (N, S, E))
    *args, ls = _rand_attn_args(key)
    for ls_arg in (None, ls):
        out = fused_attention_sublayer_train(x, *args, ls_arg, H)
        ref = _attn_ref(x, *args, ls_arg, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

        diff_args = (x, *args) + (() if ls_arg is None else (ls_arg,))
        argnums = tuple(range(len(diff_args)))

        def loss_t(*a):
            full = a if ls_arg is not None else a + (None,)
            return jnp.sum(fused_attention_sublayer_train(*full, H) ** 2)

        def loss_r(*a):
            full = a if ls_arg is not None else a + (None,)
            return jnp.sum(_attn_ref(*full, num_heads=H) ** 2)

        gt = jax.grad(loss_t, argnums)(*diff_args)
        gr = jax.grad(loss_r, argnums)(*diff_args)
        for i, (a, b) in enumerate(zip(gt, gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=5e-4,
                                       err_msg=f"arg {i} (ls={ls_arg is not None})")


def test_mlp_train_variant_full_grad_parity():
    key = jax.random.PRNGKey(4)
    N, S, E, F = 2, 9, 32, 64
    x = jax.random.normal(key, (N, S, E))
    ks = jax.random.split(key, 8)
    args = (
        1.0 + 0.1 * jax.random.normal(ks[0], (E,)),
        0.1 * jax.random.normal(ks[1], (E,)),
        0.1 * jax.random.normal(ks[2], (E, F)),
        0.1 * jax.random.normal(ks[3], (F,)),
        0.1 * jax.random.normal(ks[4], (F, E)),
        0.1 * jax.random.normal(ks[5], (E,)),
        1.0 + 0.1 * jax.random.normal(ks[6], (E,)),
    )
    for approx in (True, False):
        for with_ls in (False, True):
            a = args if with_ls else args[:-1] + (None,)
            out = fused_mlp_sublayer_train(x, *a, approx)
            ref = _mlp_ref(x, *a, approximate=approx)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-5, rtol=2e-5)
            diff = (x,) + (args if with_ls else args[:-1])
            argnums = tuple(range(len(diff)))

            def loss_t(*d):
                full = d if with_ls else d + (None,)
                return jnp.sum(fused_mlp_sublayer_train(*full, approx) ** 2)

            def loss_r(*d):
                full = d if with_ls else d + (None,)
                return jnp.sum(_mlp_ref(*full, approximate=approx) ** 2)

            gt = jax.grad(loss_t, argnums)(*diff)
            gr = jax.grad(loss_r, argnums)(*diff)
            for i, (u, v) in enumerate(zip(gt, gr)):
                np.testing.assert_allclose(
                    np.asarray(u), np.asarray(v), atol=5e-4, rtol=5e-4,
                    err_msg=f"arg {i} approx={approx} ls={with_ls}")


def test_swiglu_variants_match_reference_and_grads():
    key = jax.random.PRNGKey(5)
    N, S, E, Fh = 2, 9, 32, 40  # 2*Fh = w12 out
    x = jax.random.normal(key, (N, S, E))
    ks = jax.random.split(key, 8)
    args = (
        1.0 + 0.1 * jax.random.normal(ks[0], (E,)),
        0.1 * jax.random.normal(ks[1], (E,)),
        0.1 * jax.random.normal(ks[2], (E, 2 * Fh)),
        0.1 * jax.random.normal(ks[3], (2 * Fh,)),
        0.1 * jax.random.normal(ks[4], (Fh, E)),
        0.1 * jax.random.normal(ks[5], (E,)),
        1.0 + 0.1 * jax.random.normal(ks[6], (E,)),
    )
    for with_ls in (False, True):
        a = args if with_ls else args[:-1] + (None,)
        ref = _swiglu_ref(x, *a)
        for fn in (fused_swiglu_sublayer, fused_swiglu_sublayer_train):
            out = fn(x, *a)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-5, rtol=2e-5)
        diff = (x,) + (args if with_ls else args[:-1])
        argnums = tuple(range(len(diff)))

        def loss_t(*d):
            full = d if with_ls else d + (None,)
            return jnp.sum(fused_swiglu_sublayer_train(*full) ** 2)

        def loss_r(*d):
            full = d if with_ls else d + (None,)
            return jnp.sum(_swiglu_ref(*full) ** 2)

        gt = jax.grad(loss_t, argnums)(*diff)
        gr = jax.grad(loss_r, argnums)(*diff)
        for i, (u, v) in enumerate(zip(gt, gr)):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       atol=5e-4, rtol=5e-4,
                                       err_msg=f"arg {i} ls={with_ls}")


@pytest.mark.slow
def test_fused_train_path_gradients_match_flax():
    """fused_mst_logits(train=True) end-to-end gradient parity vs the flax
    model — the exact program make_train_step runs on TPU."""
    import optax

    model = DinoSliceClassifier(out_ch=2, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 1, 2, 28, 28))
    t = jnp.array([0, 1])
    params = model.init(jax.random.PRNGKey(7), x)["params"]

    def loss_flax(p):
        logits = model.apply({"params": p}, x, deterministic=True)
        return optax.softmax_cross_entropy_with_integer_labels(logits, t).mean()

    def loss_fused(p):
        logits = fused_mst_logits(p, x, model, dtype=jnp.float32, train=True)
        return optax.softmax_cross_entropy_with_integer_labels(logits, t).mean()

    np.testing.assert_allclose(float(loss_fused(params)),
                               float(loss_flax(params)), atol=1e-5)
    g1 = jax.grad(loss_flax)(params)
    g2 = jax.grad(loss_fused)(params)
    flat1 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_flatten_with_path(g1)[0]}
    flat2 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_flatten_with_path(g2)[0]}
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_allclose(np.asarray(flat1[k]), np.asarray(flat2[k]),
                                   atol=2e-4, rtol=2e-4, err_msg=k)


def test_fused_mst_logits_match_flax_model():
    model = DinoSliceClassifier(out_ch=2, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 4, 28, 28))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    ref = model.apply({"params": params}, x)
    out = fused_mst_logits(params, x, model, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_vit_cls_matches_encoder():
    model = DinoSliceClassifier(out_ch=2, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 2, 28, 28))
    params = model.init(jax.random.PRNGKey(3), x)["params"]
    imgs = jnp.repeat(
        jnp.transpose(x, (0, 2, 3, 4, 1)).reshape(4, 28, 28, 1), 3, -1)
    from mst_tpu.models.vit import build_vit

    vit = build_vit("tiny", patch_size=14, use_flash=False)
    ref = vit.apply({"params": params["encoder"]}, imgs)["cls_token"]
    cfg = FastViTConfig.from_model(model)
    out = fused_vit_cls(params["encoder"], imgs, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_cls_only_last_block_matches_full_path(monkeypatch):
    """`_cls_last_block` (the CLS-only final block) == the full kernel
    path forced via MST_NO_CHEAP_LAST, for the CLS feature, the "last"
    saliency row, and train-mode gradients — v2 and rope (DINOv3) configs."""
    import optax

    for extra in ({}, dict(use_rope_2d=True, use_pos_embed=False,
                           rope_normalized=True, num_register_tokens=2,
                           norm_eps=1e-5)):
        model = DinoSliceClassifier(out_ch=2, **TINY, **extra)
        x = jax.random.normal(jax.random.PRNGKey(11), (2, 1, 2, 28, 28))
        params = model.init(jax.random.PRNGKey(12), x)["params"]
        imgs = jnp.repeat(
            jnp.transpose(x, (0, 2, 3, 4, 1)).reshape(4, 28, 28, 1), 3, -1)
        cfg = FastViTConfig.from_model(model)

        def run(want_row=False, train=False):
            return fused_vit_cls(params["encoder"], imgs, cfg,
                                 dtype=jnp.float32,
                                 want_last_row=want_row, train=train)

        monkeypatch.delenv("MST_NO_CHEAP_LAST", raising=False)
        cls_cheap, row_cheap = run(want_row=True)
        monkeypatch.setenv("MST_NO_CHEAP_LAST", "1")
        cls_full, row_full = run(want_row=True)
        np.testing.assert_allclose(np.asarray(cls_cheap),
                                   np.asarray(cls_full),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(row_cheap),
                                   np.asarray(row_full),
                                   atol=1e-5, rtol=1e-5)

        t = jnp.array([0, 1, 1, 0])

        def loss(p, enc_params):
            cls = fused_vit_cls(enc_params, imgs, cfg, dtype=jnp.float32,
                                train=True)
            logits = cls @ p
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, t).mean()

        head = 0.1 * jax.random.normal(jax.random.PRNGKey(13),
                                       (cls_cheap.shape[-1], 2))
        monkeypatch.setenv("MST_NO_CHEAP_LAST", "1")
        g_full = jax.grad(loss, argnums=(0, 1))(head, params["encoder"])
        monkeypatch.delenv("MST_NO_CHEAP_LAST")
        g_cheap = jax.grad(loss, argnums=(0, 1))(head, params["encoder"])
        flat_f = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_flatten_with_path(g_full)[0]}
        flat_c = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_flatten_with_path(g_cheap)[0]}
        assert set(flat_f) == set(flat_c)
        for k in flat_f:
            np.testing.assert_allclose(np.asarray(flat_c[k]),
                                       np.asarray(flat_f[k]),
                                       atol=2e-4, rtol=2e-4, err_msg=k)


def test_fused_gradients_match_flax_path():
    """Gradients through fused_mst_logits == gradients through the flax
    model (the fused op's VJP differentiates the equivalent composition)."""
    import optax

    model = DinoSliceClassifier(out_ch=2, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 2, 28, 28))
    t = jnp.array([0, 1])
    params = model.init(jax.random.PRNGKey(1), x)["params"]

    def loss_flax(p):
        logits = model.apply({"params": p}, x, deterministic=True)
        return optax.softmax_cross_entropy_with_integer_labels(logits, t).mean()

    def loss_fused(p):
        logits = fused_mst_logits(p, x, model, dtype=jnp.float32)
        return optax.softmax_cross_entropy_with_integer_labels(logits, t).mean()

    g1 = jax.grad(loss_flax)(params)
    g2 = jax.grad(loss_fused)(params)
    flat1 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_flatten_with_path(g1)[0]}
    flat2 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_flatten_with_path(g2)[0]}
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_allclose(np.asarray(flat1[k]), np.asarray(flat2[k]),
                                   atol=2e-4, rtol=2e-4, err_msg=k)


def test_fused_logits_with_padding_mask_match_flax():
    model = DinoSliceClassifier(out_ch=2, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 1, 4, 28, 28))
    mask = jnp.array([[False, False, True, True],
                      [False, False, False, True]])
    params = model.init(jax.random.PRNGKey(5), x, mask)["params"]
    ref = model.apply({"params": params}, x, mask)
    out = fused_mst_logits(params, x, model, src_key_padding_mask=mask,
                           dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_train_bwd_xla_fallback_parity(monkeypatch):
    """Embed widths above _PALLAS_BWD_MAX_E take the XLA backward — force
    that path and re-check full gradient parity."""
    from mst_tpu.ops import fused_block

    monkeypatch.setattr(fused_block, "_PALLAS_BWD_MAX_E", 0)
    key = jax.random.PRNGKey(9)
    N, S, E, H, F = 2, 9, 32, 4, 64
    x = jax.random.normal(key, (N, S, E))
    *a_args, ls = _rand_attn_args(key)

    def loss_t(*d):
        return jnp.sum(fused_attention_sublayer_train(*d, ls, H) ** 2)

    def loss_r(*d):
        return jnp.sum(_attn_ref(*d, ls, H) ** 2)

    argnums = tuple(range(1 + len(a_args)))
    gt = jax.grad(loss_t, argnums)(x, *a_args)
    gr = jax.grad(loss_r, argnums)(x, *a_args)
    for i, (u, v) in enumerate(zip(gt, gr)):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   atol=5e-4, rtol=5e-4, err_msg=f"attn arg {i}")

    ks = jax.random.split(key, 8)
    m_args = (
        1.0 + 0.1 * jax.random.normal(ks[0], (E,)),
        0.1 * jax.random.normal(ks[1], (E,)),
        0.1 * jax.random.normal(ks[2], (E, F)),
        0.1 * jax.random.normal(ks[3], (F,)),
        0.1 * jax.random.normal(ks[4], (F, E)),
        0.1 * jax.random.normal(ks[5], (E,)),
    )

    def mloss_t(*d):
        return jnp.sum(fused_mlp_sublayer_train(*d, None, True) ** 2)

    def mloss_r(*d):
        return jnp.sum(_mlp_ref(*d, None, approximate=True) ** 2)

    argnums = tuple(range(1 + len(m_args)))
    gt = jax.grad(mloss_t, argnums)(x, *m_args)
    gr = jax.grad(mloss_r, argnums)(x, *m_args)
    for i, (u, v) in enumerate(zip(gt, gr)):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   atol=5e-4, rtol=5e-4, err_msg=f"mlp arg {i}")


def test_fused_rope_attention_sublayer_matches_reference():
    """RoPE serve kernel (DINOv3 sub-layer) vs the XLA composition,
    including the MXU pair-swap-matmul rotate formulation."""
    from mst_tpu.ops.fused_block import (
        _attn_rope_ref,
        fused_attention_sublayer_rope,
    )
    from mst_tpu.ops.rotary import rope_2d_angles

    key = jax.random.PRNGKey(0)
    N, S, E, H = 2, 1 + 2 + 4, 32, 2  # CLS + 2 registers + 2x2 patches
    hd = E // H
    x = jax.random.normal(key, (N, S, E))
    ks = jax.random.split(key, 8)
    ln_s = 1.0 + 0.1 * jax.random.normal(ks[0], (E,))
    ln_b = 0.1 * jax.random.normal(ks[1], (E,))
    wqkv = 0.1 * jax.random.normal(ks[2], (E, 3 * E))
    bqkv = 0.1 * jax.random.normal(ks[3], (3 * E,))
    wproj = 0.1 * jax.random.normal(ks[4], (E, E))
    bproj = 0.1 * jax.random.normal(ks[5], (E,))
    ls = 1.0 + 0.1 * jax.random.normal(ks[6], (E,))
    ang = rope_2d_angles((2, 2), hd, num_prefix=3, normalized=True)
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    for ls_arg in (None, ls):
        ref = _attn_rope_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                             ls_arg, cos, sin, num_heads=H, eps=1e-5)
        out = fused_attention_sublayer_rope(x, ln_s, ln_b, wqkv, bqkv,
                                            wproj, bproj, ls_arg, cos, sin,
                                            H, 1e-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_fused_mst_logits_match_flax_dinov3():
    """The DINOv3 config (RoPE-only positions, normalized coords, eps 1e-5)
    through the fused serving path == the flax composition."""
    from mst_tpu.models.mst import dino_v3_classifier_slice

    model = dino_v3_classifier_slice(
        out_ch=2, model_size="tiny", fusion_heads=4, use_flash=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    ref = model.apply({"params": params}, x)
    out = fused_mst_logits(params, x, model, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_saliency_matches_flax_path():
    """fused_mst_saliency (CLS-row kernel + fusion probs) == the flax
    explainability path (sowed full probability matrices) — probs AND the
    combined upsampled saliency volume."""
    from mst_tpu.models.vit_fast import fused_mst_saliency
    from mst_tpu.train.predictor import _forward_with_saliency

    model = DinoSliceClassifier(out_ch=2, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 4, 28, 28))
    params = model.init(jax.random.PRNGKey(1), x)["params"]

    probs_ref, sal_ref = _forward_with_saliency(
        model, {"params": params}, x, None)
    probs, sal = fused_mst_saliency(params, x, model, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(probs_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sal), np.asarray(sal_ref),
                               atol=1e-5, rtol=1e-4)


def test_fused_saliency_respects_padding_mask():
    """The key-padding mask must flow into the fused fusion softmax: a
    masked slice gets (near-)zero slice attention."""
    from mst_tpu.models.vit_fast import fused_mst_saliency
    from mst_tpu.train.predictor import _forward_with_saliency

    model = DinoSliceClassifier(out_ch=2, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 4, 28, 28))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    mask = jnp.array([[False, False, True, True]])  # last 2 slices padded

    probs_ref, sal_ref = _forward_with_saliency(
        model, {"params": params}, x, mask)
    probs, sal = fused_mst_saliency(params, x, model,
                                    src_key_padding_mask=mask,
                                    dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(probs_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sal), np.asarray(sal_ref),
                               atol=1e-5, rtol=1e-4)


def test_fused_saliency_matches_flax_dinov3():
    """DINOv3 config (2D RoPE, no learned pos-embed, registers, eps 1e-5):
    the rope+CLS-row kernel saliency == the flax explainability path."""
    from mst_tpu.models.mst import dino_v3_classifier_slice
    from mst_tpu.models.vit_fast import fused_mst_saliency
    from mst_tpu.train.predictor import _forward_with_saliency

    model = dino_v3_classifier_slice(
        out_ch=2, model_size="tiny", fusion_heads=4, use_flash=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 4, 32, 32))
    params = model.init(jax.random.PRNGKey(1), x)["params"]

    probs_ref, sal_ref = _forward_with_saliency(
        model, {"params": params}, x, None)
    probs, sal = fused_mst_saliency(params, x, model, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(probs_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sal), np.asarray(sal_ref),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_fused_paths_honor_nondefault_eps_and_theta():
    """Config knobs must reach the kernels: a non-rope model with LN eps
    1e-5 and a rope model with non-default rope_theta both match their
    flax compositions through the fused serving path (regression for
    hardcoded eps/theta drift)."""
    from mst_tpu.models.mst import DinoSliceClassifier

    # non-rope, eps 1e-5 (constructible by overriding the v3 factory)
    m1 = DinoSliceClassifier(out_ch=2, norm_eps=1e-5, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 3, 28, 28))
    p1 = m1.init(jax.random.PRNGKey(1), x)["params"]
    ref1 = m1.apply({"params": p1}, x)
    out1 = fused_mst_logits(p1, x, m1, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                               atol=1e-4, rtol=1e-4)

    # rope with non-default theta
    m2 = DinoSliceClassifier(
        out_ch=2, model_size="tiny", patch_size=14, fusion_heads=4,
        use_flash=False, use_rope_2d=True, use_pos_embed=False,
        rope_theta=37.0, rope_normalized=True)
    x2 = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 3, 28, 28))
    p2 = m2.init(jax.random.PRNGKey(3), x2)["params"]
    ref2 = m2.apply({"params": p2}, x2)
    out2 = fused_mst_logits(p2, x2, m2, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=1e-4, rtol=1e-4)
    # round 3: the train gate ADMITS eps-1e-5 and rope models (the train
    # kernels take eps at runtime and carry rope plumbing) — grads through
    # the fused train path must match the flax composition
    from mst_tpu.train.trainer import should_use_fused_train

    # gate checks on lane-aligned (model_size small) clones: the 32-wide
    # tiny config itself is width-rejected on real TPU (vit_fast.
    # fused_config_supported), but eps/rope admission is what's asserted
    assert should_use_fused_train(
        m1.clone(model_size="small"), False, "tpu")
    assert should_use_fused_train(
        m2.clone(model_size="small"), False, "tpu")

    for m, p, xx in ((m1, p1, x), (m2, p2, x2)):
        def loss_fused(pp, _m=m, _x=xx):
            return jnp.sum(fused_mst_logits(pp, _x, _m, dtype=jnp.float32,
                                            train=True) ** 2)

        def loss_flax(pp, _m=m, _x=xx):
            return jnp.sum(_m.apply({"params": pp}, _x,
                                    deterministic=False) ** 2)

        gf = jax.tree_util.tree_leaves(jax.grad(loss_fused)(p))
        gr = jax.tree_util.tree_leaves(jax.grad(loss_flax)(p))
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=5e-3)


@pytest.mark.slow
def test_multislice_packing_k8_parity():
    """N=8 picks block_n=8 (`_pick_block`): the multi-slice
    weight-stationary program must match the reference composition exactly —
    serve fwd, CLS rows, and the residual-sharing train backward."""
    from mst_tpu.ops.fused_block import (
        _pick_block,
        fused_attention_sublayer_with_row,
    )

    key = jax.random.PRNGKey(11)
    N, S, E, H = 8, 9, 32, 4
    assert _pick_block(N, S, E) == 8
    x = jax.random.normal(key, (N, S, E))
    ks = jax.random.split(key, 8)
    ln_s = 1.0 + 0.1 * jax.random.normal(ks[0], (E,))
    ln_b = 0.1 * jax.random.normal(ks[1], (E,))
    wqkv = 0.1 * jax.random.normal(ks[2], (E, 3 * E))
    bqkv = 0.1 * jax.random.normal(ks[3], (3 * E,))
    wproj = 0.1 * jax.random.normal(ks[4], (E, E))
    bproj = 0.1 * jax.random.normal(ks[5], (E,))
    ls = 1.0 + 0.1 * jax.random.normal(ks[6], (E,))

    ref = _attn_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls, H)
    out = fused_attention_sublayer(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                                   ls, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # CLS-row output keeps its [N, heads, S] layout under packing
    out_r, rows = fused_attention_sublayer_with_row(
        x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls, H)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    assert rows.shape == (N, H, S)
    np.testing.assert_allclose(np.asarray(rows.sum(-1)), 1.0, atol=1e-5)
    # per-slice rows must differ (would be equal if slices were mixed up)
    assert np.abs(np.asarray(rows[0]) - np.asarray(rows[7])).max() > 1e-4

    # train variant: fwd + full grad parity at block_n=8
    def loss_t(*a):
        return jnp.sum(fused_attention_sublayer_train(*a, H) ** 2)

    def loss_r(*a):
        return jnp.sum(_attn_ref(*a, num_heads=H) ** 2)

    diff_args = (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls)
    argnums = tuple(range(len(diff_args)))
    gt = jax.grad(loss_t, argnums)(*diff_args)
    gr = jax.grad(loss_r, argnums)(*diff_args)
    for i, (a, b) in enumerate(zip(gt, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=f"arg {i}")


def test_rope_train_variant_full_grad_parity():
    """The residual-sharing RoPE train backward (DINOv3 fine-tuning,
    VERDICT r2 #3) must match jax.grad of `_attn_rope_ref` in every
    differentiable argument, at a non-default eps."""
    from mst_tpu.ops.fused_block import (
        _attn_rope_ref,
        fused_attention_sublayer_train_rope,
    )
    from mst_tpu.ops.rotary import rope_2d_angles

    key = jax.random.PRNGKey(5)
    N, S, E, H = 2, 1 + 2 + 4, 32, 2
    hd = E // H
    x = jax.random.normal(key, (N, S, E))
    ks = jax.random.split(key, 8)
    ln_s = 1.0 + 0.1 * jax.random.normal(ks[0], (E,))
    ln_b = 0.1 * jax.random.normal(ks[1], (E,))
    wqkv = 0.1 * jax.random.normal(ks[2], (E, 3 * E))
    bqkv = 0.1 * jax.random.normal(ks[3], (3 * E,))
    wproj = 0.1 * jax.random.normal(ks[4], (E, E))
    bproj = 0.1 * jax.random.normal(ks[5], (E,))
    ls = 1.0 + 0.1 * jax.random.normal(ks[6], (E,))
    ang = rope_2d_angles((2, 2), hd, num_prefix=3, normalized=True)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    eps = 1e-5

    out = fused_attention_sublayer_train_rope(
        x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls, cos, sin, H, eps)
    ref = _attn_rope_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls,
                         cos, sin, num_heads=H, eps=eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    diff = (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ls)
    argnums = tuple(range(len(diff)))

    def loss_t(*a):
        return jnp.sum(fused_attention_sublayer_train_rope(
            *a, cos, sin, H, eps) ** 2)

    def loss_r(*a):
        return jnp.sum(_attn_rope_ref(*a, cos, sin, num_heads=H,
                                      eps=eps) ** 2)

    gt = jax.grad(loss_t, argnums)(*diff)
    gr = jax.grad(loss_r, argnums)(*diff)
    for i, (a, b) in enumerate(zip(gt, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=f"arg {i}")


def test_train_variants_honor_runtime_eps():
    """Round-3: the train kernels take eps at runtime (previously a
    hardcoded 1e-6 gated DINOv3 out of the fused train path). Value AND
    grad parity at eps=1e-3 where 1e-6 would visibly diverge."""
    key = jax.random.PRNGKey(6)
    N, S, E, H, F = 2, 9, 32, 4, 64
    x = 0.01 * jax.random.normal(key, (N, S, E))  # small scale -> eps matters
    ks = jax.random.split(key, 8)
    ln_s = 1.0 + 0.1 * jax.random.normal(ks[0], (E,))
    ln_b = 0.1 * jax.random.normal(ks[1], (E,))
    wqkv = 0.1 * jax.random.normal(ks[2], (E, 3 * E))
    bqkv = 0.1 * jax.random.normal(ks[3], (3 * E,))
    wproj = 0.1 * jax.random.normal(ks[4], (E, E))
    bproj = 0.1 * jax.random.normal(ks[5], (E,))
    eps = 1e-3

    out = fused_attention_sublayer_train(x, ln_s, ln_b, wqkv, bqkv, wproj,
                                         bproj, None, H, eps)
    ref = _attn_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, None, H,
                    eps=eps)
    wrong = _attn_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, None, H,
                      eps=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    assert np.abs(np.asarray(ref) - np.asarray(wrong)).max() > 1e-3

    def loss_t(xx):
        return jnp.sum(fused_attention_sublayer_train(
            xx, ln_s, ln_b, wqkv, bqkv, wproj, bproj, None, H, eps) ** 2)

    def loss_r(xx):
        return jnp.sum(_attn_ref(xx, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                                 None, H, eps=eps) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(loss_t)(x)),
                               np.asarray(jax.grad(loss_r)(x)),
                               atol=5e-4, rtol=5e-4)

    # MLP train at runtime eps
    w1 = 0.1 * jax.random.normal(ks[6], (E, F))
    b1 = 0.1 * jax.random.normal(ks[7], (F,))
    w2 = 0.1 * jax.random.normal(ks[0], (F, E))
    b2 = 0.1 * jax.random.normal(ks[1], (E,))
    out = fused_mlp_sublayer_train(x, ln_s, ln_b, w1, b1, w2, b2, None,
                                   True, eps)
    ref = _mlp_ref(x, ln_s, ln_b, w1, b1, w2, b2, None, True, eps=eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_frozen_fused_train_grads_match_flax():
    """Frozen-encoder fused training (VERDICT r2 #2): fused train grads ==
    flax grads; encoder grads are exactly zero, fusion/head grads match."""
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.models.vit_fast import fused_mst_logits

    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                use_flash=False, fusion_heads=4, freeze=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 4, 28, 28))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    target = jnp.array([0, 1])

    def loss_fused(p):
        logits = fused_mst_logits(p, x, model, dtype=jnp.float32,
                                  train=True)
        return jnp.mean((logits - target[:, None]) ** 2)

    def loss_flax(p):
        logits = model.apply({"params": p}, x, deterministic=False)
        return jnp.mean((logits - target[:, None]) ** 2)

    gf = jax.grad(loss_fused)(params)
    gr = jax.grad(loss_flax)(params)
    # encoder fully frozen in both
    enc_norm = sum(float(jnp.abs(v).sum())
                   for v in jax.tree_util.tree_leaves(gf["encoder"]))
    assert enc_norm == 0.0
    for key_ in ("fusion_0", "head", "cls_token", "fusion_norm"):
        ja = jax.tree_util.tree_leaves(gf[key_])
        jb = jax.tree_util.tree_leaves(gr[key_])
        for a, b in zip(ja, jb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_fused_rollout_saliency_matches_flax():
    """VERDICT r2 #8: fused rollout serving — the in-VMEM carry-row chain
    equals the flax `--use_rollout` path (12 sowed [N,heads,T,T] tensors),
    for DINOv2 and DINOv3(rope) configs."""
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.models.vit_fast import fused_mst_saliency
    from mst_tpu.train.predictor import _forward_with_saliency

    v3_kw = dict(model_size="tiny", patch_size=14, fusion_heads=4,
                 use_flash=False, use_rope_2d=True, use_pos_embed=False,
                 rope_normalized=True, num_register_tokens=2, norm_eps=1e-5)
    for kw in (TINY, v3_kw):
        model = DinoSliceClassifier(out_ch=2, **kw)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 4, 28, 28))
        params = model.init(jax.random.PRNGKey(1), x)["params"]
        probs_ref, sal_ref = _forward_with_saliency(
            model, {"params": params}, x, None, plane_mode="rollout",
            force_flax=True)
        probs, sal = fused_mst_saliency(params, x, model,
                                        dtype=jnp.float32,
                                        plane_mode="rollout")
        np.testing.assert_allclose(np.asarray(probs), np.asarray(probs_ref),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sal), np.asarray(sal_ref),
                                   atol=1e-5, rtol=1e-4)


def test_exact_gelu_erf_polynomial():
    """The Mosaic kernels lower exact GELU through the A&S erf polynomial
    (`_erf_as` — Mosaic has no erf/erfc primitive; found when the
    gelu_approximate=False fused train path failed to compile on TPU).
    The polynomial must stay within its documented 1.5e-7 of scipy's erf,
    and the kernel `_gelu` must match jax.nn.gelu(exact) in f32."""
    import scipy.special as sp

    from mst_tpu.ops.fused_block import _erf_as, _gelu

    x = np.linspace(-6.0, 6.0, 4001).astype(np.float32)
    np.testing.assert_allclose(np.asarray(_erf_as(jnp.asarray(x))),
                               sp.erf(x.astype(np.float64)), atol=1e-6)
    # off-TPU _gelu routes to jax.nn.gelu; force the polynomial branch
    xf = jnp.asarray(x)
    y_poly = xf * 0.5 * (1.0 + _erf_as(xf * (1.0 / np.sqrt(2.0))))
    y_ref = jax.nn.gelu(xf, approximate=False)
    np.testing.assert_allclose(np.asarray(y_poly), np.asarray(y_ref),
                               atol=1e-6)
    # grad of the polynomial path stays within 1e-5 of the exact gelu grad
    g_poly = jax.vmap(jax.grad(
        lambda t: t * 0.5 * (1.0 + _erf_as(t * (1.0 / np.sqrt(2.0))))))(xf)
    g_ref = jax.vmap(jax.grad(
        lambda t: jax.nn.gelu(t, approximate=False)))(xf)
    np.testing.assert_allclose(np.asarray(g_poly), np.asarray(g_ref),
                               atol=1e-5)
    assert _gelu(xf, True).shape == x.shape


def test_fused_mst_logits_large_d_interpolated_pos_emb():
    """D > MAX_SLICES: the fused path must depth-interpolate the slice
    pos-emb table exactly like the flax path (models/mst.py) — a plain
    gather clamps indices >= vocab to the last row (JAX gather semantics)
    and silently diverges, which is how round 4 shipped it at first."""
    from mst_tpu.models.mst import MAX_SLICES

    model = DinoSliceClassifier(out_ch=2, use_slice_pos_emb=True, **TINY)
    D = MAX_SLICES + 8
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, D, 28, 28))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    ref = model.apply({"params": params}, x)
    out = fused_mst_logits(params, x, model, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_fused_mst_logits_d1024_mask_parity():
    """D=1024 (VERDICT r4 #4): the slice-pos-emb table is stretched 4x
    past its 256-entry vocabulary AND the key-padding mask is active —
    fused and flax paths must agree, and padded-tail perturbations must
    not move the logits (the 1000-slice-CT capability the reference's
    Embedding(256) hard cap forbids, `dino.py:81-82`)."""
    model = DinoSliceClassifier(out_ch=2, use_slice_pos_emb=True, **TINY)
    D = 1024
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, D, 28, 28))
    mask = jnp.arange(D)[None] >= 1000  # last 24 slices padded
    params = model.init(jax.random.PRNGKey(1), x[:, :, :4],
                        mask[:, :4])["params"]
    ref = model.apply({"params": params}, x, mask)
    out = fused_mst_logits(params, x, model, src_key_padding_mask=mask,
                           dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    # padding semantics survive the stretched table on the fused path
    x2 = x.at[:, :, 1000:].set(100.0 * jax.random.normal(
        jax.random.PRNGKey(9), x[:, :, 1000:].shape))
    out2 = fused_mst_logits(params, x2, model, src_key_padding_mask=mask,
                            dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)
