"""Int8 (W8A8) serving path: quantization correctness + model-level
accuracy vs the bf16 fused path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mst_tpu.ops.fused_int8 import (
    quantize_encoder_int8,
    quantize_mst_params_int8,
    quantize_weight_int8,
)


def test_quantize_weight_roundtrip_error_bound():
    w = np.random.default_rng(0).normal(size=(64, 96)).astype(np.float32)
    q, s = quantize_weight_int8(w)
    assert q.dtype == np.int8 and s.shape == (1, 96)
    deq = q.astype(np.float32) * s
    # symmetric per-channel: error <= s/2 per element
    assert np.max(np.abs(deq - w) / s) <= 0.5 + 1e-6


def test_quantize_encoder_structure():
    from mst_tpu.models.vit import build_vit

    vit = build_vit("tiny", patch_size=14, use_flash=False)
    x = jnp.ones((1, 28, 28, 3))
    params = vit.init(jax.random.PRNGKey(0), x)["params"]
    qp = quantize_encoder_int8(params)
    blk = qp["blocks_0"]
    assert set(blk["attn"]["qkv"]) == {"q8", "scale", "bias"}
    assert blk["attn"]["qkv"]["q8"].dtype == jnp.int8
    assert "kernel" not in blk["attn"]["qkv"]  # bf16 kernel replaced
    # untouched leaves pass through
    np.testing.assert_array_equal(
        np.asarray(qp["patch_embed"]["proj"]["kernel"]),
        np.asarray(params["patch_embed"]["proj"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(qp["cls_token"]),
                                  np.asarray(params["cls_token"]))


def test_int8_sublayer_close_to_bf16_reference():
    """The i8 attention sublayer must track the f32 reference within the
    quantization error envelope."""
    from mst_tpu.ops.fused_block import _attn_ref
    from mst_tpu.ops.fused_int8 import fused_attention_sublayer_i8

    key = jax.random.PRNGKey(0)
    N, S, E, H = 4, 9, 64, 4
    x = jax.random.normal(key, (N, S, E)) * 0.5
    ks = jax.random.split(key, 8)
    ln_s = 1.0 + 0.1 * jax.random.normal(ks[0], (E,))
    ln_b = 0.1 * jax.random.normal(ks[1], (E,))
    wqkv = 0.1 * jax.random.normal(ks[2], (E, 3 * E))
    bqkv = 0.1 * jax.random.normal(ks[3], (3 * E,))
    wproj = 0.1 * jax.random.normal(ks[4], (E, E))
    bproj = 0.1 * jax.random.normal(ks[5], (E,))

    ref = _attn_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, None, H)
    q_qkv, s_qkv = quantize_weight_int8(wqkv)
    q_proj, s_proj = quantize_weight_int8(wproj)
    out = fused_attention_sublayer_i8(
        x, ln_s, ln_b,
        {"q8": jnp.asarray(q_qkv), "scale": jnp.asarray(s_qkv), "bias": bqkv},
        {"q8": jnp.asarray(q_proj), "scale": jnp.asarray(s_proj),
         "bias": bproj},
        None, H)
    a, b = np.asarray(out).ravel(), np.asarray(ref).ravel()
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.9995, cos
    assert np.max(np.abs(a - b)) < 0.25  # residual stream magnitude ~1


def test_int8_model_logits_track_bf16():
    """Full MST forward through quantized params: probabilities stay close
    and argmax agrees with the full-precision fused path."""
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.models.vit_fast import fused_mst_logits

    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                use_flash=False, fusion_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 4, 28, 28))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    ref = fused_mst_logits(params, x, model, dtype=jnp.float32)
    qp = quantize_mst_params_int8(params)
    out = fused_mst_logits(qp, x, model, dtype=jnp.float32)
    p_ref = jax.nn.softmax(ref, -1)
    p_out = jax.nn.softmax(out, -1)
    np.testing.assert_allclose(np.asarray(p_out), np.asarray(p_ref),
                               atol=0.05)
    assert (np.argmax(np.asarray(out), -1)
            == np.argmax(np.asarray(ref), -1)).all()


def test_int8_rejects_train_but_serves_saliency():
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.models.vit_fast import FastViTConfig, fused_vit_cls

    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                use_flash=False, fusion_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 2, 28, 28))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    qp = quantize_mst_params_int8(params)
    cfg = FastViTConfig.from_model(model)
    xs = jnp.ones((2, 28, 28, 3))
    with pytest.raises(ValueError):
        fused_vit_cls(qp["encoder"], xs, cfg, jnp.float32, train=True)
    # CLS-row and rollout emission ride the int8 kernels (since round 3)
    cls, row = fused_vit_cls(qp["encoder"], xs, cfg, jnp.float32,
                             want_last_row=True)
    S = 1 + (28 // 14) ** 2
    assert row.shape == (2, cfg.num_heads, S)
    np.testing.assert_allclose(np.asarray(row).sum(-1),
                               np.ones((2, cfg.num_heads)), rtol=1e-4)


@pytest.mark.slow
def test_int8_saliency_tracks_bf16():
    """Explainability serving on int8 kernels (dynamic AND static trees):
    the saliency maps track the bf16 fused path within the quantization
    envelope, for both plane modes."""
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.models.vit_fast import fused_mst_saliency

    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                use_flash=False, fusion_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 1, 4, 28, 28))
    params = model.init(jax.random.PRNGKey(10), x)["params"]
    for qp in (quantize_mst_params_int8(params),
               quantize_mst_params_int8(params, model, x)):
        for mode in ("last", "rollout"):
            p_ref, s_ref = fused_mst_saliency(params, x, model,
                                              dtype=jnp.float32,
                                              plane_mode=mode)
            p_q, s_q = fused_mst_saliency(qp, x, model, dtype=jnp.float32,
                                          plane_mode=mode)
            np.testing.assert_allclose(np.asarray(p_q), np.asarray(p_ref),
                                       atol=0.05)
            scale = max(float(np.abs(np.asarray(s_ref)).max()), 1e-9)
            rel = float(np.abs(np.asarray(s_q)
                               - np.asarray(s_ref)).max()) / scale
            assert rel < 0.05, (mode, rel)


def test_int8_dinov3_rope_logits_track_bf16():
    """The DINOv3 config (2D rope, no learned pos-embed, eps 1e-5) serves
    int8 too — rope rotates the dequantised bf16 q/k, so accuracy matches
    the plain-config int8 envelope."""
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.models.vit_fast import fused_mst_logits

    model = DinoSliceClassifier(
        out_ch=2, model_size="tiny", patch_size=14, fusion_heads=4,
        use_flash=False, use_rope_2d=True, use_pos_embed=False,
        rope_normalized=True, num_register_tokens=2, norm_eps=1e-5)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 4, 28, 28))
    params = model.init(jax.random.PRNGKey(3), x)["params"]
    ref = fused_mst_logits(params, x, model, dtype=jnp.float32)
    out = fused_mst_logits(quantize_mst_params_int8(params), x, model,
                           dtype=jnp.float32)
    p_ref = jax.nn.softmax(ref, -1)
    p_out = jax.nn.softmax(out, -1)
    np.testing.assert_allclose(np.asarray(p_out), np.asarray(p_ref),
                               atol=0.05)
    assert (np.argmax(np.asarray(out), -1)
            == np.argmax(np.asarray(ref), -1)).all()


@pytest.mark.slow
def test_int8_static_scales_track_bf16_out_of_sample():
    """Calibrated (static-activation-scale) trees: logits track bf16 on a
    DIFFERENT batch than the calibration one (the production setting —
    unseen activations saturate at the margin), for both the plain and the
    DINOv3/rope+swiglu-free configs."""
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.models.vit_fast import fused_mst_logits

    for kw in (dict(),
               dict(use_rope_2d=True, use_pos_embed=False,
                    rope_normalized=True, num_register_tokens=2,
                    norm_eps=1e-5)):
        model = DinoSliceClassifier(out_ch=2, model_size="tiny",
                                    patch_size=14, fusion_heads=4,
                                    use_flash=False, **kw)
        calib = jax.random.normal(jax.random.PRNGKey(4), (2, 1, 4, 28, 28))
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 1, 4, 28, 28))
        params = model.init(jax.random.PRNGKey(6), calib)["params"]
        qp = quantize_mst_params_int8(params, model, calib)
        # static marker present on the fc2 node
        assert "a_inv" in qp["encoder"]["blocks_0"]["mlp"]["fc2"]
        ref = fused_mst_logits(params, x, model, dtype=jnp.float32)
        out = fused_mst_logits(qp, x, model, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(jax.nn.softmax(out, -1)),
            np.asarray(jax.nn.softmax(ref, -1)), atol=0.05)
        assert (np.argmax(np.asarray(out), -1)
                == np.argmax(np.asarray(ref), -1)).all()


def test_calibrate_act_scales_structure():
    """Calibration emits one positive finite scale per site per block."""
    from mst_tpu.models.vit import build_vit
    from mst_tpu.models.vit_fast import FastViTConfig
    from mst_tpu.ops.fused_int8 import calibrate_act_scales_int8

    vit = build_vit("tiny", patch_size=14, use_flash=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 28, 28, 3))
    params = vit.init(jax.random.PRNGKey(1), x)["params"]
    cfg = FastViTConfig(embed_dim=32, depth=2, num_heads=2,
                        pos_embed_grid=37)
    sc = calibrate_act_scales_int8(params, x, cfg)
    assert set(sc) == {f"blocks_{i}" for i in range(2)}
    for s in sc.values():
        assert set(s) == {"attn_in", "attn_out", "mlp_in", "mlp_hidden"}
        for v in s.values():
            assert isinstance(v, float) and 0 < v < 1e4
    # chunked calibration (the giant2 memory guard) is exact: running max
    # over per-slice stats == the one-shot stats
    sc1 = calibrate_act_scales_int8(params, x, cfg, chunk=1)
    for name in sc:
        for k in sc[name]:
            np.testing.assert_allclose(sc1[name][k], sc[name][k],
                                       rtol=1e-6)


def test_int8_static_saturation_is_bounded():
    """Inputs 3x beyond the calibration range saturate (clip at +-127)
    without NaN/inf — the PTQ failure mode stays graceful."""
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.models.vit_fast import fused_mst_logits

    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                use_flash=False, fusion_heads=4)
    calib = jax.random.normal(jax.random.PRNGKey(7), (1, 1, 4, 28, 28))
    params = model.init(jax.random.PRNGKey(8), calib)["params"]
    qp = quantize_mst_params_int8(params, model, calib)
    out = fused_mst_logits(qp, 3.0 * calib, model, dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()


def test_int8_abnar_factors_match_flax_rollout():
    """want_abnar: the in-kernel Abnar factors chained in XLA reproduce
    the flax attention_rollout map (interpret mode)."""
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.models.vit_fast import fused_mst_saliency
    from mst_tpu.train.predictor import _forward_with_saliency

    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                use_flash=False, fusion_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 1, 2, 28, 28))
    params = model.init(jax.random.PRNGKey(12), x)["params"]
    p_ref, s_ref = _forward_with_saliency(
        model, {"params": params}, x, None, plane_mode="rollout_abnar",
        force_flax=True)
    p_f, s_f = fused_mst_saliency(params, x, model, dtype=jnp.float32,
                                  plane_mode="rollout_abnar")
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_ref),
                               atol=1e-4)
    scale = max(float(np.abs(np.asarray(s_ref)).max()), 1e-9)
    rel = float(np.abs(np.asarray(s_f) - np.asarray(s_ref)).max()) / scale
    assert rel < 1e-2, rel
    # int8 tree serves the same mode within the quantization envelope
    p_q, s_q = fused_mst_saliency(quantize_mst_params_int8(params), x,
                                  model, dtype=jnp.float32,
                                  plane_mode="rollout_abnar")
    rel_q = float(np.abs(np.asarray(s_q) - np.asarray(s_ref)).max()) / scale
    assert rel_q < 0.05, rel_q


def test_int8_frozen_train_grads_and_forward_consistency():
    """Frozen int8 training (trainer `--int8`): the train-time forward must
    equal the int8 SERVING forward exactly (train/serve consistency is the
    point of the feature), grads w.r.t. the bf16 encoder must be exactly
    zero, and fusion/head grads must track the bf16 frozen step within the
    quantization error envelope."""
    import optax

    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.models.vit_fast import fused_mst_logits

    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                use_flash=False, fusion_heads=4, freeze=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 4, 28, 28))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    target = jnp.array([0, 1])
    qenc = quantize_mst_params_int8(
        {"encoder": params["encoder"]})["encoder"]

    def loss_fn(p, enc):
        fp = dict(p)
        if enc is not None:
            fp["encoder"] = enc
        logits = fused_mst_logits(fp, x, model, dtype=jnp.float32,
                                  train=True)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, target).mean(), logits

    (_, logits_q), grads_q = jax.value_and_grad(
        loss_fn, has_aux=True)(params, qenc)

    # 1. train forward == int8 serving forward
    fp = dict(params)
    fp["encoder"] = qenc
    serve = fused_mst_logits(fp, x, model, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(logits_q), np.asarray(serve))

    # 2. the (swapped-out) bf16 encoder gets exactly-zero grads
    for leaf in jax.tree_util.tree_leaves(grads_q["encoder"]):
        assert float(jnp.max(jnp.abs(leaf))) == 0.0

    # 3. fusion/head grads track the bf16 frozen step
    _, grads_b = jax.value_and_grad(loss_fn, has_aux=True)(params, None)
    for key in ("head", "fusion_0"):
        a = np.concatenate([np.ravel(l) for l in
                            jax.tree_util.tree_leaves(grads_q[key])])
        b = np.concatenate([np.ravel(l) for l in
                            jax.tree_util.tree_leaves(grads_b[key])])
        cos = np.dot(a, b) / max(np.linalg.norm(a) * np.linalg.norm(b),
                                 1e-12)
        assert cos > 0.98, (key, cos)


def test_make_train_step_int8_gate():
    """int8_encoder is rejected for unfrozen models, and (on this CPU
    host) when the fused TPU train path is unavailable."""
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.train.trainer import make_train_step

    unfrozen = DinoSliceClassifier(out_ch=2, model_size="tiny",
                                   patch_size=14, use_flash=False,
                                   fusion_heads=4)
    with pytest.raises(ValueError, match="frozen"):
        make_train_step(unfrozen, int8_encoder={})
    frozen = DinoSliceClassifier(out_ch=2, model_size="tiny",
                                 patch_size=14, use_flash=False,
                                 fusion_heads=4, freeze=True)
    if jax.default_backend() != "tpu":
        with pytest.raises(ValueError, match="fused"):
            make_train_step(frozen, int8_encoder={})


def test_quantized_tree_survives_source_donation():
    """The quantized tree must not alias the source params: frozen int8
    training closes over it while the jitted train step DONATES
    state.params — aliased pass-through leaves (pos_embed, LN, biases)
    would be freed by the first step's buffer donation (regression: the
    --int8 train CLI crashed with "Array has been deleted" at epoch 0 on
    real TPU)."""
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.models.vit_fast import fused_mst_logits

    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                use_flash=False, fusion_heads=4, freeze=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 3, 28, 28))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    fp = dict(params)
    fp["encoder"] = quantize_mst_params_int8(
        {"encoder": params["encoder"]})["encoder"]
    # simulate donation of the source params
    for leaf in jax.tree_util.tree_leaves(params["encoder"]):
        leaf.delete()
    logits = fused_mst_logits(fp, x, model, dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()


def test_int8_calibration_read_does_not_consume_a_sampling_epoch(
        tmp_path, monkeypatch):
    """Trainer `--int8_calib` pulls calibration volumes through
    dm.train_dataloader(), which bumps the (seed, epoch) sampling counter —
    the read must restore it, or every training epoch samples a shifted
    index stream and bit-identical --resume breaks (code-review r3)."""
    from mst_tpu.data.datamodule import DataModule
    from mst_tpu.data.datasets.synthetic import Synthetic_Dataset3D
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.train import trainer as trainer_mod
    from mst_tpu.train.trainer import Trainer, make_optimizer

    # force the fused gate so the CPU run reaches the calibration block
    # (interpret-mode kernels execute it; tiny shapes keep it quick); the
    # eval step keeps its own TPU-only gate — stub it with the flax forward
    monkeypatch.setattr(trainer_mod, "should_use_fused_train",
                        lambda *a: True)

    def fake_eval_factory(model, mesh=None, int8_encoder=None):
        def step(params, batch_stats, source, mask):
            return model.apply({"params": params}, source, mask,
                               deterministic=True)
        return jax.jit(step)

    monkeypatch.setattr(trainer_mod, "make_eval_step", fake_eval_factory)
    ds = Synthetic_Dataset3D(num_samples=4, shape_cdhw=(1, 2, 28, 28))
    dm = DataModule(ds_train=ds, ds_val=ds, batch_size=2, seed=0)
    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                use_flash=False, fusion_heads=4,
                                freeze=True, dtype=jnp.float32)
    tr = Trainer(tmp_path, max_epochs=1, num_sanity_val_steps=0,
                 int8=True, int8_calib=2)
    state = tr.init_state(model, next(iter(dm.val_dataloader())),
                          make_optimizer(1e-6, freeze_encoder=True))
    tr.fit(model, state, dm)
    # one training epoch ran -> exactly one train_dataloader() consumption
    assert dm._epoch == 1


def test_int8_train_step_rejects_over_budget_seq_len(monkeypatch):
    """With int8_encoder set, inputs beyond the fused kernels' token
    budget must raise at trace time instead of silently training the
    fusion head on bf16 flax features (code-review r3)."""
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.train import trainer as trainer_mod
    from mst_tpu.train.trainer import (
        TrainState,
        make_optimizer,
        make_train_step,
    )

    monkeypatch.setattr(trainer_mod, "should_use_fused_train",
                        lambda *a: True)
    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                use_flash=False, fusion_heads=4,
                                freeze=True, dtype=jnp.float32)
    small = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 2, 28, 28))
    params = model.init(jax.random.PRNGKey(1), small)["params"]
    qenc = quantize_mst_params_int8({"encoder": params["encoder"]})["encoder"]
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=make_optimizer(1e-6, freeze_encoder=True),
        dropout_rng=jax.random.PRNGKey(2))
    step = make_train_step(model, int8_encoder=qenc)
    # (322/14)^2 + 1 = 530 tokens > FUSED_MAX_TOKENS
    big = jnp.zeros((1, 1, 2, 322, 322), jnp.float32)
    with pytest.raises(ValueError, match="token budget"):
        step(state, big, jnp.zeros((1,), jnp.int32), None)
