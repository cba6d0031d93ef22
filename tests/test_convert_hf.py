"""HF Dinov2Model -> flax converter parity (random-init tiny config)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_hf_dinov2_converter_cls_parity():
    from transformers import Dinov2Config, Dinov2Model

    cfg = Dinov2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, patch_size=14, image_size=56,
        layerscale_value=1.0,
    )
    torch.manual_seed(0)
    hf = Dinov2Model(cfg).eval()
    x = torch.randn(2, 3, 56, 56)
    with torch.no_grad():
        out = hf(pixel_values=x).last_hidden_state.numpy()

    from mst_tpu.models.convert import convert_hf_dinov2
    from mst_tpu.models.vit import build_vit

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_hf_dinov2(sd, depth=2)

    import jax.numpy as jnp

    jmodel = build_vit(
        "tiny", patch_size=14, use_flash=False, gelu_approximate=False,
        layerscale_init=1.0, pos_embed_grid=56 // 14,
    )
    jout = jmodel.apply({"params": params},
                        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jout["cls_token"]), out[:, 0],
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(jout["patch_tokens"]), out[:, 1:],
                               atol=2e-4, rtol=2e-4)


def _dinov3_parity(use_gated_mlp: bool):
    """HF DINOv3ViTModel (random init) vs our ViT with converted weights:
    proves the full DINOv3 runtime path — RoPE-only positions with
    normalized patch-center coords, rotate-half -> interleave q/k
    permutation, key_bias=False, register tokens, LN eps 1e-5 —
    the encoder the reference loads via AutoModel (`dino.py:321-333`)."""
    from transformers import DINOv3ViTConfig, DINOv3ViTModel

    cfg = DINOv3ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=256, patch_size=16, image_size=64,
        num_register_tokens=4, layerscale_value=1.0,
        use_gated_mlp=use_gated_mlp,
        hidden_act="silu" if use_gated_mlp else "gelu",
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = DINOv3ViTModel(cfg).eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        out = hf(pixel_values=x).last_hidden_state.numpy()

    from mst_tpu.models.convert import (
        convert_hf_dinov3,
        detect_encoder_layout,
        dinov3_config_from_sd,
    )
    from mst_tpu.models.vit import VisionTransformer

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    assert detect_encoder_layout(sd) == "hf_v3"
    inferred = dinov3_config_from_sd(sd)
    assert inferred["patch_size"] == 16
    assert inferred["num_register_tokens"] == 4
    assert inferred["depth"] == 2
    assert inferred["ffn_hidden"] == 256
    assert inferred["ffn_layer"] == ("swiglu" if use_gated_mlp else "mlp")

    params = convert_hf_dinov3(sd, depth=2, num_heads=4)
    jmodel = VisionTransformer(
        embed_dim=64, depth=2, num_heads=4, patch_size=16,
        num_register_tokens=4, ffn_layer=inferred["ffn_layer"],
        ffn_hidden=256, layerscale_init=1.0, use_pos_embed=False,
        use_rope_2d=True, rope_normalized=True, norm_eps=1e-5,
        gelu_approximate=False, use_flash=False,
    )

    import jax.numpy as jnp

    jout = jmodel.apply({"params": params},
                        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jout["cls_token"]), out[:, 0],
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(jout["register_tokens"]),
                               out[:, 1:5], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(jout["patch_tokens"]), out[:, 5:],
                               atol=2e-4, rtol=2e-4)


def test_hf_dinov3_converter_parity_mlp():
    _dinov3_parity(use_gated_mlp=False)


def test_hf_dinov3_converter_parity_gated_mlp():
    _dinov3_parity(use_gated_mlp=True)
