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
