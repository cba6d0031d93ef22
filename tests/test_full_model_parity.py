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


def _load_reference_model():
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from reference_baseline import _install_stubs

    _install_stubs()
    sys.path.insert(0, str(REF))
    from mst.models.dino import DinoV2ClassifierSlice

    torch.manual_seed(0)
    return DinoV2ClassifierSlice(
        in_ch=1, out_ch=2, model_size="s", pretrained=False,
        slice_fusion="transformer",
    ).eval()


def test_full_mst_logit_parity():
    tmodel = _load_reference_model()
    vol = torch.randn(1, 1, 4, 56, 56)
    with torch.no_grad():
        ref_logits = tmodel(vol).numpy()

    import jax.numpy as jnp

    from mst_tpu.models.convert import convert_reference_mst
    from mst_tpu.models.mst import DinoSliceClassifier

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_reference_mst(sd, depth=12)

    # Encoder config matching the reference's LOCAL vit_small(patch_size=14):
    # 224-grid pos embed (16x16), no LayerScale, exact GELU.
    jm = DinoSliceClassifier(
        out_ch=2, model_size="small", patch_size=14, fusion_heads=12,
        use_flash=False, gelu_approximate=False,
        layerscale_init=None, pos_embed_grid=16,
    )
    logits = jm.apply({"params": params}, jnp.asarray(vol.numpy()))
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               atol=3e-3, rtol=3e-3)
