"""Torch -> JAX weight converters (DINOv2 ViT, torchvision-style ResNet).

The reference pulls pretrained DINOv2 weights from torch.hub at model
construction (`mst/models/dino.py:59-63`); AUC parity depends on loading
the same weights. These converters map a torch `state_dict` (loaded from a
local file — this environment has no network egress) onto our flax param
pytrees. Layout conventions:

- torch Linear weight [out, in]       -> flax Dense kernel [in, out]
- torch Conv weight [out, in, *k]     -> flax Conv kernel [*k, in, out]
- torch LayerNorm weight/bias         -> flax scale/bias
- torch BatchNorm running stats       -> flax `batch_stats` collection
- DINOv2 qkv packing ([q; k; v] rows) matches our fused qkv Dense with the
  (3, heads, head_dim) reshape, so no permutation is needed beyond the
  transpose.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def pos_embed_grid_from_sd(sd) -> int:
    """Infer the canonical pos-embed grid side from a DINOv2 state_dict
    (257 tokens -> 16, 1370 -> 37). Accepts hub or HF key layout."""
    key = "pos_embed" if "pos_embed" in sd else "embeddings.position_embeddings"
    n = np.asarray(sd[key]).shape[1] - 1
    side = int(round(n ** 0.5))
    assert side * side == n, f"non-square pos embed ({n} patch tokens)"
    return side


def detect_encoder_layout(sd) -> str:
    """'hub' (torch.hub DINOv2 / local vit_*), 'hf' (HuggingFace
    Dinov2Model) or 'hf_v3' (HuggingFace DINOv3ViTModel); the reference
    consumes hub and HF layouts (`dino.py:59-66,321-333`)."""
    if "pos_embed" in sd and "cls_token" in sd:
        return "hub"
    if "embeddings.position_embeddings" in sd:
        return "hf"
    if "layer.0.attention.q_proj.weight" in sd:
        return "hf_v3"
    raise ValueError(
        "unrecognised encoder state_dict layout (neither torch.hub DINOv2, "
        "HuggingFace Dinov2Model, nor HuggingFace DINOv3ViTModel keys "
        "present)"
    )


def convert_any_dinov2(sd: Dict, depth: int, ffn_layer: str = "mlp") -> Dict:
    """Dispatch on state_dict layout: torch.hub vs HF (v2 or v3)."""
    layout = detect_encoder_layout(sd)
    if layout == "hub":
        return convert_dinov2_vit(sd, depth, ffn_layer)
    if layout == "hf_v3":
        return convert_hf_dinov3(sd, depth)
    return convert_hf_dinov2(sd, depth)


def _t(w) -> np.ndarray:
    return np.asarray(w).T


def _conv(w) -> np.ndarray:
    w = np.asarray(w)  # [out, in, *k]
    k = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + k)) + (1, 0))


def _ln(sd, prefix) -> Dict:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def convert_dinov2_vit(sd: Dict, depth: int, ffn_layer: str = "mlp") -> Dict:
    """DINOv2 DinoVisionTransformer state_dict -> our VisionTransformer
    params (reference param names from
    `mst/models/extern/dinov2/vision_transformer.py`)."""
    sd = {k: v for k, v in sd.items()}
    params: Dict = {
        "cls_token": np.asarray(sd["cls_token"]),
        "pos_embed": np.asarray(sd["pos_embed"]),
        "patch_embed": {"proj": {
            "kernel": _conv(sd["patch_embed.proj.weight"]),
            "bias": np.asarray(sd["patch_embed.proj.bias"]),
        }},
        "norm": _ln(sd, "norm"),
    }
    if "register_tokens" in sd:
        params["register_tokens"] = np.asarray(sd["register_tokens"])
    for i in range(depth):
        p = f"blocks.{i}"
        if f"{p}.norm1.weight" not in sd:  # chunked layout blocks.0.{i}
            p = f"blocks.0.{i}"
        blk = {
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "attn": {
                "qkv": {"kernel": _t(sd[f"{p}.attn.qkv.weight"]),
                        "bias": np.asarray(sd[f"{p}.attn.qkv.bias"])},
                "proj": {"kernel": _t(sd[f"{p}.attn.proj.weight"]),
                         "bias": np.asarray(sd[f"{p}.attn.proj.bias"])},
            },
        }
        if f"{p}.ls1.gamma" in sd:
            blk["ls1"] = {"gamma": np.asarray(sd[f"{p}.ls1.gamma"])}
            blk["ls2"] = {"gamma": np.asarray(sd[f"{p}.ls2.gamma"])}
        if ffn_layer == "swiglu":
            blk["mlp"] = {
                "w12": {"kernel": _t(sd[f"{p}.mlp.w12.weight"]),
                        "bias": np.asarray(sd[f"{p}.mlp.w12.bias"])},
                "w3": {"kernel": _t(sd[f"{p}.mlp.w3.weight"]),
                       "bias": np.asarray(sd[f"{p}.mlp.w3.bias"])},
            }
        else:
            blk["mlp"] = {
                "fc1": {"kernel": _t(sd[f"{p}.mlp.fc1.weight"]),
                        "bias": np.asarray(sd[f"{p}.mlp.fc1.bias"])},
                "fc2": {"kernel": _t(sd[f"{p}.mlp.fc2.weight"]),
                        "bias": np.asarray(sd[f"{p}.mlp.fc2.bias"])},
            }
        params[f"blocks_{i}"] = blk
    return params


def convert_hf_dinov2(sd: Dict, depth: int) -> Dict:
    """HuggingFace `Dinov2Model` state_dict -> our VisionTransformer params.

    Covers the reference DinoV3 classifier's HF fallback path
    (`mst/models/dino.py:321-333` loads `AutoModel` weights when the
    torch.hub URLs are expired). HF stores separate q/k/v projections
    (`encoder.layer.{i}.attention.attention.{query,key,value}`); they are
    re-packed into the fused qkv layout ([q; k; v] output rows).
    """
    def g(key):
        return np.asarray(sd[key])

    params: Dict = {
        "cls_token": g("embeddings.cls_token"),
        "pos_embed": g("embeddings.position_embeddings"),
        "patch_embed": {"proj": {
            "kernel": _conv(g("embeddings.patch_embeddings.projection.weight")),
            "bias": g("embeddings.patch_embeddings.projection.bias"),
        }},
        "norm": {"scale": g("layernorm.weight"), "bias": g("layernorm.bias")},
    }
    if "embeddings.register_tokens" in sd:
        params["register_tokens"] = g("embeddings.register_tokens")
    for i in range(depth):
        p = f"encoder.layer.{i}"
        qkv_w = np.concatenate([
            g(f"{p}.attention.attention.query.weight"),
            g(f"{p}.attention.attention.key.weight"),
            g(f"{p}.attention.attention.value.weight"),
        ], axis=0)
        qkv_b = np.concatenate([
            g(f"{p}.attention.attention.query.bias"),
            g(f"{p}.attention.attention.key.bias"),
            g(f"{p}.attention.attention.value.bias"),
        ], axis=0)
        blk = {
            "norm1": {"scale": g(f"{p}.norm1.weight"),
                      "bias": g(f"{p}.norm1.bias")},
            "norm2": {"scale": g(f"{p}.norm2.weight"),
                      "bias": g(f"{p}.norm2.bias")},
            "attn": {
                "qkv": {"kernel": qkv_w.T, "bias": qkv_b},
                "proj": {"kernel": _t(g(f"{p}.attention.output.dense.weight")),
                         "bias": g(f"{p}.attention.output.dense.bias")},
            },
        }
        if f"{p}.layer_scale1.lambda1" in sd:
            blk["ls1"] = {"gamma": g(f"{p}.layer_scale1.lambda1")}
            blk["ls2"] = {"gamma": g(f"{p}.layer_scale2.lambda1")}
        if f"{p}.mlp.weights_in.weight" in sd:  # SwiGLU (giant)
            blk["mlp"] = {
                "w12": {"kernel": _t(g(f"{p}.mlp.weights_in.weight")),
                        "bias": g(f"{p}.mlp.weights_in.bias")},
                "w3": {"kernel": _t(g(f"{p}.mlp.weights_out.weight")),
                       "bias": g(f"{p}.mlp.weights_out.bias")},
            }
        else:
            blk["mlp"] = {
                "fc1": {"kernel": _t(g(f"{p}.mlp.fc1.weight")),
                        "bias": g(f"{p}.mlp.fc1.bias")},
                "fc2": {"kernel": _t(g(f"{p}.mlp.fc2.weight")),
                        "bias": g(f"{p}.mlp.fc2.bias")},
            }
        params[f"blocks_{i}"] = blk
    return params


def _interleave_heads(w: np.ndarray, num_heads: int) -> np.ndarray:
    """Permute q/k projection OUTPUT features from HF rotate-half order
    (pairs (i, i + hd/2) within each head) to our interleaved-pair order
    (pairs (2i, 2i+1)). q.k^T is invariant under a shared permutation of
    q and k head dims, so attention itself is unchanged; the permutation
    makes HF DINOv3's tile(2)+rotate_half RoPE coincide with
    `ops.rotary.apply_rope`'s interleaved convention (the per-pair angle
    sequences are identical — see `rope_2d_angles(normalized=True)`)."""
    w = np.asarray(w)
    out = w.shape[0]
    hd = out // num_heads
    idx = np.empty((num_heads, hd), np.int64)
    base = np.arange(num_heads)[:, None] * hd
    idx[:, 0::2] = base + np.arange(hd // 2)
    idx[:, 1::2] = base + np.arange(hd // 2) + hd // 2
    return w[idx.reshape(-1)]


def dinov3_config_from_sd(sd) -> Dict:
    """Infer the encoder config carried by an HF DINOv3ViTModel state_dict:
    patch size (conv kernel), register count, depth, embed width, gated-MLP
    hidden width. Complements `pos_embed_grid_from_sd` (DINOv3 has no
    learned pos-embed to infer a grid from)."""
    conv = np.asarray(sd["embeddings.patch_embeddings.weight"])
    cfg = {
        "patch_size": int(conv.shape[-1]),
        "num_register_tokens":
            int(np.asarray(sd["embeddings.register_tokens"]).shape[1]),
        "embed_dim": int(conv.shape[0]),
    }
    depth = 0
    while f"layer.{depth}.norm1.weight" in sd:
        depth += 1
    cfg["depth"] = depth
    if "layer.0.mlp.gate_proj.weight" in sd:
        cfg["ffn_layer"] = "swiglu"
        cfg["ffn_hidden"] = int(
            np.asarray(sd["layer.0.mlp.gate_proj.weight"]).shape[0])
    else:
        cfg["ffn_layer"] = "mlp"
        cfg["ffn_hidden"] = int(
            np.asarray(sd["layer.0.mlp.up_proj.weight"]).shape[0])
    return cfg


def convert_hf_dinov3(sd: Dict, depth: int,
                      num_heads: int = None) -> Dict:
    """HuggingFace `DINOv3ViTModel` state_dict -> our VisionTransformer
    params (the encoder the reference's DinoV3 classifier actually runs
    through `AutoModel`, `mst/models/dino.py:321-333`).

    Layout notes:
    - no learned position embeddings (RoPE-only; build the target model
      with `use_pos_embed=False, use_rope_2d=True, rope_normalized=True`)
    - separate q/k/v projections -> fused qkv; DINOv3's `key_bias=False`
      becomes a zero k-bias segment
    - q/k output features are permuted rotate-half -> interleaved
      (`_interleave_heads`) so our RoPE convention reproduces HF exactly
    - gated MLP (`gate_proj`/`up_proj`/`down_proj`) -> SwiGLU `w12`/`w3`
      (gate first, matching `jnp.split`'s x1 = silu'd half); plain MLP
      (`up_proj`/`down_proj`) -> `fc1`/`fc2`
    - `embeddings.mask_token` is pre-training machinery — dropped.

    `num_heads` defaults to embed_dim/64 (every published DINOv3 ViT uses
    64-wide heads); pass it explicitly for exotic head widths.
    """
    def g(key):
        return np.asarray(sd[key])

    E = g("embeddings.cls_token").shape[-1]
    if num_heads is None:
        num_heads = E // 64
    params: Dict = {
        "cls_token": g("embeddings.cls_token"),
        "register_tokens": g("embeddings.register_tokens"),
        "patch_embed": {"proj": {
            "kernel": _conv(g("embeddings.patch_embeddings.weight")),
            "bias": g("embeddings.patch_embeddings.bias"),
        }},
        "norm": {"scale": g("norm.weight"), "bias": g("norm.bias")},
    }
    for i in range(depth):
        p = f"layer.{i}"
        q_w = _interleave_heads(g(f"{p}.attention.q_proj.weight"), num_heads)
        k_w = _interleave_heads(g(f"{p}.attention.k_proj.weight"), num_heads)
        v_w = g(f"{p}.attention.v_proj.weight")
        q_b = (g(f"{p}.attention.q_proj.bias")
               if f"{p}.attention.q_proj.bias" in sd else np.zeros(E, v_w.dtype))
        q_b = _interleave_heads(q_b[:, None], num_heads)[:, 0]
        k_b = (g(f"{p}.attention.k_proj.bias")
               if f"{p}.attention.k_proj.bias" in sd else np.zeros(E, v_w.dtype))
        k_b = _interleave_heads(k_b[:, None], num_heads)[:, 0]
        v_b = (g(f"{p}.attention.v_proj.bias")
               if f"{p}.attention.v_proj.bias" in sd else np.zeros(E, v_w.dtype))
        blk = {
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "attn": {
                "qkv": {"kernel": np.concatenate([q_w, k_w, v_w], 0).T,
                        "bias": np.concatenate([q_b, k_b, v_b], 0)},
                "proj": {"kernel": _t(g(f"{p}.attention.o_proj.weight")),
                         "bias": g(f"{p}.attention.o_proj.bias")},
            },
            "ls1": {"gamma": g(f"{p}.layer_scale1.lambda1")},
            "ls2": {"gamma": g(f"{p}.layer_scale2.lambda1")},
        }
        if f"{p}.mlp.gate_proj.weight" in sd:  # gated MLP (SwiGLU)
            w12 = np.concatenate([
                g(f"{p}.mlp.gate_proj.weight"), g(f"{p}.mlp.up_proj.weight")
            ], axis=0)
            b12 = np.concatenate([
                g(f"{p}.mlp.gate_proj.bias"), g(f"{p}.mlp.up_proj.bias")
            ], axis=0)
            blk["mlp"] = {
                "w12": {"kernel": w12.T, "bias": b12},
                "w3": {"kernel": _t(g(f"{p}.mlp.down_proj.weight")),
                       "bias": g(f"{p}.mlp.down_proj.bias")},
            }
        else:
            blk["mlp"] = {
                "fc1": {"kernel": _t(g(f"{p}.mlp.up_proj.weight")),
                        "bias": g(f"{p}.mlp.up_proj.bias")},
                "fc2": {"kernel": _t(g(f"{p}.mlp.down_proj.weight")),
                        "bias": g(f"{p}.mlp.down_proj.bias")},
            }
        params[f"blocks_{i}"] = blk
    return params


def _bn(sd, prefix) -> Tuple[Dict, Dict]:
    params = {"scale": np.asarray(sd[f"{prefix}.weight"]),
              "bias": np.asarray(sd[f"{prefix}.bias"])}
    stats = {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
             "var": np.asarray(sd[f"{prefix}.running_var"])}
    return params, stats


def convert_torch_resnet(sd: Dict, variant: int) -> Tuple[Dict, Dict]:
    """torchvision OR MONAI/MedicalNet resnet{18,34,50,...} state_dict ->
    (params, batch_stats) for our ResNetBackbone.

    MONAI's `ResNet`/`ResNetFeatures` (the reference's `pretrained=True`
    3D path, `mst/models/resnet.py:33-41`) uses torchvision-compatible
    module names (conv1/bn1/layerX.i.convN/bnN/downsample.0/1), with 5-D
    conv kernels — `_conv` transposes any rank. MedicalNet checkpoints
    (monai.networks.nets.ResNetFeatures pretrained source) wrap keys in
    DataParallel's "module." prefix, stripped here."""
    from mst_tpu.models.resnet import _RESNET_LAYERS

    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()
              if k.startswith("module.")}

    block_cls, counts = _RESNET_LAYERS[variant]
    bottleneck = block_cls.__name__ == "Bottleneck"

    params: Dict = {"conv1": {"kernel": _conv(sd["conv1.weight"])}}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")

    for stage, n in enumerate(counts):
        for i in range(n):
            tp = f"layer{stage + 1}.{i}"
            op = f"layer{stage + 1}_{i}"
            blk_p: Dict = {}
            blk_s: Dict = {}
            convs = ("conv1", "conv2", "conv3") if bottleneck else ("conv1", "conv2")
            bns = ("bn1", "bn2", "bn3") if bottleneck else ("bn1", "bn2")
            for c, b in zip(convs, bns):
                blk_p[c] = {"kernel": _conv(sd[f"{tp}.{c}.weight"])}
                blk_p[b], blk_s[b] = _bn(sd, f"{tp}.{b}")
            if f"{tp}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": _conv(sd[f"{tp}.downsample.0.weight"])}
                blk_p["downsample_bn"], blk_s["downsample_bn"] = _bn(
                    sd, f"{tp}.downsample.1")
            params[op] = blk_p
            stats[op] = blk_s
    return params, stats


def convert_reference_resnet3d(sd: Dict, variant: int = 18
                               ) -> Tuple[Dict, Dict]:
    """Reference 3-D `ResNet` state_dict (the from-scratch MONAI path,
    `mst/models/resnet.py:51-53`: `nets.resnet{N}(n_input_channels,
    spatial_dims=3, num_classes)` under the `model.` attribute) ->
    (params, batch_stats) for our `ResNet3DClassifier` — backbone plus the
    final `fc` head."""
    bb_sd = {k[len("model."):]: v for k, v in sd.items()
             if k.startswith("model.")}
    fc_w = bb_sd.pop("fc.weight")
    fc_b = bb_sd.pop("fc.bias")
    bb_params, bb_stats = convert_torch_resnet(bb_sd, variant)
    params = {"backbone": bb_params,
              "fc": {"kernel": _t(fc_w), "bias": np.asarray(fc_b)}}
    return params, {"backbone": bb_stats}


def convert_reference_mst(sd: Dict, depth: int = 12,
                          fusion_layers: int = 1) -> Dict:
    """Reference `DinoV2ClassifierSlice` state_dict -> our
    `DinoSliceClassifier` params (full-model conversion: encoder + slice
    fusion + CLS + head + optional bottleneck / slice pos-emb)."""
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    params: Dict = {"encoder": convert_dinov2_vit(enc_sd, depth)}
    if "cls_token" in sd:  # transformer fusion only (`dino.py:97`);
        params["cls_token"] = np.asarray(sd["cls_token"])  # linear/average
    params["head"] = {"kernel": _t(sd["linear.weight"]),   # checkpoints
                      "bias": np.asarray(sd["linear.bias"])}  # have neither
    if "bottleneck.weight" in sd:
        params["bottleneck"] = {"kernel": _t(sd["bottleneck.weight"]),
                                "bias": np.asarray(sd["bottleneck.bias"])}
    if "slice_pos_emb.weight" in sd:
        params["slice_pos_emb"] = {
            "embedding": np.asarray(sd["slice_pos_emb.weight"])}
    for i in range(fusion_layers):
        if f"slice_fusion.layers.{i}.self_attn.in_proj_weight" not in sd:
            if i == 0:
                break  # linear/average fusion: no transformer layers to map
            # A transformer-fusion checkpoint with FEWER layers than asked
            # for is a config error — failing here (not at apply time, far
            # from the cause) keeps the error actionable.
            raise KeyError(
                f"checkpoint has only {i} slice_fusion layer(s) but "
                f"fusion_layers={fusion_layers} was requested")
        params[f"fusion_{i}"] = _convert_fusion_layer(
            sd, f"slice_fusion.layers.{i}")
    if "slice_fusion.norm.weight" in sd:
        params["fusion_norm"] = _ln(sd, "slice_fusion.norm")
    return params


def fold_linear_fusion(params: Dict) -> Dict:
    """Migrate a PRE-rewrite mst_tpu `slice_fusion='linear'` checkpoint
    (which carried an extra `fusion_linear` Dense(D*e -> e) before the
    head) to the current reference-exact layout (head consumes the flat
    D*e vector directly, `dino.py:99,156`). The two stacked linears had
    no nonlinearity between them, so the fold is exact in f32:

        head(fl(x)) = x @ (W_fl @ W_head) + (b_fl @ W_head + b_head)

    Returns a new param dict with `fusion_linear` removed and `head`
    replaced by the composed kernel/bias. No-op if `fusion_linear` is
    absent (already-migrated or non-linear-fusion checkpoints)."""
    if "fusion_linear" not in params:
        return params
    out = dict(params)
    fl = out.pop("fusion_linear")
    head = out["head"]
    w_fl = np.asarray(fl["kernel"], np.float32)
    b_fl = np.asarray(fl["bias"], np.float32)
    w_h = np.asarray(head["kernel"], np.float32)
    b_h = np.asarray(head["bias"], np.float32)
    out["head"] = {"kernel": w_fl @ w_h, "bias": b_fl @ w_h + b_h}
    return out


def _convert_fusion_layer(sd: Dict, p: str) -> Dict:
    """One torch `TransformerEncoderLayer` (reference
    `transformer_blocks.py:447-587`) -> our flax layer params."""
    return {
        "self_attn": {
            "in_proj": {"kernel": _t(sd[f"{p}.self_attn.in_proj_weight"]),
                        "bias": np.asarray(sd[f"{p}.self_attn.in_proj_bias"])},
            "out_proj": {"kernel": _t(sd[f"{p}.self_attn.out_proj.weight"]),
                         "bias": np.asarray(sd[f"{p}.self_attn.out_proj.bias"])},
        },
        "linear1": {"kernel": _t(sd[f"{p}.linear1.weight"]),
                    "bias": np.asarray(sd[f"{p}.linear1.bias"])},
        "linear2": {"kernel": _t(sd[f"{p}.linear2.weight"]),
                    "bias": np.asarray(sd[f"{p}.linear2.bias"])},
        "norm1": _ln(sd, f"{p}.norm1"),
        "norm2": _ln(sd, f"{p}.norm2"),
    }


def convert_reference_resnet_slice(sd: Dict, variant: int = 34,
                                   fusion_layers: int = 1
                                   ) -> Tuple[Dict, Dict]:
    """Reference `ResNetSliceTrans` state_dict (2D torchvision-style slice
    backbone under `model.`, `mst/models/resnet.py:127-244`) -> (params,
    batch_stats) for our `ResNetSliceTrans` — full-model conversion:
    backbone + slice fusion + CLS + final norm + linear head."""
    bb_sd = {k[len("model."):]: v for k, v in sd.items()
             if k.startswith("model.")}
    bb_params, bb_stats = convert_torch_resnet(bb_sd, variant)
    params: Dict = {"backbone": bb_params,
                    "cls_token": np.asarray(sd["cls_token"]),
                    "linear": {"kernel": _t(sd["linear.weight"]),
                               "bias": np.asarray(sd["linear.bias"])}}
    for i in range(fusion_layers):
        params[f"fusion_{i}"] = _convert_fusion_layer(
            sd, f"slice_fusion.layers.{i}")
    params["fusion_norm"] = _ln(sd, "slice_fusion.norm")
    return params, {"backbone": bb_stats}


def load_torch_state_dict(path) -> Dict:
    """Load a .pth/.pt checkpoint into a numpy state_dict (CPU, no grad)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in obj.items()}


def load_pretrained_encoder(params: Dict, state_dict: Dict, depth: int,
                            ffn_layer: str = "mlp") -> Dict:
    """Replace the `encoder` subtree of an MST classifier param tree with
    converted DINOv2 weights (the `load_pretrained` analogue,
    reference `base_model.py:67-75`). Accepts hub or HF layout."""
    converted = convert_any_dinov2(state_dict, depth, ffn_layer)
    out = dict(params)
    out["encoder"] = converted
    return out
